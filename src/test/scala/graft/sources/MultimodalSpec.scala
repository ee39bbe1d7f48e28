package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  test("synthetic media rows conform to the canonical schema") {
    val media = Multimodal.syntheticMedia(spark, 30)
    assert(media.count() == 30)
    val df = media.toDF()
    assert(df.schema("bytes").dataType.typeName == "binary")
    assert(df.schema("meta").dataType.typeName == "struct")
  }

  test("feature extraction is deterministic and batch-shaped") {
    val media = Multimodal.syntheticMedia(spark, 20)
    val f1 = Multimodal.extractFeatures(media, dim = 8).collect().sortBy(_.media_id)
    val f2 = Multimodal.extractFeatures(media, dim = 8).collect().sortBy(_.media_id)
    assert(f1.length == 20)
    assert(f1.forall(_.features.length == 8))
    // STUB decode must be deterministic (same bytes -> same features)
    f1.zip(f2).foreach { case (a, b) => assert(a.features.sameElements(b.features)) }
    // features derive from content: different rows differ
    assert(f1(0).features.toSeq != f1(1).features.toSeq)
  }

  test("repartitionByBytes sizes partitions by payload not row count") {
    val media = Multimodal.syntheticMedia(spark, 100).toDF()
    val parts = Multimodal.repartitionByBytes(media, "bytes", targetBytesPerTask = 2048)
      .rdd.getNumPartitions
    assert(parts >= 2 && parts <= 16)
  }

  test("repartitionByBytes bounds partition bytes on skewed data (<= 2x target)") {
    import spark.implicits._
    // skewed set: two "huge" rows (>= target each) + many small ones — a
    // count-based repartition would co-locate a huge row with small ones
    val target = 4096L
    val rows = Seq(
      (0L, new Array[Byte](9000)), (1L, new Array[Byte](5000))
    ) ++ (2L until 202L).map(i => (i, new Array[Byte](100)))
    val df = rows.toDF("media_id", "bytes").repartition(7)
    val out = Multimodal.repartitionByBytes(df, "bytes", target)
    val perPart = out
      .select(org.apache.spark.sql.functions.spark_partition_id().as("p"),
        org.apache.spark.sql.functions.length($"bytes").cast("long").as("sz"))
      .groupBy("p").agg(org.apache.spark.sql.functions.sum("sz").as("bytes"),
        org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1)).as("n"))
      .collect()
    // no rows lost, and every partition NOT holding an oversized row stays
    // under 2x target; oversized rows sit alone in their partitions
    assert(perPart.map(_.getLong(2)).sum == 202)
    perPart.foreach { r =>
      val bytes = r.getLong(1); val n = r.getLong(2)
      if (bytes >= target) assert(n == 1L || bytes <= 2 * target)
      else assert(bytes < 2 * target)
    }
  }

  test("frame sampling explodes stride-spaced frame indices") {
    val media = Multimodal.syntheticMedia(spark, 3).toDF()
    val frames = Multimodal.sampleFrames("fs", fps = 10, stride = 5, maxFrames = 4)(media)
    val byId = frames.groupBy("media_id").agg(count(lit(1)).as("n"), max("frame_idx").as("mx"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getInt(2))).toMap
    assert(byId.nonEmpty)
    byId.values.foreach { case (n, mx) => assert(n >= 1 && mx % 5 == 0) }
  }

  test("sliceFrames: exact byte slices, stride, maxFrames cap, edge containers") {
    import spark.implicits._
    // 3 frames of 4 bytes: [0..3][4..7][8..11]
    val container = Array.tabulate[Byte](12)(_.toByte)
    val media = Seq((1L, container), (2L, Array.emptyByteArray))
      .toDF("media_id", "bytes")
    val out = Multimodal.sliceFrames(media, "media_id", "bytes",
      frameBytes = 4, everyK = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2),
        r.getAs[Array[Byte]](3).toSeq))
    // video 1 samples frames 0 and 2 with EXACT bytes; the empty
    // container emits nothing
    assert(out.toSeq.sortBy(_._2) == Seq(
      (1L, 0, 3, Seq[Byte](0, 1, 2, 3)),
      (1L, 2, 3, Seq[Byte](8, 9, 10, 11))))
    // maxFrames caps the SAMPLE count (not the index range)
    val capped = Multimodal.sliceFrames(media, "media_id", "bytes",
      frameBytes = 4, everyK = 1, maxFrames = 2)
      .collect().map(r => r.getInt(1)).sorted
    assert(capped.toSeq == Seq(0, 1))
    // a ragged container raises loudly instead of dropping tail bytes
    val ragged = Seq((3L, Array.tabulate[Byte](10)(_.toByte))).toDF("media_id", "bytes")
    val e = intercept[Exception] {
      Multimodal.sliceFrames(ragged, "media_id", "bytes", frameBytes = 4).collect()
    }
    assert(e.getMessage.contains("not a multiple of frameBytes"))
  }

  test("sliceFramesRagged: exact spans, overlap, empty frames, stride/cap, null index") {
    import spark.implicits._
    val container = Array.tabulate[Byte](12)(_.toByte)
    // frames: [0,+3) [3,+5) [8,+4) — genuinely ragged; plus an
    // OVERLAPPING span re-reading the head, and a ZERO-LENGTH frame
    val media = Seq(
      (1L, container, Seq(0, 3, 8), Seq(3, 5, 4)),
      (2L, container, Seq(0, 1), Seq(4, 4)), // overlap: [0,+4) and [1,+4)
      (3L, container, Seq(6), Seq(0)), // empty frame is data
      (4L, container, Seq.empty[Int], Seq.empty[Int]), // no frames
      (5L, null.asInstanceOf[Array[Byte]], Seq(0), Seq(1)), // null bytes
      (6L, container, null.asInstanceOf[Seq[Int]], Seq(1)) // null index
    ).toDF("media_id", "bytes", "offs", "lens")
    val out = Multimodal.sliceFramesRagged(media, "media_id", "bytes",
      "offs", "lens")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2),
        r.getAs[Array[Byte]](3).toSeq)).toSeq.sortBy(t => (t._1, t._2))
    assert(out == Seq(
      (1L, 0, 3, Seq[Byte](0, 1, 2)),
      (1L, 1, 3, Seq[Byte](3, 4, 5, 6, 7)),
      (1L, 2, 3, Seq[Byte](8, 9, 10, 11)),
      (2L, 0, 2, Seq[Byte](0, 1, 2, 3)),
      (2L, 1, 2, Seq[Byte](1, 2, 3, 4)),
      (3L, 0, 1, Seq.empty[Byte])))
    // stride + cap sample the index like the fixed-size form
    val sampled = Multimodal.sliceFramesRagged(
      Seq((1L, container, Seq(0, 3, 8), Seq(3, 5, 4))).toDF("media_id", "bytes", "offs", "lens"),
      "media_id", "bytes", "offs", "lens", everyK = 2)
      .collect().map(r => r.getInt(1)).sorted
    assert(sampled.toSeq == Seq(0, 2))
    val capped = Multimodal.sliceFramesRagged(
      Seq((1L, container, Seq(0, 3, 8), Seq(3, 5, 4))).toDF("media_id", "bytes", "offs", "lens"),
      "media_id", "bytes", "offs", "lens", maxFrames = 2)
      .collect().map(r => r.getInt(1)).sorted
    assert(capped.toSeq == Seq(0, 1))
    // LOUD GUARDS: span past the container, negative span, index-size
    // mismatch, null entry inside the index — never silent truncation
    def raises(offs: Seq[Integer], lens: Seq[Integer], msg: String): Unit = {
      val e = intercept[Exception] {
        Multimodal.sliceFramesRagged(
          Seq((9L, container, offs, lens)).toDF("media_id", "bytes", "offs", "lens"),
          "media_id", "bytes", "offs", "lens").collect()
      }
      assert(e.getMessage.contains(msg), s"got: ${e.getMessage}")
    }
    raises(Seq(10), Seq(5), "past the 12-byte container")
    raises(Seq(-1), Seq(3), "truncated or corrupt media")
    raises(Seq(0), Seq(-2), "truncated or corrupt media")
    raises(Seq(0, 4), Seq(4), "offsets/lengths disagree")
    raises(Seq(0, null), Seq(2, 2), "truncated or corrupt media")
  }

  test("sliceFrames composes with the real per-frame dHash extractor") {
    import spark.implicits._
    // two videos sharing frame 0 byte-for-byte: their sampled frame-0
    // dHashes must collide; 72-byte frames are the 9x8 minimum grid
    // dHash64 accepts (width >= 9, height >= 8)
    val shared = Array.tabulate[Byte](72)(i => (i * 7 % 97).toByte)
    val other = Array.tabulate[Byte](72)(i => (i * 13 % 89 + 1).toByte)
    val media = Seq(
      (1L, shared ++ other), (2L, shared ++ shared)).toDF("media_id", "bytes")
    val hashed = Multimodal.sliceFrames(media, "media_id", "bytes", frameBytes = 72)
      .withColumn("dh", Multimodal.dHash64(col("frame"), lit(9), lit(8)))
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(4)).toMap
    assert(hashed((1L, 0)) == hashed((2L, 0)), "shared frame must hash equal")
    assert(hashed((2L, 0)) == hashed((2L, 1)), "identical frames within a video too")
  }

  private def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("maxBucketSize df-cuts saturated perceptual buckets; under-cap buckets keep full recall") {
    import spark.implicits._
    // 40 media rows with the SAME hash (black frames / solid color: all 4
    // band slices identical → every bucket saturates) + a cold near-dup
    // pair in its own buckets + a singleton
    val hot = (1L to 40L).map(i => (i, 0x5a5a5a5a5a5a5a5aL))
    val cold = Seq((201L, 0x0f0f0f0f12345678L), (202L, 0x0f0f0f0f12345679L))
    val media = (hot ++ cold :+ ((900L, 0x7777777700000001L))).toDF("id", "h")
    val full = pairSet(Multimodal.perceptualNearDupPairs(
      media, "id", "h", bands = 4, maxHamming = 3))
    val capped = pairSet(Multimodal.perceptualNearDupPairs(
      media, "id", "h", bands = 4, maxHamming = 3, maxBucketSize = 5))
    // batchCut ⊆ full, always
    assert(capped.subsetOf(full), s"cut emitted pairs the uncapped form lacks: ${capped -- full}")
    // arrival-rank semantics: the hot bucket keeps its first 5 ids' pairs
    val hotPairs = for (a <- 1L to 5L; b <- (a + 1) to 5L) yield (a, b)
    assert(capped == hotPairs.toSet + ((201L, 202L)),
      s"expected first-5 hot pairs + the cold under-cap pair at full recall, got $capped")
    // pair volume is bounded by cap²/2 per bucket, not corpus²
    assert(full.size == 40 * 39 / 2 + 1)
    // a cap at/above the largest bucket is EXACTLY the uncapped result
    val loose = pairSet(Multimodal.perceptualNearDupPairs(
      media, "id", "h", bands = 4, maxHamming = 3, maxBucketSize = 40))
    assert(loose == full, "cap >= max bucket must change nothing")
    intercept[IllegalArgumentException](Multimodal.perceptualNearDupPairs(
      media, "id", "h", bands = 4, maxBucketSize = 0).collect())
  }

  test("maxBucketSize on the frame axis: saturated frame buckets cut, planted video pairs survive") {
    import spark.implicits._
    // 30 videos whose frame 0 is a black frame (identical hash — the
    // saturated bucket) and whose frame 1 is per-video; videos 1/2 are a
    // planted pair sharing BOTH distinct frames
    val black = 0x1111111111111111L
    def fh(v: Long): Seq[(Long, Int, Long)] =
      Seq((v, 0, black), (v, 1, v * 0x9e3779b97f4a7c15L | 1L))
    val rows = (1L to 30L).flatMap(fh) ++
      Seq((101L, 0, 0x2222222233334444L), (101L, 1, 0x00ff00ff00ff00ffL),
        (102L, 0, 0x2222222233334444L), (102L, 1, 0x00ff00ff00ff00ffL))
    val frames = rows.toDF("media_id", "frame_idx", "dhash")
    val full = Multimodal.videoNearDupPairsFromHashes(frames, "media_id",
      bands = 4, maxHamming = 0, minSharedFrames = 1)
    val capped = Multimodal.videoNearDupPairsFromHashes(frames, "media_id",
      bands = 4, maxHamming = 0, minSharedFrames = 1, maxBucketSize = 4)
    val fullSet = pairSet(full)
    val cappedSet = pairSet(capped)
    assert(cappedSet.subsetOf(fullSet))
    // the black frame paired all 30 videos uncapped; capped keeps only
    // the first 4 arrivals' pairs — and the under-cap planted pair
    assert(fullSet.size == 30 * 29 / 2 + 1)
    assert(cappedSet == (for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b)).toSet
      + ((101L, 102L)), s"got $cappedSet")
    // the planted pair's shared count is the DISTINCT frame-pair count
    val shared = capped.filter(col("doc_a") === 101L).select("shared_frames")
      .head().getLong(0)
    assert(shared == 2L)
  }

  test("capBuckets: the rank window's Exchange IS the join's — the cap adds ZERO shuffles") {
    import spark.implicits._
    def stats(df: org.apache.spark.sql.DataFrame): (Int, Int) = {
      df.collect()
      val finalSection = df.queryExecution.executedPlan.toString
        .split("== Initial Plan ==")(0)
      assert(finalSection.contains("isFinalPlan=true"), "adaptive plan did not finalize")
      ("Exchange hashpartitioning".r.findAllIn(finalSection).size,
        "ReusedExchange".r.findAllIn(finalSection).size)
    }
    // adjacent ids share a hash so pairs EXIST — an empty result lets
    // AQE collapse the whole plan to EmptyRelation and there is nothing
    // to count (measured: 200 distinct hashes → zero stages executed)
    val media = (1L to 200L).map(i => (i, (i / 2) * 0x9e3779b97f4a7c15L)).toDF("id", "h")
    val (plain, plainReused) = stats(Multimodal.perceptualNearDupPairs(
      media, "id", "h", bands = 4, maxHamming = 3))
    val (capped, cappedReused) = stats(Multimodal.perceptualNearDupPairs(
      media, "id", "h", bands = 4, maxHamming = 3, maxBucketSize = 10))
    // the window hash-partitions on (band, bh) — the join's own
    // distribution — so capping must not change the shuffle count, and
    // the second join side must still read the ReusedExchange (the
    // decode/hash chain still computes once)
    assert(capped == plain,
      s"maxBucketSize added a shuffle: $plain uncapped vs $capped capped")
    assert(plainReused >= 1 && cappedReused >= 1,
      s"banded self-join sides stopped sharing the Exchange: $plainReused/$cappedReused")
  }

  test("bucket cuts are observable: perceptual.bucket_cut fires iff rows were dropped") {
    import graft.core.{SignalBus, Signals}
    import spark.implicits._
    def sigs(cap: String) = SignalBus.global.emitted(Signals.PerceptualBucketCut)
      .filter(_.fields.get("max_bucket_size").contains(cap))
    // caps 37/38 are unique to this test (the LlmSpec df-cut convention)
    val hot = (1L to 50L).map(i => (i, 0x1234123412341234L)).toDF("id", "h")
    Multimodal.perceptualNearDupPairs(hot, "id", "h", bands = 4,
      maxBucketSize = 37).count()
    val quiet = (1L to 5L).map(i => (i, i * 0x9e3779b97f4a7c15L)).toDF("id", "h")
    Multimodal.perceptualNearDupPairs(quiet, "id", "h", bands = 4,
      maxBucketSize = 38).count()
    val deadline = System.currentTimeMillis() + 30000
    while (sigs("37").isEmpty && System.currentTimeMillis() < deadline) Thread.sleep(100)
    val fired = sigs("37")
    assert(fired.nonEmpty, "bucket cut dropped rows but no perceptual.bucket_cut signal fired")
    // 50 rows × 4 bands, 37 kept per bucket → 13 dropped per band
    assert(fired.last.fields("dropped_rows").toLong == 4L * 13L)
    assert(sigs("38").isEmpty, "a cap that dropped nothing must stay silent")
  }

  /** Deterministic avalanche gray grid (row-major w×h bytes). */
  private def avGrid(seed: Long, w: Int, h: Int): Array[Byte] =
    Array.tabulate(w * h) { p =>
      var hs = seed * 2654435761L + (p % w).toLong * 1315423911L + (p / w).toLong * 97531L
      hs ^= hs >>> 33; hs *= -49064778989728563L; hs ^= hs >>> 33
      ((((hs % 200) + 200) % 200) + 1).toByte
    }

  test("imageTileHashes: tile slicing is pixel-exact; edge remainders drop; sub-tile images emit nothing") {
    import spark.implicits._
    // 37×33 image with 18×16 tiles → 2×2 = 4 full tiles; the 37th
    // column and 33rd row are remainder pixels, dropped by contract
    val (w, h) = (37, 33)
    val g = avGrid(5L, w, h)
    val df = Seq((1L, g, w, h)).toDF("media_id", "gray", "w", "h")
    val got = Multimodal.imageTileHashes(df, "media_id", "gray", "w", "h",
        tileW = 18, tileH = 16, dropZeroTiles = false)
      .select("tile_idx", "n_tiles", "thash")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2))).sortBy(_._1)
    def handTile(tr: Int, tc: Int): Array[Byte] = {
      val out = new Array[Byte](18 * 16)
      for (r <- 0 until 16; c <- 0 until 18)
        out(r * 18 + c) = g((tr * 16 + r) * w + tc * 18 + c)
      out
    }
    val expect = (0 until 4).map { idx =>
      graft.functions.DHash64(null, null, null)
        .route(handTile(idx / 2, idx % 2), 18, 16).longValue()
    }
    assert(got.map(_._1).toSeq == Seq(0, 1, 2, 3) && got.forall(_._2 == 4))
    assert(got.map(_._3).toSeq == expect,
      "each tile hash must equal dhash64 of the hand-sliced tile bytes")
    // narrower than one tile → nothing to hash
    val thin = Seq((2L, avGrid(6L, 17, 33), 17, 33)).toDF("media_id", "gray", "w", "h")
    assert(Multimodal.imageTileHashes(thin, "media_id", "gray", "w", "h", 18, 16).count() == 0)
    intercept[IllegalArgumentException](
      Multimodal.imageTileHashes(df, "media_id", "gray", "w", "h", 8, 16))
  }

  test("tile near-dup collapses a CROPPED copy the whole-image dHash provably misses") {
    import spark.implicits._
    // base 36×32; the copy is the BOTTOM HALF (36×16) — the crop class
    // VERDICT-style gap analysis names: the whole-image 8×9 block grid
    // shifts, but the crop's 2 tiles are pixel-identical to the base's
    val (w, h) = (36, 32)
    val base = avGrid(11L, w, h)
    val crop = base.slice(16 * w, 32 * w)
    val other = avGrid(29L, w, h)
    val media = Seq((1L, base, w, h), (2L, crop, w, 16), (3L, other, w, h))
      .toDF("media_id", "gray", "w", "h")
    // the gap, machine-checked: whole-image dHashes do NOT pair the crop
    val whole = Multimodal.perceptualNearDupPairs(
      media.withColumn("dh", Multimodal.dHash64(col("gray"), col("w"), col("h"))),
      "media_id", "dh", bands = 4, maxHamming = 3).count()
    assert(whole == 0, "whole-image hashes must NOT collapse a crop " +
      "(if this starts passing the tile path is redundant — re-judge)")
    // the tile path closes it
    val tiles = Multimodal.imageTileHashes(media, "media_id", "gray", "w", "h",
      tileW = 18, tileH = 16)
    val pairs = Multimodal.imageNearDupPairsByTilesFromHashes(tiles, "media_id",
        bands = 4, maxHamming = 0, minSharedTiles = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pairs.toSeq == Seq((1L, 2L, 2L)),
      s"crop must share exactly its 2 aligned tiles: ${pairs.toSeq}")
  }

  test("dedupImagesByTiles: a real-PNG crop collapses keep-best; corrupt rows survive") {
    import spark.implicits._
    javax.imageio.ImageIO.setUseCache(false)
    def png(gray: Array[Byte], w: Int, h: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) {
        val v = gray(y * w + x) & 0xff
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val (w, h) = (36, 32)
    val base = avGrid(41L, w, h)
    val media = Seq(
      (10L, png(base, w, h), 0.9),
      (11L, png(base.slice(16 * w, 32 * w), w, 16), 0.5), // bottom-half crop
      (20L, png(avGrid(43L, w, h), w, h), 0.4),           // distinct image
      (30L, Array.fill[Byte](7)(3), 0.1)                  // corrupt blob
    ).toDF("media_id", "bytes", "score")
    val kept = Multimodal.dedupImagesByTiles(media, "media_id", "bytes", "score",
        tileW = 18, tileH = 16, bands = 4, maxHamming = 0)
      .select("media_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(10L, 20L, 30L),
      s"keep-best must keep the higher-scored original, singletons, corrupt rows: $kept")
  }

  test("dropZeroTiles: uniform tiles never manufacture pairs; disabled, they do") {
    import spark.implicits._
    // two images sharing ONLY a solid-white tile region (uniform → tile
    // hash exactly 0); their textured tiles are unrelated
    val (w, h) = (36, 16)
    def withSolidLeft(seed: Long): Array[Byte] = {
      val g = avGrid(seed, w, h)
      for (r <- 0 until 16; c <- 0 until 18) g(r * w + c) = -1 // 0xff left tile
      g
    }
    val media = Seq((1L, withSolidLeft(51L), w, h), (2L, withSolidLeft(53L), w, h))
      .toDF("media_id", "gray", "w", "h")
    def shared(drop: Boolean): Long =
      Multimodal.imageNearDupPairsByTilesFromHashes(
        Multimodal.imageTileHashes(media, "media_id", "gray", "w", "h",
          18, 16, dropZeroTiles = drop),
        "media_id", bands = 4, maxHamming = 0, minSharedTiles = 1).count()
    assert(shared(drop = true) == 0,
      "a shared flat background must not make two unrelated images near-dups")
    assert(shared(drop = false) == 1,
      "with the guard off the uniform tiles pair (proving the guard is what blocks them)")
  }

  test("pinned bands run ZERO jobs at plan-build time on every media pair operator") {
    import spark.implicits._
    // the shared dedupSizing rule (round 19): the bands=0 sizing count is
    // the ONLY job a pair operator may run eagerly, so with bands pinned,
    // merely BUILDING the pair plan must launch no Spark job on any
    // modality axis — if this fires, a sizing (or other eager) pass
    // leaked back into a pinned-bands path. (The dedup ONE-calls add
    // duplicateClusters, whose connected-components loop is eagerly
    // iterative by design — the sizing contract is pinned here, at the
    // pair layer the one-calls delegate their bands handling to.)
    val media = Seq((1L, Array[Byte](1, 2, 3), 0.5), (2L, Array[Byte](4, 5), 0.9))
      .toDF("media_id", "bytes", "score")
    @volatile var jobs = 0
    val l = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs += 1
    }
    spark.sparkContext.addSparkListener(l)
    try {
      Multimodal.perceptualNearDupPairs(media.withColumn("h", lit(1L)),
        "media_id", "h", bands = 4)
      Multimodal.videoNearDupPairs(media, "media_id", "bytes", bands = 4)
      Multimodal.audioNearDupPairs(media, "media_id", "bytes", bands = 4)
      Multimodal.imageNearDupPairsByTiles(media, "media_id", "bytes", bands = 4)
      Multimodal.videoSoundtrackNearDupPairs(media, "media_id", "bytes", bands = 4)
      Thread.sleep(2000) // listener events are async — let stragglers land
      assert(jobs == 0,
        s"pinned-bands pair operator ran $jobs job(s) at build time — a sizing pass leaked in")
    } finally spark.sparkContext.removeSparkListener(l)
  }

  test("strided tiles: an off-grid crop collapses under hop < tile; the default grid provably misses it") {
    import spark.implicits._
    // rows 8..23 of a 36x32 image: a crop at y-offset 8 — inside the
    // first default tile row, so NO non-overlapping 16-row tile of the
    // original is pixel-identical to any crop tile
    val full = avGrid(7L, 36, 32)
    val crop = full.slice(8 * 36, 24 * 36)
    val media = Seq((1L, full, 36, 32), (2L, crop, 36, 16))
      .toDF("media_id", "gray", "w", "h")
    def pairs(hopH: Int): Set[(Long, Long)] = {
      val tiles = Multimodal.imageTileHashes(media, "media_id", "gray", "w", "h",
        tileW = 18, tileH = 16, tileHopH = hopH)
      Multimodal.imageNearDupPairsByTilesFromHashes(tiles, "media_id", bands = 4,
        maxHamming = 0, minSharedTiles = 2)
        .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    // re-judge tripwire: the non-overlapping default MUST miss the
    // off-grid crop (if this starts passing, the hop knob is redundant)
    assert(pairs(0).isEmpty,
      "default tile grid caught an off-grid crop — hop knob redundant; re-judge")
    // hop 8 strides origins through y = 8: both x-tiles there are
    // pixel-identical to the crop's two tiles — the pair collapses
    assert(pairs(8) == Set((1L, 2L)),
      s"hop < tile must realign the hop-multiple crop, got ${pairs(8)}")
    // the default (hop = 0 = tile) is byte-identical to the explicit
    // tile-sized hop AND to the r18 grid semantics
    val defTiles = Multimodal.imageTileHashes(media, "media_id", "gray", "w", "h",
      tileW = 18, tileH = 16)
    val hopTiles = Multimodal.imageTileHashes(media, "media_id", "gray", "w", "h",
      tileW = 18, tileH = 16, tileHopW = 18, tileHopH = 16)
    assert(rowsOf(defTiles) == rowsOf(hopTiles))
    // n_tiles accounting on the strided grid: 2 x-origins x 3 y-origins
    val nt = Multimodal.imageTileHashes(media.filter(col("media_id") === 1L),
      "media_id", "gray", "w", "h", tileW = 18, tileH = 16, tileHopH = 8)
      .select("n_tiles").head().getInt(0)
    assert(nt == 6, s"strided origin grid must count ((36-18)/18+1)*((32-16)/8+1)=6, got $nt")
  }

  test("FromHashes adapter seam: externally-decoded (id, pos, hash64) frames drive all three axes identically") {
    import spark.implicits._
    // the declared external-decoder contract (round 19): a production
    // pipeline with real codecs (H.264, AAC, HEIC) decodes/samples/hashes
    // OUTSIDE the engine and hands over narrow signature rows — no bytes
    // anywhere. One externally-shaped frame set must drive all three
    // batch axes to the same pair with the axis-specific count column.
    val rows = Seq(
      (10L, 0, 0x1111222233334444L), (10L, 1, 0x5555666677778888L),
      (20L, 0, 0x1111222233334444L), (20L, 1, 0x5555666677778888L),
      (30L, 0, 0x0f0f0f0f0f0f0f0fL))
    def run(df: org.apache.spark.sql.DataFrame,
            f: (org.apache.spark.sql.DataFrame, String) => org.apache.spark.sql.DataFrame,
            countCol: String): Seq[(Long, Long, Long)] = {
      val out = f(df, "media_id")
      assert(out.columns.toSeq == Seq("doc_a", "doc_b", countCol),
        s"adapter output schema drifted: ${out.columns.toSeq}")
      out.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq.sorted
    }
    val expect = Seq((10L, 20L, 2L))
    assert(run(rows.toDF("media_id", "frame_idx", "dhash"),
      (df, id) => Multimodal.videoNearDupPairsFromHashes(df, id, bands = 4,
        maxHamming = 0, minSharedFrames = 2), "shared_frames") == expect)
    assert(run(rows.toDF("media_id", "seg_idx", "ahash"),
      (df, id) => Multimodal.audioNearDupPairsFromHashes(df, id, bands = 4,
        maxHamming = 0, minSharedSegments = 2), "shared_segments") == expect)
    assert(run(rows.toDF("media_id", "tile_idx", "thash"),
      (df, id) => Multimodal.imageNearDupPairsByTilesFromHashes(df, id, bands = 4,
        maxHamming = 0, minSharedTiles = 2), "shared_tiles") == expect)
    // positions are distinctness markers, never required equal: an
    // external sampler with its own position numbering still pairs
    val offset = Seq((10L, 0, 0x1111222233334444L), (10L, 1, 0x5555666677778888L),
      (20L, 7, 0x1111222233334444L), (20L, 9, 0x5555666677778888L))
      .toDF("media_id", "frame_idx", "dhash")
    assert(run(offset, (df, id) => Multimodal.videoNearDupPairsFromHashes(df, id,
      bands = 4, maxHamming = 0, minSharedFrames = 2), "shared_frames") == expect)
    // the seam owns no sizing: a band count that cannot slice 64 bits
    // raises loudly instead of guessing
    intercept[IllegalArgumentException](Multimodal.videoNearDupPairsFromHashes(
      offset, "media_id", bands = 5))
  }
}
