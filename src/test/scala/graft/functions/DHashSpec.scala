package graft.functions

import graft.SparkSpec
import graft.sources.Multimodal
import org.apache.spark.sql.functions._

/** [[DHash64]] — the perceptual media signature: invariance under the two
  * re-encode transforms the Q-M3 fixture plants (integer upscaling,
  * global brightness shift), locality under small edits, the
  * NULL-on-undecodable contract, and the banded pair path's narrow
  * shuffle shape.
  */
class DHashSpec extends SparkSpec {
  import spark.implicits._

  /** Deterministic synthetic grayscale grid (pattern varied by seed).
    * Pixels are a splitmix64-style hash of the (seed, x, y) TRIPLE — the
    * round-12 fixture was linear in seed mod 241, so seeds 5 apart were
    * uniform −1 brightness shifts of each other and dHash (brightness-
    * invariant by design, pinned below) correctly paired "distinct"
    * grids; hashing makes grids for different seeds independent. Values
    * stay in [0, 240] so the +10 brightness transform never clamps.
    */
  private def grid(seed: Long, w: Int, h: Int,
                   f: (Int, Int, Int) => Int = (v, _, _) => v): Array[Byte] =
    Array.tabulate(w * h) { p =>
      val x = p % w; val y = p / w
      var z = seed * 0x9E3779B97F4A7C15L + x * 0xC2B2AE3D27D4EB4FL +
        y * 0x165667B19E3779F9L
      z ^= (z >>> 30); z *= 0xBF58476D1CE4E5B9L
      z ^= (z >>> 27); z *= 0x94D049BB133111EBL
      z ^= (z >>> 31)
      val v = ((z & 0x7FFFFFFFFFFFFFFFL) % 241L).toInt
      f(v, x, y).toByte
    }

  private def upscale(base: Array[Byte], w: Int, h: Int, s: Int): Array[Byte] =
    Array.tabulate(w * s * h * s) { p =>
      val x = (p % (w * s)) / s; val y = (p / (w * s)) / s
      base(y * w + x)
    }

  private def hashOf(bytes: Array[Byte], w: Int, h: Int): Option[Long] = {
    val r = Seq((bytes, w, h)).toDF("bytes", "w", "h")
      .select(Multimodal.dHash64(col("bytes"), col("w"), col("h")).as("dh"))
      .collect()(0)
    if (r.isNullAt(0)) None else Some(r.getLong(0))
  }

  test("dHash is exactly invariant under integer upscaling and brightness shift (uniform blocks)") {
    for (seed <- Seq(1L, 7L, 42L, 999L)) {
      val base = grid(seed, 18, 16)
      val h0 = hashOf(base, 18, 16)
      assert(h0.nonEmpty)
      // 2x and 3x nearest-neighbor upscales: block sums scale by s^2 exactly
      assert(hashOf(upscale(base, 18, 16, 2), 36, 32) == h0, s"2x upscale changed hash (seed $seed)")
      assert(hashOf(upscale(base, 18, 16, 3), 54, 48) == h0, s"3x upscale changed hash (seed $seed)")
      // +10 brightness (no clamp: pattern max 240): every comparison shifts
      // both sides equally
      val bright = grid(seed, 18, 16, (v, _, _) => v + 10)
      assert(hashOf(bright, 18, 16) == h0, s"brightness changed hash (seed $seed)")
    }
  }

  test("a localized edit flips few bits; distinct images differ widely") {
    val base = grid(42L, 18, 16)
    val h0 = hashOf(base, 18, 16).get
    // +6 on the right half of the top two block-rows: only the boundary
    // comparison (bit j=4) of block-rows 0-1 can flip
    val noised = grid(42L, 18, 16, (v, x, y) => if (x >= 10 && y < 4) v + 6 else v)
    val h1 = hashOf(noised, 18, 16).get
    val d = java.lang.Long.bitCount(h0 ^ h1)
    assert(d <= 2, s"local edit flipped $d bits")
    assert(((h0 ^ h1) & ~0xFFFFL) == 0L, "flipped bits escaped band 0")
    val other = hashOf(grid(43L, 18, 16), 18, 16).get
    assert(java.lang.Long.bitCount(h0 ^ other) > 8, "distinct images too close")
  }

  test("undecodable inputs are NULL: short buffer, width < 9, height < 8") {
    assert(hashOf(Array.fill[Byte](100)(1), 18, 16).isEmpty) // 100 < 288
    assert(hashOf(grid(1L, 8, 16), 8, 16).isEmpty)
    assert(hashOf(grid(1L, 18, 7), 18, 7).isEmpty)
    // flat image: all comparisons tie -> hash 0, NOT null (decodable)
    assert(hashOf(Array.fill[Byte](288)(50), 18, 16).contains(0L))
  }

  test("perceptualNearDupPairs finds planted re-encodes, rescores exactly, and keep-best picks the biggest copy") {
    val rows = (0L until 40L).flatMap { g =>
      val base = grid(g, 18, 16)
      val orig = Seq((g, base, 18, 16))
      val up = if (g % 3 == 0) Seq((g + 1000L, upscale(base, 18, 16, 2), 36, 32)) else Nil
      val br = if (g % 5 == 0) Seq((g + 2000L, grid(g, 18, 16, (v, _, _) => v + 10), 18, 16)) else Nil
      orig ++ up ++ br
    }
    val media = rows.toDF("media_id", "bytes", "w", "h")
      .withColumn("dh", Multimodal.dHash64(col("bytes"), col("w"), col("h")))
      .withColumn("n_bytes", length(col("bytes")).cast("long"))
    val pairs = Multimodal.perceptualNearDupPairs(media, "media_id", "dh",
      bands = 4, maxHamming = 3)
    val got = pairs.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    // every planted copy pairs with its original at Hamming 0
    for (g <- 0L until 40L) {
      if (g % 3 == 0) assert(got.exists(p => p._1 == g && p._2 == g + 1000L && p._3 == 0), s"upscale pair missing for $g")
      if (g % 5 == 0) assert(got.exists(p => p._1 == g && p._2 == g + 2000L && p._3 == 0), s"brightness pair missing for $g")
    }
    // keep-best: the upscaled copy (4x the bytes) survives where planted
    val survivors = graft.llm.Dedup.dedupKeepBest(media, "media_id",
      pairs.select("doc_a", "doc_b"), "n_bytes")
      .select("media_id").as[Long].collect().toSet
    for (g <- 0L until 40L) {
      if (g % 3 == 0) {
        assert(survivors.contains(g + 1000L), s"upscale should win group $g")
        assert(!survivors.contains(g), s"base should lose group $g")
      } else if (g % 5 == 0) {
        // equal sizes: tie -> min id = the original
        assert(survivors.contains(g) && !survivors.contains(g + 2000L))
      } else assert(survivors.contains(g))
    }
    // narrow shuffle: no binary column in any Exchange of the pair plan
    val plan = pairs.queryExecution.executedPlan.toString
    assert(!plan.matches("(?s).*Exchange[^\\n]*bytes.*"), "media bytes entered a shuffle")
  }

  test("SQL registration exposes dhash64 (same value as the column API)") {
    graft.functions.Native.register(spark)
    val base = grid(42L, 18, 16)
    Seq((base, 18, 16)).toDF("bytes", "w", "h").createOrReplaceTempView("dhash_sql_in")
    val viaSql = spark.sql("SELECT dhash64(bytes, w, h) AS dh FROM dhash_sql_in")
      .collect()(0).getLong(0)
    assert(viaSql == hashOf(base, 18, 16).get)
    // exact arity enforced, not silently truncated
    intercept[Exception] { spark.sql("SELECT dhash64(bytes, w) FROM dhash_sql_in").collect() }
  }

  test("auto bands widen with corpus size (the Dedup.autoBands derivation)") {
    val media = Seq((1L, grid(1L, 18, 16), 18, 16), (2L, grid(2L, 18, 16), 18, 16))
      .toDF("media_id", "bytes", "w", "h")
      .withColumn("dh", Multimodal.dHash64(col("bytes"), col("w"), col("h")))
    // corpusSize pinned large -> 2 bands of 32 bits: identical hashes still collide
    val p = Multimodal.perceptualNearDupPairs(media, "media_id", "dh",
      corpusSize = Some(100000000L))
    assert(p.columns.toSeq == Seq("doc_a", "doc_b", "hamming"))
    assert(p.count() == 0)
  }
}
