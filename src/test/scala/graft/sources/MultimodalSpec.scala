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
}
