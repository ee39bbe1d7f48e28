package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins for the exact integer PCM resampler (round 20, VERDICT r19 #1):
  * the closed-form arithmetic the Q-M14 oracle replays, the identities
  * that make it trustworthy as a normalize-before-hash step, and the
  * NULL contract. The [[ResizeSpec]] battery on the time axis.
  */
class ResampleSpec extends SparkSpec {
  import spark.implicits._

  private def le16(samples: Seq[Int]): Array[Byte] = {
    val out = new Array[Byte](samples.length * 2)
    samples.zipWithIndex.foreach { case (s, i) =>
      out(2 * i) = (s & 0xff).toByte
      out(2 * i + 1) = ((s >> 8) & 0xff).toByte
    }
    out
  }

  private def resample(samples: Seq[Int], sr: Int, dr: Int): Seq[Int] = {
    val rows = Seq((1L, le16(samples), sr)).toDF("id", "pcm", "rate")
      .select(graft.sources.Multimodal.resamplePcm(col("pcm"), col("rate"), dr).as("r"))
      .collect()
    rows.head.getAs[Array[Byte]](0).grouped(2)
      .map(p => (((p(1) << 8) | (p(0) & 0xff)).toShort.toInt)).toSeq
  }

  test("equal rates are the byte-exact identity") {
    val s = Seq(0, 100, -100, 32000, -32000, 7)
    assert(resample(s, 16000, 16000) == s)
  }

  test("2:1 downsample is floorDiv(a + b + 1, 2) per pair — negatives round by FLOOR, not truncation") {
    // (10+21+1)//2 = 16; (-5-6+1)//2 = floor(-5.0) = -5; (100-101+1)//2 = 0
    assert(resample(Seq(10, 21, -5, -6, 100, -101), 16000, 8000) == Seq(16, -5, 0))
    // a trailing odd sample has no complete output span and drops
    assert(resample(Seq(10, 20, 30), 16000, 8000) == Seq(15))
  }

  test("1:2 upsample duplicates every sample (each output span covers one source fully)") {
    assert(resample(Seq(5, -7, 123), 8000, 16000) == Seq(5, 5, -7, -7, 123, 123))
  }

  test("fractional ratio: hand-computed overlap weights, rounded half-up by floor division") {
    // 3 -> 2 samples: out0 covers src0 (w=2) + half of src1 (w=1):
    // (2*10 + 1*20 + 1) // 3 = 13; out1: (1*20 + 2*30 + 1) // 3 = 27
    // — the ResizeSpec numbers on the time axis
    assert(resample(Seq(10, 20, 30), 3, 2) == Seq(13, 27))
  }

  test("NULL contract: malformed rows filter, malformed targets fail the build") {
    val rows = Seq(
      (1L, le16(Seq(1, 2, 3, 4)), 16000), // well-formed
      (2L, Array[Byte](1, 2, 3), 16000),  // odd byte length: not mono16
      (3L, null.asInstanceOf[Array[Byte]], 16000), // null pcm
      (4L, le16(Seq(1, 2)), 0)            // degenerate source rate
    ).toDF("id", "pcm", "rate")
    val out = rows.select(col("id"),
        graft.sources.Multimodal.resamplePcm(col("pcm"), col("rate"), 8000).as("r"))
      .collect().map(r => r.getLong(0) -> r.isNullAt(1)).toMap
    assert(out == Map(1L -> false, 2L -> true, 3L -> true, 4L -> true))
    intercept[IllegalArgumentException](
      graft.sources.Multimodal.resamplePcm(col("pcm"), col("rate"), 0))
  }

  test("a clip shorter than one output sample resamples to EMPTY, not NULL (no samples is data)") {
    assert(resample(Seq(42), 16000, 8000) == Seq.empty)
  }
}
