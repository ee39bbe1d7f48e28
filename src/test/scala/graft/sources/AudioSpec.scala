package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Real-WAV decode + energy-envelope hash: the audio half of the codec
  * boundary (round 17). The WAV writer here is test-local and
  * independent of the engine parser, so a parse bug cannot cancel a
  * write bug.
  */
class AudioSpec extends SparkSpec {
  import spark.implicits._

  /** Minimal RIFF/PCM writer; `samples` are interleaved when channels>1.
    * `junkChunk` inserts a foreign word-aligned chunk before `data` (real
    * encoders emit LIST/fact chunks the parser must skip).
    */
  private def wav(samples: Array[Short], rate: Int = 16000, channels: Int = 1,
                  bits: Int = 16, junkChunk: Boolean = false): Array[Byte] = {
    val dataLen = samples.length * (bits / 8)
    val bos = new java.io.ByteArrayOutputStream()
    def ascii(s: String): Unit = bos.write(s.getBytes("US-ASCII"))
    def le16(v: Int): Unit = { bos.write(v & 0xff); bos.write((v >> 8) & 0xff) }
    def le32(v: Int): Unit = { le16(v & 0xffff); le16((v >>> 16) & 0xffff) }
    val junkLen = if (junkChunk) 8 + 6 /*payload+pad*/ else 0
    ascii("RIFF"); le32(36 + junkLen + dataLen); ascii("WAVE")
    ascii("fmt "); le32(16); le16(1); le16(channels); le32(rate)
    le32(rate * channels * bits / 8); le16(channels * bits / 8); le16(bits)
    if (junkChunk) { ascii("LIST"); le32(5); bos.write(Array[Byte](1, 2, 3, 4, 5, 0)) } // odd size + pad
    ascii("data"); le32(dataLen)
    if (bits == 16) samples.foreach(s => le16(s & 0xffff))
    else samples.foreach(s => bos.write(((s >> 8) + 128) & 0xff))
    bos.toByteArray
  }

  private def pcmOf(bytes: Array[Byte]): Option[(Int, Int, Int, Seq[Short])] =
    Multimodal.decodeWav(bytes).map { case (r, c, n, pcm) =>
      (r, c, n, pcm.grouped(2).map(p =>
        (((p(1) << 8) | (p(0) & 0xff)).toShort)).toSeq)
    }

  test("decodeWav: mono 16-bit round-trips byte-exact; foreign chunks skip") {
    val s = Array[Short](0, 100, -100, 32000, -32000, 7)
    assert(pcmOf(wav(s)) == Some((16000, 1, 6, s.toSeq)))
    // a LIST chunk with an ODD size (word-aligned skip) before data
    assert(pcmOf(wav(s, junkChunk = true)) == Some((16000, 1, 6, s.toSeq)))
  }

  test("decodeWav: stereo downmixes by integer average; 8-bit widens to the 16-bit lattice") {
    // interleaved L/R — mono = (L+R)/2, JVM integer division
    val stereo = Array[Short](100, 200, -100, -201, 5, -4)
    assert(pcmOf(wav(stereo, channels = 2)) ==
      Some((16000, 2, 3, Seq[Short](150, -150, 0))))
    // 8-bit unsigned around 128 → (b-128)<<8
    val eight = Array[Short](0, 256, -256, 32512)
    assert(pcmOf(wav(eight, bits = 8)) ==
      Some((16000, 1, 4, Seq[Short](0, 256, -256, 32512))))
  }

  test("decodeWav: garbage, truncation, and non-PCM formats are None (filterable NULLs end to end)") {
    val good = wav(Array.tabulate[Short](10)(i => i.toShort))
    assert(Multimodal.decodeWav(null).isEmpty)
    assert(Multimodal.decodeWav(Array.fill[Byte](44)(7)).isEmpty) // bad magic
    assert(Multimodal.decodeWav(good.take(good.length - 3)).isEmpty) // truncated data chunk
    val float = good.clone(); float(20) = 3 // format code 3 = IEEE float
    assert(Multimodal.decodeWav(float).isEmpty)
    // distributed face: NULLs in all four appended columns
    val df = Seq((1L, good), (2L, Array.fill[Byte](44)(7))).toDF("media_id", "bytes")
    val out = Multimodal.decodeWavPcm(df, "bytes")
      .select("media_id", "sample_rate", "n_samples")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some((r.getInt(1), r.getInt(2))))).toMap
    assert(out(1L) == Some((16000, 10)) && out(2L).isEmpty)
  }

  test("audioHash64: exact volume invariance, NULL contracts, envelope sensitivity") {
    // 130 samples = 2 per frame; energies vary per frame via the pattern
    def tone(scale: Int): Array[Short] =
      Array.tabulate[Short](130)(i => ((i % 97 - 48) * scale).toShort)
    val df = Seq(
      (1L, wav(tone(1))), (2L, wav(tone(3))), // 2 = volume-scaled copy of 1
      (3L, wav(tone(1).reverse)), // different envelope
      (4L, wav(Array.tabulate[Short](64)(_.toShort))), // too short: < 65 samples
      (5L, Array.fill[Byte](10)(1)) // undecodable
    ).toDF("media_id", "bytes")
    val hashed = Multimodal.decodeWavPcm(df, "bytes")
      .select(col("media_id"), Multimodal.audioHash64(col("pcm")).as("ah"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(hashed(1L).isDefined)
    assert(hashed(1L) == hashed(2L), "integer volume scaling must not move the hash")
    assert(hashed(1L) != hashed(3L), "a reversed envelope must move the hash")
    assert(hashed(4L).isEmpty, "no envelope exists under 65 samples")
    assert(hashed(5L).isEmpty, "undecodable media must carry a NULL hash")
  }

  test("ScaleBench audio fixture: planted re-levels and stereo re-encodes are exactly hash-invariant") {
    // the audio_decode/audio_dedup rows' pair volume depends on these
    // claims — machine check, not a generator comment
    val dir = java.nio.file.Files.createTempDirectory("audiofix").toString
    graft.tools.ScaleBench.generateAudio(spark, sf, dir)
    val media = spark.read.parquet(dir)
    val hashed = Multimodal.decodeWavPcm(
        media.select(col("media_id"), col("bytes")), "bytes")
      .select(col("media_id"), Multimodal.audioHash64(col("pcm")).as("ah"))
      .collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toMap
    assert(hashed.nonEmpty && hashed.values.forall(_.isDefined),
      "every fixture clip must decode and hash")
    val bases = hashed.keys.filter(_ % 4 == 0).toSeq
    var planted = 0
    for (b <- bases) {
      val id = b / 4
      if (id % 3 == 0) { assert(hashed(b) == hashed(b + 1), s"4x volume of id $id"); planted += 1 }
      if (id % 5 == 0) { assert(hashed(b) == hashed(b + 2), s"stereo re-encode of id $id"); planted += 1 }
    }
    assert(planted > 0)
    val uniq = bases.map(hashed(_).get).toSet
    assert(uniq.size > bases.size / 2,
      s"base clips must be mostly distinct, got ${uniq.size}/${bases.size}")
  }

  test("dedupAudioPerceptual: re-leveled copies collapse keep-best; undecodable rows survive") {
    def tone(seed: Int, scale: Int): Array[Short] =
      Array.tabulate[Short](260)(i => (((i * 31 + seed) % 89 - 44) * scale).toShort)
    val media = Seq(
      (10L, wav(tone(1, 1)), 0.5), (11L, wav(tone(1, 2)), 0.9), // same clip, re-leveled
      (20L, wav(tone(7, 1)), 0.4), // distinct clip
      (30L, Array.fill[Byte](5)(3), 0.1) // corrupt blob
    ).toDF("media_id", "bytes", "score")
    val kept = Multimodal.dedupAudioPerceptual(media, "media_id", "bytes",
        "score", bands = 4)
      .select("media_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(11L, 20L, 30L),
      s"keep-best must keep the higher-scored copy, singletons, and corrupt rows: $kept")
  }
}
