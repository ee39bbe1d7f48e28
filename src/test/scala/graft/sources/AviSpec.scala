package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Real-AVI container demux (round 17). The AVI writer here is
  * test-local and independent of the engine indexer, so a parse bug
  * cannot cancel a write bug. The MJPEG test closes the loop: an AVI of
  * REAL JPEG frames demuxes → slices → decodes → hashes identically to
  * decoding the same JPEG bytes directly — video real end to end for
  * the intra-frame codec, no external library anywhere.
  */
class AviSpec extends SparkSpec {
  import spark.implicits._

  private def le32(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >>> 24) & 0xff).toByte)
  private def ascii(s: String): Array[Byte] = s.getBytes("US-ASCII")
  private def chunk(id: String, payload: Array[Byte]): Array[Byte] =
    ascii(id) ++ le32(payload.length) ++ payload ++
      (if (payload.length % 2 == 1) Array(0.toByte) else Array.empty[Byte])
  private def list(typ: String, children: Array[Byte]): Array[Byte] =
    chunk("LIST", ascii(typ) ++ children)
  private def avi(moviChildren: Array[Byte]): Array[Byte] = {
    val hdrl = list("hdrl", chunk("avih", new Array[Byte](56)))
    val movi = list("movi", moviChildren)
    val body = ascii("AVI ") ++ hdrl ++ movi
    ascii("RIFF") ++ le32(body.length) ++ body
  }

  test("indexAvi: ragged spans round-trip; audio and foreign chunks skip; odd sizes pad") {
    val f0 = Array[Byte](1, 2, 3) // odd → padded
    val f1 = Array[Byte](4, 5, 6, 7, 8)
    val f2 = Array[Byte](9, 10, 11, 12)
    val bytes = avi(
      chunk("00dc", f0) ++ chunk("01wb", Array[Byte](99, 98)) ++ // audio skipped
        chunk("00dc", f1) ++ chunk("JUNK", Array[Byte](0, 0)) ++ // foreign skipped
        chunk("00db", f2)) // uncompressed DIB collected too
    val Some((offs, lens)) = Multimodal.indexAviFrames(bytes)
    assert(lens.toSeq == Seq(3, 5, 4))
    assert(offs.toSeq.map(o => bytes.slice(o, o + 1).head) == Seq(1.toByte, 4.toByte, 9.toByte))
    // the composed slice recovers the exact payloads (the ragged-span
    // contract, through the distributed faces)
    val media = Seq((7L, bytes)).toDF("media_id", "bytes")
    val sliced = Multimodal.sliceFramesRagged(
      Multimodal.indexAvi(media, "bytes"), "media_id", "bytes",
      "frame_offsets", "frame_lengths")
      .collect().map(r => (r.getInt(1), r.getAs[Array[Byte]](3).toSeq)).toSeq.sortBy(_._1)
    assert(sliced == Seq((0, f0.toSeq), (1, f1.toSeq), (2, f2.toSeq)))
  }

  test("indexAvi: nested 'rec ' groups collect in stream order; empty movi is data") {
    val f0 = Array[Byte](1, 1)
    val f1 = Array[Byte](2, 2)
    val f2 = Array[Byte](3, 3)
    val bytes = avi(chunk("00dc", f0) ++
      list("rec ", chunk("00dc", f1) ++ chunk("01wb", Array[Byte](0))) ++
      chunk("00dc", f2))
    val Some((offs, lens)) = Multimodal.indexAviFrames(bytes)
    assert(lens.toSeq == Seq(2, 2, 2))
    assert(offs.toSeq.map(o => bytes(o)) == Seq(1.toByte, 2.toByte, 3.toByte))
    val Some((o2, l2)) = Multimodal.indexAviFrames(avi(Array.empty))
    assert(o2.isEmpty && l2.isEmpty, "an empty movi has nothing to sample, not an error")
  }

  test("indexAvi: a two-video-stream container selects ONE stream, never an interleaved merge") {
    // stream 00 and stream 01 video chunks interleaved the way a real
    // muxer emits them — the r17 indexer merged both into one span list,
    // silently corrupting frame_idx for every downstream consumer
    val s0f0 = Array[Byte](10, 10)
    val s1f0 = Array[Byte](20, 20)
    val s0f1 = Array[Byte](11, 11)
    val s1f1 = Array[Byte](21, 21)
    val bytes = avi(chunk("00dc", s0f0) ++ chunk("01dc", s1f0) ++
      chunk("00db", s0f1) ++ chunk("01db", s1f1))
    // default = PRIMARY (lowest stream number present): stream 00 only
    val Some((offs0, lens0)) = Multimodal.indexAviFrames(bytes)
    assert(lens0.toSeq == Seq(2, 2) &&
      offs0.toSeq.map(bytes(_)) == Seq(10.toByte, 11.toByte),
      "default must index exactly the primary stream's frames in order")
    // explicit stream selection reaches the secondary stream
    val Some((offs1, lens1)) = Multimodal.indexAviFrames(bytes, streamId = 1)
    assert(lens1.toSeq == Seq(2, 2) &&
      offs1.toSeq.map(bytes(_)) == Seq(20.toByte, 21.toByte))
    // a stream with no chunks is data, not corruption
    val Some((offs9, _)) = Multimodal.indexAviFrames(bytes, streamId = 9)
    assert(offs9.isEmpty)
    // primary selection when the lowest stream number isn't 0
    val hi = avi(chunk("02dc", s1f0) ++ chunk("05dc", s0f0) ++ chunk("02dc", s1f1))
    val Some((offsHi, _)) = Multimodal.indexAviFrames(hi)
    assert(offsHi.toSeq.map(hi(_)) == Seq(20.toByte, 21.toByte),
      "primary = lowest-numbered stream present, not literally stream 00")
    // the distributed face routes streamId through
    val media = Seq((1L, bytes)).toDF("media_id", "bytes")
    val viaDf = Multimodal.indexAvi(media, "bytes", streamId = 1)
      .select("frame_lengths").head().getSeq[Int](0)
    assert(viaDf == Seq(2, 2))
    intercept[IllegalArgumentException](Multimodal.indexAviFrames(bytes, streamId = 100))
  }

  test("indexAvi: garbage, truncation, and non-AVI RIFF are None (NULL arrays end to end)") {
    assert(Multimodal.indexAviFrames(null).isEmpty)
    assert(Multimodal.indexAviFrames(Array.fill[Byte](24)(7)).isEmpty) // bad magic
    val good = avi(chunk("00dc", Array[Byte](1, 2, 3, 4)))
    assert(Multimodal.indexAviFrames(good.take(good.length - 2)).isEmpty) // truncated chunk
    val wav = ascii("RIFF") ++ le32(4) ++ ascii("WAVE") // RIFF but not AVI
    assert(Multimodal.indexAviFrames(wav).isEmpty)
    val df = Seq((1L, good), (2L, Array.fill[Byte](24)(7))).toDF("media_id", "bytes")
    val out = Multimodal.indexAvi(df, "bytes")
      .collect().map(r => r.getLong(0) -> r.isNullAt(2)).toMap
    assert(!out(1L) && out(2L))
  }

  test("videoNearDupPairs/dedupVideoPerceptual: re-encoded MJPEG copies collapse, distinct footage survives") {
    def frame(seed: Int): java.awt.image.BufferedImage = {
      val img = new java.awt.image.BufferedImage(36, 32,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 32; x <- 0 until 36) {
        val v = (x * 5 + y * 3 + seed * 40) % 180
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      img
    }
    def jpegOf(img: java.awt.image.BufferedImage): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", bos)
      bos.toByteArray
    }
    // RE-ENCODE: decode the jpeg and compress again — every byte differs,
    // the light/dark structure doesn't (the dHash invariance class)
    def reencode(j: Array[Byte]): Array[Byte] = jpegOf(
      javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(j)))
    val fa = Seq(jpegOf(frame(0)), jpegOf(frame(1)), jpegOf(frame(2)))
    val videoA = avi(fa.map(chunk("00dc", _)).reduce(_ ++ _))
    // B: the same footage re-encoded AND re-muxed (audio chunk inserted)
    val videoB = avi(chunk("01wb", Array[Byte](9, 9)) ++
      fa.map(j => chunk("00dc", reencode(j))).reduce(_ ++ _))
    // C: distinct footage
    val videoC = avi(Seq(jpegOf(frame(7)), jpegOf(frame(8)), jpegOf(frame(9)))
      .map(chunk("00dc", _)).reduce(_ ++ _))
    assert(videoA.toSeq != videoB.toSeq, "the copy must differ byte-wise everywhere")
    val media = Seq((1L, videoA, 0.5), (2L, videoB, 0.9), (3L, videoC, 0.4))
      .toDF("media_id", "bytes", "score")
    val pairs = Multimodal.videoNearDupPairs(media, "media_id", "bytes",
        bands = 4, minSharedFrames = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pairs.toSeq == Seq((1L, 2L, 3L)),
      s"A and B share all 3 frames perceptually, C pairs with neither: ${pairs.toSeq}")
    val kept = Multimodal.dedupVideoPerceptual(media, "media_id", "bytes",
        "score", bands = 4, minSharedFrames = 2)
      .select("media_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(2L, 3L), s"keep-best keeps the higher-scored copy: $kept")
  }

  test("MJPEG end to end: demux -> slice -> REAL JPEG decode -> dHash equals direct decode") {
    def jpeg(seed: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(36, 32,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 32; x <- 0 until 36) {
        val v = (x * 7 + y * 13 + seed * 31) % 200
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", bos)
      bos.toByteArray
    }
    val frames = Seq(jpeg(1), jpeg(2), jpeg(3))
    val container = avi(frames.map(chunk("00dc", _)).reduce(_ ++ _))
    val media = Seq((1L, container)).toDF("media_id", "bytes")
    val viaAvi = Multimodal.decodeImage(
        Multimodal.sliceFramesRagged(
          Multimodal.indexAvi(media, "bytes"), "media_id", "bytes",
          "frame_offsets", "frame_lengths")
          .select(col("frame_idx"), col("frame")), "frame")
      .select(col("frame_idx"),
        Multimodal.dHash64(col("gray"), col("width"), col("height")).as("dh"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val direct = frames.zipWithIndex.map { case (j, i) =>
      val df = Seq((i, j)).toDF("i", "jb")
      i -> Multimodal.decodeImage(df, "jb")
        .select(Multimodal.dHash64(col("gray"), col("width"), col("height")))
        .head().getLong(0)
    }.toMap
    assert(viaAvi == direct,
      "a frame demuxed out of the container must decode and hash exactly like the raw JPEG")
    assert(viaAvi.values.toSet.size == 3, "distinct frames must hash distinctly")
  }

  // ---- round 19: stream-table-aware builders for the soundtrack axis ----
  private def le16(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
  private def waveFmt(tag: Int, ch: Int, rate: Int, bits: Int): Array[Byte] =
    le16(tag) ++ le16(ch) ++ le32(rate) ++ le32(rate * ch * bits / 8) ++
      le16(ch * bits / 8) ++ le16(bits)
  private def strl(fcc: String, strf: Option[Array[Byte]]): Array[Byte] =
    list("strl", chunk("strh", ascii(fcc) ++ new Array[Byte](52)) ++
      strf.map(chunk("strf", _)).getOrElse(Array.empty[Byte]))
  /** AVI with a real hdrl stream table (the Nth strl = stream N). */
  private def aviS(strls: Array[Byte], moviChildren: Array[Byte]): Array[Byte] = {
    val hdrl = list("hdrl", chunk("avih", new Array[Byte](56)) ++ strls)
    val movi = list("movi", moviChildren)
    val body = ascii("AVI ") ++ hdrl ++ movi
    ascii("RIFF") ++ le32(body.length) ++ body
  }
  private def pcmBytes(samples: Array[Short]): Array[Byte] =
    samples.flatMap(v => le16(v & 0xffff))
  private def wavOf(tag: Int, ch: Int, rate: Int, bits: Int,
                    data: Array[Byte]): Array[Byte] = {
    val body = ascii("WAVE") ++ chunk("fmt ", waveFmt(tag, ch, rate, bits)) ++
      chunk("data", data)
    ascii("RIFF") ++ le32(body.length) ++ body
  }

  test("extractAviAudioPcm: ##wb spans concatenate across chunks and rec groups, downmix = decodeWav exactly") {
    val samples = Array.tabulate[Short](390)(i => ((i * 37 + 11) % 3001 - 1500).toShort)
    val raw = pcmBytes(samples)
    val (h1, rest) = raw.splitAt(400)
    // audio interleaved with video chunks the way a real muxer lays them
    // out, one span inside a rec group — stream order must be preserved
    val movi = chunk("00dc", Array[Byte](1, 2)) ++ chunk("01wb", h1) ++
      list("rec ", chunk("00dc", Array[Byte](3, 4)) ++ chunk("01wb", rest.take(100))) ++
      chunk("01wb", rest.drop(100))
    val bytes = aviS(strl("vids", None) ++ strl("auds", Some(waveFmt(1, 1, 16000, 16))), movi)
    val Some((rate, ch, n, pcm)) = Multimodal.extractAviAudioPcm(bytes)
    assert((rate, ch, n) == (16000, 1, 390))
    assert(pcm.toSeq == raw.toSeq, "mono 16-bit spans must concatenate byte-exact")
    // STEREO downmix is decodeWav's arithmetic, pinned against the WAV
    // decoder on the identical raw frame data (one mixer, cannot drift)
    val st = Array.tabulate[Short](200)(i =>
      (if (i % 2 == 0) (i * 13 % 701) else -(i * 29 % 997)).toShort)
    val stRaw = pcmBytes(st)
    val aviStereo = aviS(strl("auds", Some(waveFmt(1, 2, 8000, 16))),
      chunk("00wb", stRaw))
    val Some((r2, c2, n2, p2)) = Multimodal.extractAviAudioPcm(aviStereo)
    val Some((rw, cw, nw, pw)) = Multimodal.decodeWav(wavOf(1, 2, 8000, 16, stRaw))
    assert((r2, c2, n2) == (rw, cw, nw) && p2.toSeq == pw.toSeq,
      "AVI soundtrack downmix must equal the WAV decoder on the same frames")
  }

  test("extractAviAudio: stream selection, no-soundtrack NULLs, and the codec boundary") {
    val sA = pcmBytes(Array.tabulate[Short](100)(i => (i * 3).toShort))
    val sB = pcmBytes(Array.tabulate[Short](100)(i => (i * 7 + 1).toShort))
    // streams: 0 = video, 1 + 2 = audio — default must pick stream 1
    val two = aviS(strl("vids", None) ++
      strl("auds", Some(waveFmt(1, 1, 16000, 16))) ++
      strl("auds", Some(waveFmt(1, 1, 22050, 16))),
      chunk("01wb", sA) ++ chunk("02wb", sB))
    assert(Multimodal.extractAviAudioPcm(two).get._4.toSeq == sA.toSeq,
      "primary = lowest-numbered auds stream")
    val viaTwo = Multimodal.extractAviAudioPcm(two, streamId = 2).get
    assert(viaTwo._1 == 22050 && viaTwo._4.toSeq == sB.toSeq)
    // selected stream is VIDEO -> None (not an interleaved guess)
    assert(Multimodal.extractAviAudioPcm(two, streamId = 0).isEmpty)
    // no audio stream at all -> None (no soundtrack, never pairs)
    assert(Multimodal.extractAviAudioPcm(
      aviS(strl("vids", None), chunk("00dc", Array[Byte](1, 2)))).isEmpty)
    // legacy header without a stream table -> None (untyped streams)
    assert(Multimodal.extractAviAudioPcm(
      avi(chunk("01wb", sA))).isEmpty)
    // compressed audio (MP3 tag 0x55) is the codec boundary -> None
    assert(Multimodal.extractAviAudioPcm(
      aviS(strl("auds", Some(waveFmt(0x55, 1, 16000, 16))),
        chunk("00wb", sA))).isEmpty)
    // a PCM stream with zero wb chunks is DATA: 0 samples, not NULL
    val silent = Multimodal.extractAviAudioPcm(
      aviS(strl("auds", Some(waveFmt(1, 1, 16000, 16))), Array.empty[Byte])).get
    assert(silent._3 == 0 && silent._4.isEmpty)
    // truncation -> None
    val good = aviS(strl("auds", Some(waveFmt(1, 1, 16000, 16))), chunk("00wb", sA))
    assert(Multimodal.extractAviAudioPcm(good.take(good.length - 3)).isEmpty)
    intercept[IllegalArgumentException](Multimodal.extractAviAudioPcm(good, streamId = 100))
    // the distributed face: NULL columns for undecodable rows
    val df = Seq((1L, good), (2L, Array.fill[Byte](30)(9))).toDF("media_id", "bytes")
    val out = Multimodal.extractAviAudio(df, "bytes")
      .collect().map(r => r.getLong(0) -> r.isNullAt(5)).toMap
    assert(!out(1L) && out(2L))
  }

  test("soundtrack axis: a re-encoded render with ZERO shared frames collapses by audio; the frame axis provably misses") {
    def noiseJpeg(seed: Long): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(36, 32,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      var h = seed
      for (y <- 0 until 32; x <- 0 until 36) {
        h = h * 6364136223846793005L + 1442695040888963407L
        val v = ((h >>> 33) % 256).toInt
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", bos)
      bos.toByteArray
    }
    val track = pcmBytes(Array.tabulate[Short](390)(i => ((i * 53 + 7) % 2801 - 1400).toShort))
    val other = pcmBytes(Array.tabulate[Short](390)(i => ((i * 91 + 3) % 2731 - 1365).toShort))
    def video(frameSeed: Long, pcm: Array[Byte]): Array[Byte] =
      aviS(strl("vids", None) ++ strl("auds", Some(waveFmt(1, 1, 16000, 16))),
        chunk("00dc", noiseJpeg(frameSeed)) ++ chunk("01wb", pcm) ++
          chunk("00dc", noiseJpeg(frameSeed * 31 + 5)))
    // A and B: the SAME soundtrack under entirely different renders
    // (independent noise frames — no frame pair survives any Hamming 3)
    val media = Seq((1L, video(100L, track), 0.5), (2L, video(200L, track), 0.9),
      (3L, video(300L, other), 0.7)).toDF("media_id", "bytes", "score")
    // re-judge tripwire: the frame axis MUST miss the different-render
    // copy (if this starts passing, the soundtrack axis is redundant)
    val frameAxis = Multimodal.videoNearDupPairs(media, "media_id", "bytes",
      bands = 4, minSharedFrames = 1).count()
    assert(frameAxis == 0,
      "frame axis caught a different-render copy — soundtrack axis redundant; re-judge")
    val pairs = Multimodal.videoSoundtrackNearDupPairs(media, "media_id", "bytes",
        windowSamples = 130, hopSamples = 130, bands = 4, maxHamming = 0,
        minSharedSegments = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pairs.toSeq == Seq((1L, 2L, 3L)),
      s"same soundtrack must share all 3 windows: ${pairs.toSeq}")
    val kept = Multimodal.dedupVideoBySoundtrack(media, "media_id", "bytes",
        "score", windowSamples = 130, hopSamples = 130, bands = 4,
        maxHamming = 0, minSharedSegments = 2)
      .select("media_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(2L, 3L), s"keep-best keeps the higher-scored render: $kept")
  }

  test("soundtrack axis + targetRate: a 2:1-rate soundtrack re-render collapses only when normalized") {
    // the SAME soundtrack muxed at 16 kHz and, in the copy, at 8 kHz —
    // the 8 kHz samples are the test-local box-filter downsample (the
    // AudioSpec construction behind a container wall)
    val base16 = Array.tabulate[Short](780)(i => ((i * 53 + 7) % 163 - 81).toShort)
    val copy8 = Array.tabulate[Short](390) { g =>
      Math.floorDiv(base16(2 * g) + base16(2 * g + 1) + 1, 2).toShort
    }
    def video(rate: Int, pcm: Array[Byte]): Array[Byte] =
      aviS(strl("vids", None) ++ strl("auds", Some(waveFmt(1, 1, rate, 16))),
        chunk("00dc", Array[Byte](1, 2)) ++ chunk("01wb", pcm))
    val media = Seq((1L, video(16000, pcmBytes(base16)), 0.9),
      (2L, video(8000, pcmBytes(copy8)), 0.5)).toDF("media_id", "bytes", "score")
    // un-normalized: the window grids differ — no pair (re-judge tripwire)
    assert(Multimodal.videoSoundtrackNearDupPairs(media, "media_id", "bytes",
      windowSamples = 130, hopSamples = 130, bands = 4, maxHamming = 0,
      minSharedSegments = 2).count() == 0,
      "a rate re-render must NOT collapse without normalization — re-judge")
    // normalized to the pipeline rate: all 3 windows realign
    val pairs = Multimodal.videoSoundtrackNearDupPairs(media, "media_id", "bytes",
        windowSamples = 130, hopSamples = 130, bands = 4, maxHamming = 0,
        minSharedSegments = 2, targetRate = 8000)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pairs.toSeq == Seq((1L, 2L, 3L)), s"got: ${pairs.toSeq}")
    val kept = Multimodal.dedupVideoBySoundtrack(media, "media_id", "bytes",
        "score", windowSamples = 130, hopSamples = 130, bands = 4,
        maxHamming = 0, minSharedSegments = 2, targetRate = 8000)
      .select("media_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L), s"keep-best must keep the 16 kHz master: $kept")
  }

  test("tile axis: a CROPPED+re-encoded+re-dubbed copy collapses; frame AND soundtrack axes provably miss") {
    // PNG frames (lossless) so the cropped pixels are byte-exact — the
    // crop copy class, not the compression-noise class (qm8 owns that)
    def noisePixels(seed: Long): Array[Array[Int]] = {
      var h = seed
      Array.tabulate(32, 36) { (_, _) =>
        h = h * 6364136223846793005L + 1442695040888963407L
        ((h >>> 33) % 256).toInt
      }
    }
    def pngOf(px: Array[Array[Int]], y0: Int, hh: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(36, hh,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until hh; x <- 0 until 36) {
        val v = px(y0 + y)(x)
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val fr = Seq(noisePixels(11L), noisePixels(22L))
    val trackA = pcmBytes(Array.tabulate[Short](390)(i => ((i * 53 + 7) % 2801 - 1400).toShort))
    val trackB = pcmBytes(Array.tabulate[Short](390)(i => ((i * 91 + 3) % 2731 - 1365).toShort))
    def video(frames: Seq[Array[Byte]], pcm: Array[Byte]): Array[Byte] =
      aviS(strl("vids", None) ++ strl("auds", Some(waveFmt(1, 1, 16000, 16))),
        frames.map(chunk("00dc", _)).reduce(_ ++ _) ++ chunk("01wb", pcm))
    // A: the master. B: every frame CROPPED to its bottom half (36x16,
    // tile-grid aligned), re-encoded, and re-dubbed with a different
    // soundtrack. C: distinct footage.
    val videoA = video(fr.map(pngOf(_, 0, 32)), trackA)
    val videoB = video(fr.map(pngOf(_, 16, 16)), trackB)
    val videoC = video(Seq(pngOf(noisePixels(33L), 0, 32), pngOf(noisePixels(44L), 0, 32)), trackA)
    val media = Seq((1L, videoA, 0.9), (2L, videoB, 0.5), (3L, videoC, 0.7))
      .toDF("media_id", "bytes", "score")
    // re-judge tripwires: BOTH existing video axes must miss the crop
    // (if either starts passing, the tile axis is redundant)
    assert(Multimodal.videoNearDupPairs(media, "media_id", "bytes",
      bands = 4, minSharedFrames = 1).count() == 0,
      "whole-frame axis caught a cropped copy — tile axis redundant; re-judge")
    assert(Multimodal.videoSoundtrackNearDupPairs(media, "media_id", "bytes",
      windowSamples = 130, hopSamples = 130, bands = 4, maxHamming = 0,
      minSharedSegments = 1)
      .filter(col("doc_a") === 1L && col("doc_b") === 2L).count() == 0,
      "soundtrack axis caught a re-dubbed copy — tile axis redundant; re-judge")
    // the tile axis closes it: per frame, the crop's 2 tiles ARE the
    // master's bottom tile row — 4 distinct (frame, tile) matches
    val pairs = Multimodal.videoNearDupPairsByTiles(media, "media_id", "bytes",
        tileW = 18, tileH = 16, bands = 4, maxHamming = 0, minSharedTiles = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pairs.toSeq == Seq((1L, 2L, 4L)),
      s"cropped copy must share its 4 surviving (frame, tile) blocks: ${pairs.toSeq}")
    val kept = Multimodal.dedupVideoByTiles(media, "media_id", "bytes", "score",
        tileW = 18, tileH = 16, bands = 4, maxHamming = 0, minSharedTiles = 2)
      .select("media_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 3L), s"keep-best must keep the higher-scored master: $kept")
    // STRIDED tiles reach the video axis (the qm13 story per frame): an
    // OFF-GRID crop (y-offset 8, inside the first tile row) never
    // realigns on the default grid but collapses at hop 9x8
    val videoOff = video(fr.map(pngOf(_, 8, 16)), trackB)
    val mediaOff = Seq((1L, videoA, 0.9), (4L, videoOff, 0.5))
      .toDF("media_id", "bytes", "score")
    assert(Multimodal.videoNearDupPairsByTiles(mediaOff, "media_id", "bytes",
      tileW = 18, tileH = 16, bands = 4, maxHamming = 0, minSharedTiles = 2)
      .count() == 0,
      "default grid caught an off-grid crop — strided tiles redundant; re-judge")
    val strided = Multimodal.videoNearDupPairsByTiles(mediaOff, "media_id", "bytes",
        tileW = 18, tileH = 16, bands = 4, maxHamming = 0, minSharedTiles = 2,
        tileHopW = 9, tileHopH = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(strided.toSeq == Seq((1L, 4L)),
      s"hop 9x8 must realign the off-grid crop: ${strided.toSeq}")
  }
}
