package graft.sources

import graft.core._
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column support: image/audio/video as opaque `BINARY` columns
  * with typed metadata, plus decode / feature-extract / resize /
  * frame-sample plumbing.
  *
  * The actual codec step is a STUB (media libraries are not in this
  * environment): `decodeStub` produces a deterministic fake feature vector
  * from the bytes. Everything around it — schema, batching via
  * `mapPartitions`, partition sizing, typed row classes — is the real
  * production shape: swap `fakeDecode` for an FFI call and nothing else
  * changes.
  *
  * Scale notes: media rows are large; `repartitionByBytes` targets a fixed
  * number of bytes per task so executors neither starve (1 huge row) nor
  * thrash (10⁶ tiny ones); decode happens once per partition iterator with
  * per-batch amortized codec setup.
  */
object Multimodal {

  /** Canonical multimodal schema. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("media_type", StringType, nullable = false), // image|audio|video
    StructField("bytes", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("sample_rate", IntegerType),
      StructField("duration_ms", LongType),
      StructField("format", StringType)
    )))
  ))

  final case class MediaMeta(width: Int, height: Int, sample_rate: Int,
                             duration_ms: Long, format: String)
  final case class MediaRow(media_id: Long, media_type: String,
                            bytes: Array[Byte], meta: MediaMeta)
  final case class MediaFeatures(media_id: Long, media_type: String,
                                 n_bytes: Long, features: Array[Float])

  /** Deterministic synthetic media table (for tests/demos — the real
    * pipeline reads parquet/binaryFile with the same schema).
    */
  def syntheticMedia(spark: SparkSession, n: Int): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(n.toLong).map { i =>
      val rnd = new scala.util.Random(42 + i)
      val bytes = Array.fill[Byte](64 + (i % 128).toInt)(rnd.nextInt(256).toByte)
      val kind = Seq("image", "audio", "video")((i % 3).toInt)
      MediaRow(i, kind, bytes, MediaMeta(640, 480, 16000, 1000L + i, "fake"))
    }
  }

  /** STUB decode: a real implementation calls the codec here (JNI/FFI or
    * subprocess). The fake derives `dim` floats deterministically from the
    * byte content so downstream feature plumbing is fully testable.
    */
  private def fakeDecode(bytes: Array[Byte], dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    var h = 1125899906842597L // FNV-ish seed
    var i = 0
    while (i < bytes.length) { h = h * 31 + bytes(i); i += 1 }
    var d = 0
    while (d < dim) {
      h = h * 6364136223846793005L + 1442695040888963407L
      out(d) = ((h >>> 11).toDouble / (1L << 53).toDouble).toFloat
      d += 1
    }
    out
  }

  /** Feature extraction over partitions: one iterator pass per partition,
    * codec state amortized per partition (the `mapPartitions` shape that a
    * real decoder needs).
    */
  def extractFeatures(media: Dataset[MediaRow], dim: Int = 16): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition codec init would go here (STUB: none needed)
      rows.map { r =>
        MediaFeatures(r.media_id, r.media_type, r.bytes.length.toLong,
          fakeDecode(r.bytes, dim))
      }
    }
  }

  /** Byte-aware repartitioning: pack rows into partitions of
    * ~`targetBytesPerTask` bytes using the binary column's length (media
    * rows are wildly skewed; row count is the wrong unit at 100 TB).
    *
    * `repartition(n)` deals rows round-robin by COUNT, so a partition
    * holding one 2 GB video plus its share of small rows blows any byte
    * target. Instead:
    *  - rows ≥ target get a partition EACH (they cannot be split);
    *  - smaller rows are packed by global cumulative byte offset, so every
    *    small partition holds < target + one row < 2× target bytes.
    *
    * Cost: one lightweight stats pass (per-input-partition byte subtotals,
    * one tiny row per partition to the driver) + the placement shuffle —
    * same two passes as a count-based repartition, no global sort, no
    * driver materialization of data. This is the rare genuinely
    * imperative-per-partition case where the RDD API is the right tool
    * (an exact partition index cannot be expressed as a hash/range key).
    */
  def repartitionByBytes(df: DataFrame, bytesCol: String, targetBytesPerTask: Long): DataFrame = {
    val target = math.max(1L, targetBytesPerTask)
    val spark = df.sparkSession
    val sized = df.withColumn("_sz", coalesce(length(col(bytesCol)).cast("long"), lit(0L)))
    val szIdx = sized.schema.fieldIndex("_sz")

    // stats pass: per input partition, bytes held in small rows + count of
    // oversized rows (driver receives one tuple per partition)
    val stats = sized.rdd.mapPartitionsWithIndex { (pid, it) =>
      var smallBytes = 0L
      var bigCount = 0L
      it.foreach { r =>
        val sz = r.getLong(szIdx)
        if (sz >= target) bigCount += 1 else smallBytes += sz
      }
      Iterator((pid, smallBytes, bigCount))
    }.collect().sortBy(_._1)

    val totalSmall = stats.map(_._2).sum
    val totalBig = stats.map(_._3).sum
    val smallParts = math.max(1, math.ceil(totalSmall.toDouble / target).toInt)
    val numParts = smallParts + totalBig.toInt
    // prefix offsets so each input partition knows its global starting
    // position among small bytes / big rows
    val smallOffset = stats.map(_._2).scanLeft(0L)(_ + _)
    val bigOffset = stats.map(_._3).scanLeft(0L)(_ + _)

    val keyed = sized.rdd.mapPartitionsWithIndex { (pid, it) =>
      var smallSeen = smallOffset(pid)
      var bigSeen = bigOffset(pid)
      it.map { r =>
        val sz = r.getLong(szIdx)
        val part =
          if (sz >= target) { val p = smallParts + bigSeen.toInt; bigSeen += 1; p }
          else {
            val p = math.min(smallParts - 1L, smallSeen / target).toInt
            smallSeen += sz
            p
          }
        (part, r)
      }
    }
    val parted = keyed
      .partitionBy(new org.apache.spark.Partitioner {
        override def numPartitions: Int = numParts
        override def getPartition(key: Any): Int = key.asInstanceOf[Int]
      })
      .map(_._2)
    spark.createDataFrame(parted, sized.schema).drop("_sz")
  }

  /** Ingest raw media files as binary rows — Spark's `binaryFile` source
    * yields (path, modificationTime, length, content); renamed to the
    * canonical `bytes` column so the decode/feature stages apply directly.
    * Files larger than `spark.sql.sources.binaryFile.maxLength` fail the
    * scan; chunk oversized media upstream.
    */
  def readBinaryFiles(spark: SparkSession, path: String,
                      glob: String = "*"): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(path)
      .select(col("path"), col("length"), col("content").as("bytes"),
        col("modificationTime"))

  /** Decode REAL image bytes (PNG/JPEG/BMP/GIF — whatever the JDK's
    * `javax.imageio` registry reads) to the row-major 8-bit grayscale
    * grid [[dHash64]] consumes — the codec boundary made real for the
    * image modality (the class doc's "swap the stub for the codec call"
    * point, exercised end-to-end; audio/video codecs remain the
    * documented external boundary). Appends (`widthCol` INT,
    * `heightCol` INT, `grayCol` BINARY) to the input row; undecodable
    * bytes (truncated file, unknown format, NULL) yield NULL in all
    * three — the [[graft.functions.DHash64]] filterable-NULL contract,
    * so one corrupt blob can never kill a 100 TB ingest.
    *
    * Grayscale conversion is ENGINE-OWNED integer luma
    * (`(299·R + 587·G + 114·B + 500) / 1000`, the ITU-R 601 weights) —
    * deterministic across JDKs, unlike `Graphics2D`-drawn
    * `TYPE_BYTE_GRAY` conversion which routes through an ICC colorspace.
    * Images that are ALREADY single-channel skip conversion entirely and
    * take raw raster samples (a gray PNG round-trips byte-exact —
    * spec-pinned against hand-written fixture pixels).
    *
    * Scale shape: decode runs inside `mapPartitions` (one iterator pass,
    * per-partition codec init amortized — the [[extractFeatures]]
    * boundary), media bytes never ride an Exchange, and the output is a
    * scan-side projection; pair with [[repartitionByBytes]] upstream so
    * skewed blobs don't starve tasks.
    */
  def decodeImage(df: DataFrame, bytesCol: String,
                  widthCol: String = "width", heightCol: String = "height",
                  grayCol: String = "gray"): DataFrame = {
    val clash = Seq(widthCol, heightCol, grayCol).filter(df.columns.contains)
    require(clash.isEmpty,
      s"decodeImage output column(s) ${clash.mkString(", ")} already exist — rename or drop them first")
    val outSchema = df.schema
      .add(widthCol, IntegerType).add(heightCol, IntegerType).add(grayCol, BinaryType)
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    val idx = df.schema.fieldIndex(bytesCol)
    df.mapPartitions { rows =>
      // per-partition codec init would go here (ImageIO is stateless);
      // disk-backed ImageIO caches would thrash executor-local disks
      javax.imageio.ImageIO.setUseCache(false)
      rows.map { r =>
        decodeToGray(r.getAs[Array[Byte]](idx)) match {
          case Some((w, h, g)) =>
            org.apache.spark.sql.Row.fromSeq(r.toSeq ++ Seq(w, h, g))
          case None =>
            org.apache.spark.sql.Row.fromSeq(r.toSeq ++ Seq(null, null, null))
        }
      }
    }(enc)
  }

  /** The per-blob decode [[decodeImage]] distributes: bytes → (width,
    * height, row-major 8-bit luma grid), None when unreadable. Exposed
    * for tests and driver-side probes.
    */
  def decodeToGray(bytes: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
    if (bytes == null || bytes.isEmpty) return None
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      catch { case scala.util.control.NonFatal(_) => null }
    if (img == null) return None
    val w = img.getWidth
    val h = img.getHeight
    if (w <= 0 || h <= 0 || w.toLong * h > Int.MaxValue) return None
    val gray = new Array[Byte](w * h)
    if (img.getColorModel.getNumComponents == 1) {
      // single-channel: raw samples — no ICC gray→sRGB surprise. Samples
      // are rescaled to 8 bits by the bit depth (a 16-bit gray PNG's
      // 0–65535 range maps linearly to 0–255); a bare .toByte would keep
      // only the low byte and invert luma ordering — wrong-but-non-NULL,
      // the exact failure the NULL contract exists to avoid
      val raster = img.getRaster
      val bits = raster.getSampleModel.getSampleSize(0)
      if (bits <= 0 || bits > 31) return None
      val maxVal = (1L << bits) - 1L
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val s = raster.getSample(x, y, 0).toLong
          gray(y * w + x) =
            if (bits == 8) s.toByte
            else ((s * 255L + maxVal / 2) / maxVal).toByte
          x += 1
        }
        y += 1
      }
    } else {
      val argb = img.getRGB(0, 0, w, h, null, 0, w)
      var i = 0
      while (i < argb.length) {
        val p = argb(i)
        val r = (p >>> 16) & 0xff
        val g = (p >>> 8) & 0xff
        val b = p & 0xff
        gray(i) = ((299 * r + 587 * g + 114 * b + 500) / 1000).toByte
        i += 1
      }
    }
    Some((w, h, gray))
  }

  /** Decode REAL WAV (RIFF/PCM) bytes to canonical mono 16-bit LE
    * samples — the AUDIO half of the codec boundary made real (round
    * 17): PCM needs no external codec library, exactly as PNG needed
    * none for images in round 16 — RIFF chunk walking, sign extension,
    * and channel mixing are plain integer work. Appends (`rateCol` INT,
    * `channelsCol` INT, `nSamplesCol` INT, `pcmCol` BINARY — mono-mixed
    * 16-bit LE) to the input row; undecodable bytes (bad magic,
    * truncated chunks, non-PCM format codes, unsupported bit depths)
    * yield NULL in all four — the [[decodeImage]] filterable-NULL
    * contract. Compressed codecs (MP3/AAC/Opus) remain the documented
    * external boundary; a real pipeline transcodes to PCM upstream and
    * this is the shape it lands in.
    *
    * Supported on the wire: PCM format 1, 8-bit unsigned or 16-bit
    * signed, any channel count (channels mix by integer average — the
    * standard mono downmix, deterministic); `fmt`/`data` chunks in any
    * order with word-aligned skipping of foreign chunks (LIST, fact…).
    *
    * Scale shape: decode runs inside `mapPartitions` (the
    * [[extractFeatures]] codec boundary), audio bytes never ride an
    * Exchange, and the output feeds [[graft.functions.AudioHash64]] →
    * [[perceptualNearDupPairs]] exactly like the image path.
    */
  def decodeWavPcm(df: DataFrame, bytesCol: String,
                   rateCol: String = "sample_rate",
                   channelsCol: String = "channels",
                   nSamplesCol: String = "n_samples",
                   pcmCol: String = "pcm"): DataFrame = {
    val clash = Seq(rateCol, channelsCol, nSamplesCol, pcmCol)
      .filter(df.columns.contains)
    require(clash.isEmpty,
      s"decodeWavPcm output column(s) ${clash.mkString(", ")} already exist — rename or drop them first")
    val outSchema = df.schema
      .add(rateCol, IntegerType).add(channelsCol, IntegerType)
      .add(nSamplesCol, IntegerType).add(pcmCol, BinaryType)
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    val idx = df.schema.fieldIndex(bytesCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        decodeWav(r.getAs[Array[Byte]](idx)) match {
          case Some((rate, ch, n, pcm)) =>
            org.apache.spark.sql.Row.fromSeq(r.toSeq ++ Seq(rate, ch, n, pcm))
          case None =>
            org.apache.spark.sql.Row.fromSeq(r.toSeq ++ Seq(null, null, null, null))
        }
      }
    }(enc)
  }

  /** The per-blob parse [[decodeWavPcm]] distributes: RIFF/WAVE bytes →
    * (sample_rate, channels, n_samples, mono 16-bit LE pcm), None when
    * unreadable. Exposed for tests and driver-side probes.
    */
  def decodeWav(bytes: Array[Byte]): Option[(Int, Int, Int, Array[Byte])] = {
    if (bytes == null || bytes.length < 44) return None
    def u32(o: Int): Long = (bytes(o) & 0xffL) | ((bytes(o + 1) & 0xffL) << 8) |
      ((bytes(o + 2) & 0xffL) << 16) | ((bytes(o + 3) & 0xffL) << 24)
    def u16(o: Int): Int = (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8)
    def tag(o: Int): String =
      new String(bytes, o, 4, java.nio.charset.StandardCharsets.US_ASCII)
    if (tag(0) != "RIFF" || tag(8) != "WAVE") return None
    var off = 12
    var fmt: Option[(Int, Int, Int)] = None // (channels, rate, bits)
    var data: Option[(Int, Int)] = None // (offset, len)
    while (off + 8 <= bytes.length) {
      val id = tag(off)
      val sz = u32(off + 4)
      if (sz < 0 || off + 8 + sz > bytes.length) return None // truncated chunk
      if (id == "fmt ") {
        if (sz < 16) return None
        if (u16(off + 8) != 1) return None // PCM only; compressed = codec boundary
        fmt = Some((u16(off + 10), u32(off + 12).toInt, u16(off + 22)))
      } else if (id == "data" && data.isEmpty) data = Some((off + 8, sz.toInt))
      off += 8 + sz.toInt + (sz.toInt & 1) // chunks are word-aligned
    }
    (fmt, data) match {
      case (Some((ch, rate, bits)), Some((doff, dlen)))
          if ch >= 1 && rate > 0 && (bits == 16 || bits == 8) =>
        val bytesPerSample = bits / 8
        val frameBytes = ch * bytesPerSample
        val n = dlen / frameBytes // a trailing partial frame is dropped
        if (n.toLong * 2 > Int.MaxValue) return None
        val out = new Array[Byte](n * 2)
        var i = 0
        while (i < n) {
          // mono downmix: integer average across channels; 8-bit PCM is
          // unsigned around 128 and widens to the 16-bit lattice
          var acc = 0L
          var c = 0
          while (c < ch) {
            val so = doff + i * frameBytes + c * bytesPerSample
            val s =
              if (bits == 16) ((bytes(so + 1) << 8) | (bytes(so) & 0xff)).toShort.toInt
              else ((bytes(so) & 0xff) - 128) << 8
            acc += s
            c += 1
          }
          val m = (acc / ch).toInt
          out(2 * i) = (m & 0xff).toByte
          out(2 * i + 1) = ((m >> 8) & 0xff).toByte
          i += 1
        }
        Some((rate, ch, n, out))
      case _ => None
    }
  }

  /** Index the frame spans of a REAL AVI container (RIFF/AVI `movi`
    * chunks) — the VIDEO container made real without any codec (round
    * 17): demuxing is plain RIFF work, and an MJPEG AVI's frame payloads
    * are ordinary JPEGs that [[decodeImage]] already decodes, so the
    * full chain container → ragged spans → [[sliceFramesRagged]] →
    * per-frame [[decodeImage]] → [[dHash64]] is real end to end for
    * MJPEG (spec-pinned); inter-frame codecs (H.264…) remain the
    * documented external boundary.
    *
    * Appends (`offsetsCol` ARRAY<INT>, `lengthsCol` ARRAY<INT>) — the
    * exact input shape [[sliceFramesRagged]] consumes — indexing every
    * video stream chunk (`##dc` compressed / `##db` uncompressed DIB,
    * any stream number) inside `LIST movi`, including nested `LIST
    * rec ` groups, with word-aligned skipping of audio (`##wb`) and
    * foreign chunks. Non-AVI, truncated, or chunk-corrupt bytes yield
    * NULL arrays — the [[decodeWavPcm]] filterable-NULL contract. A
    * valid AVI with an empty `movi` yields empty arrays (no frames is
    * data, not corruption).
    */
  def indexAvi(df: DataFrame, bytesCol: String,
               offsetsCol: String = "frame_offsets",
               lengthsCol: String = "frame_lengths"): DataFrame = {
    val clash = Seq(offsetsCol, lengthsCol).filter(df.columns.contains)
    require(clash.isEmpty,
      s"indexAvi output column(s) ${clash.mkString(", ")} already exist — rename or drop them first")
    val outSchema = df.schema
      .add(offsetsCol, ArrayType(IntegerType)).add(lengthsCol, ArrayType(IntegerType))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    val idx = df.schema.fieldIndex(bytesCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        indexAviFrames(r.getAs[Array[Byte]](idx)) match {
          case Some((offs, lens)) =>
            org.apache.spark.sql.Row.fromSeq(r.toSeq ++ Seq(offs.toSeq, lens.toSeq))
          case None =>
            org.apache.spark.sql.Row.fromSeq(r.toSeq ++ Seq(null, null))
        }
      }
    }(enc)
  }

  /** The per-blob demux [[indexAvi]] distributes: AVI bytes →
    * (payload offsets, payload lengths) of every video frame chunk in
    * stream order, None when unreadable. Exposed for tests and
    * driver-side probes.
    */
  def indexAviFrames(bytes: Array[Byte]): Option[(Array[Int], Array[Int])] = {
    if (bytes == null || bytes.length < 12) return None
    def u32(o: Int): Long = (bytes(o) & 0xffL) | ((bytes(o + 1) & 0xffL) << 8) |
      ((bytes(o + 2) & 0xffL) << 16) | ((bytes(o + 3) & 0xffL) << 24)
    def tag(o: Int): String =
      new String(bytes, o, 4, java.nio.charset.StandardCharsets.US_ASCII)
    if (tag(0) != "RIFF" || tag(8) != "AVI ") return None
    val riffEnd = math.min(bytes.length.toLong, 8L + u32(4))
    val offs = scala.collection.mutable.ArrayBuffer.empty[Int]
    val lens = scala.collection.mutable.ArrayBuffer.empty[Int]
    def isVideoChunk(id: String): Boolean =
      id.length == 4 && id(0).isDigit && id(1).isDigit &&
        (id.substring(2) == "db" || id.substring(2) == "dc")
    // walk a chunk run in [from, end); collect inside movi/rec lists
    def walk(from: Long, end: Long, inMovi: Boolean): Boolean = {
      var off = from
      while (off + 8 <= end) {
        val id = tag(off.toInt)
        val sz = u32(off.toInt + 4)
        if (off + 8 + sz > end) return false // truncated chunk
        if (id == "LIST") {
          if (sz < 4) return false
          val listType = tag(off.toInt + 8)
          val descend = listType == "movi" || listType == "rec "
          // hdrl/strl/odml lists hold metadata this indexer doesn't need;
          // only movi (and its rec groups) carry frame chunks
          if (descend && !walk(off + 12, off + 8 + sz, inMovi = true)) return false
        } else if (inMovi && isVideoChunk(id)) {
          offs += (off + 8).toInt
          lens += sz.toInt
        }
        off += 8 + sz + (sz & 1) // word-aligned
      }
      true
    }
    if (!walk(12, riffEnd, inMovi = false)) return None
    Some((offs.toArray, lens.toArray))
  }

  /** Per-frame perceptual hashes of an AVI video corpus: [[indexAvi]] →
    * [[sliceFramesRagged]] (sampled at `everyK`, capped at `maxFrames`)
    * → [[decodeImage]] → [[dHash64]]. Output: (idCol, frame_idx,
    * dhash LONG); frames whose payload doesn't decode (inter-frame
    * codecs, corrupt chunks) drop — for MJPEG every frame is a plain
    * JPEG and decodes (the AviSpec end-to-end pin). The video analog of
    * hashing every sampled still.
    */
  def videoFrameHashes(media: DataFrame, idCol: String, bytesCol: String,
                       everyK: Int = 1,
                       maxFrames: Int = Int.MaxValue): DataFrame = {
    val indexed = indexAvi(media.select(col(idCol), col(bytesCol)), bytesCol,
      offsetsCol = "_vfh_off", lengthsCol = "_vfh_len")
    val frames = sliceFramesRagged(indexed, idCol, bytesCol,
      "_vfh_off", "_vfh_len", everyK, maxFrames)
    val decoded = decodeImage(
      frames.select(col(idCol), col("frame_idx"), col("frame")), "frame",
      widthCol = "_dec_w", heightCol = "_dec_h", grayCol = "_dec_gray")
    decoded.select(col(idCol), col("frame_idx"),
        dHash64(col("_dec_gray"), col("_dec_w"), col("_dec_h")).as("dhash"))
      .filter(col("dhash").isNotNull)
  }

  /** Video near-dup pairs by SHARED PERCEPTUAL FRAMES — the standard
    * frame-sampling recipe: two videos are near-duplicates when at least
    * `minSharedFrames` of their sampled frames match perceptually
    * (banded Hamming ≤ `maxHamming` on the per-frame [[dHash64]]). A
    * re-muxed, re-encoded, or re-leveled copy of the same footage shares
    * its frame structure even though every container byte differs.
    * Output: (doc_a, doc_b, shared_frames) with doc_a < doc_b, where
    * shared_frames counts DISTINCT matched (frame_a, frame_b) pairs.
    *
    * Scale: only narrow (video, frame, hash) rows enter the banded
    * self-join — video bytes never shuffle (decode runs once inside the
    * pair stage's reused Exchange, the [[perceptualNearDupPairs]]
    * argument); frames of the SAME video never pair (`doc_a < doc_b` is
    * video-level); the per-pair agg is bounded by the sampled frame cap.
    * `bands = 0` derives the band count from the VIDEO count (`corpusSize`
    * skips the count) — frame multiplicity is bounded by `maxFrames` and
    * the pigeonhole clamp keeps the Hamming-recall guarantee regardless
    * of the estimate, so band sizing only tunes collision noise.
    */
  def videoNearDupPairs(media: DataFrame, idCol: String, bytesCol: String,
                        everyK: Int = 1, maxFrames: Int = 32,
                        bands: Int = 0, maxHamming: Int = 3,
                        minSharedFrames: Int = 1,
                        corpusSize: Option[Long] = None): DataFrame = {
    require(minSharedFrames >= 1, s"minSharedFrames must be >= 1, got $minSharedFrames")
    val b0 =
      if (bands == 0) {
        val sizeBound = math.max(
          corpusSize.getOrElse(media.select(col(idCol)).count()), 1L)
        val derived = graft.llm.Dedup.autoBands(sizeBound)
        val floor = Seq(1, 2, 4, 8, 16, 32, 64).find(_ >= maxHamming + 1)
          .getOrElse(64)
        math.max(derived, floor)
      } else bands
    require(b0 > 0 && 64 % b0 == 0, s"bands must divide 64, got $b0")
    require(maxHamming >= 0, s"maxHamming must be >= 0, got $maxHamming")
    val width = 64 / b0
    val mask = if (width == 64) lit(-1L) else lit((1L << width) - 1)
    val fh = videoFrameHashes(media, idCol, bytesCol, everyK, maxFrames)
    videoNearDupPairsFromHashes(fh, idCol, b0, maxHamming, minSharedFrames)
  }

  /** The banding + frame-pairing half of [[videoNearDupPairs]] over ANY
    * (idCol, frame_idx, dhash) frame-hash frame — the raw-DIB path
    * (`##db` frames hashed directly via [[dHash64]], no image codec) and
    * custom samplers feed this. `bands` must be explicit here (callers
    * own the sizing — this function can't see the raw corpus).
    */
  def videoNearDupPairsFromHashes(frameHashes: DataFrame, idCol: String,
                                  bands: Int, maxHamming: Int = 3,
                                  minSharedFrames: Int = 1): DataFrame = {
    require(bands > 0 && 64 % bands == 0, s"bands must divide 64, got $bands")
    require(maxHamming >= 0, s"maxHamming must be >= 0, got $maxHamming")
    require(minSharedFrames >= 1, s"minSharedFrames must be >= 1, got $minSharedFrames")
    val width = 64 / bands
    val mask = if (width == 64) lit(-1L) else lit((1L << width) - 1)
    val fh = frameHashes
      .select(col(idCol).as("vid"), col("frame_idx").as("fidx"), col("dhash").as("h"))
      .filter(col("h").isNotNull)
    val banded = fh.select(col("vid"), col("fidx"), col("h"),
      posexplode(array((0 until bands).map(b =>
        shiftrightunsigned(col("h"), b * width).bitwiseAND(mask)): _*)))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bh")
    val a = banded.hint("shuffle_hash").as("a")
    val b = banded.hint("shuffle_hash").as("b")
    a.join(b, col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
        col("a.vid") < col("b.vid"))
      .select(col("a.vid").as("doc_a"), col("b.vid").as("doc_b"),
        col("a.fidx").as("frame_a"), col("b.fidx").as("frame_b"),
        bit_count(col("a.h").bitwiseXOR(col("b.h"))).cast("int").as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .dropDuplicates("doc_a", "doc_b", "frame_a", "frame_b")
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("shared_frames"))
      .filter(col("shared_frames") >= minSharedFrames)
  }

  /** One-call perceptual video dedup: [[videoNearDupPairs]] → keep-best
    * ([[graft.llm.Dedup.dedupKeepBest]]) — the media-dedup entry for the
    * video modality, same contracts as the image/audio one-calls:
    * survivors join back to the RAW media, videos with no decodable
    * frames survive untouched (no hash rows, never pair).
    */
  def dedupVideoPerceptual(media: DataFrame, idCol: String, bytesCol: String,
                           scoreCol: String, everyK: Int = 1,
                           maxFrames: Int = 32, bands: Int = 0,
                           maxHamming: Int = 3, minSharedFrames: Int = 1,
                           corpusSize: Option[Long] = None): DataFrame = {
    val pairs = videoNearDupPairs(media, idCol, bytesCol, everyK, maxFrames,
        bands, maxHamming, minSharedFrames,
        corpusSize = Some(corpusSize.getOrElse(media.select(col(idCol)).count())))
      .select(col("doc_a"), col("doc_b"))
    graft.llm.Dedup.dedupKeepBest(media, idCol, pairs, scoreCol)
  }

  /** 64-bit energy-envelope hash of decoded mono PCM — see
    * [[graft.functions.AudioHash64]]. The audio analog of [[dHash64]]:
    * the signature that lets the banded candidate machinery find
    * RE-LEVELED or re-encoded copies the exact byte fingerprint (Q-M2)
    * cannot see.
    */
  def audioHash64(pcm: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    graft.functions.AudioHash.audioHash64(pcm)

  /** One-call perceptual dedup over REAL WAV bytes:
    * [[decodeWavPcm]] → [[audioHash64]] → [[perceptualNearDupPairs]] →
    * keep-best — [[dedupImagesPerceptual]] for the audio modality, same
    * contracts: decode touches only the narrow (id, bytes) projection,
    * survivors join back to the RAW media, undecodable rows survive
    * untouched (NULL hash never pairs), and the bands=0 sizing count
    * runs on the raw frame, never downstream of the decode barrier.
    */
  def dedupAudioPerceptual(media: DataFrame, idCol: String, bytesCol: String,
                           scoreCol: String, bands: Int = 0,
                           maxHamming: Int = 3,
                           corpusSize: Option[Long] = None): DataFrame = {
    val sizing =
      if (bands == 0) Some(corpusSize.getOrElse(media.select(col(idCol)).count()))
      else None
    val decoded = decodeWavPcm(media.select(col(idCol), col(bytesCol)), bytesCol,
      rateCol = "_dec_rate", channelsCol = "_dec_ch",
      nSamplesCol = "_dec_n", pcmCol = "_dec_pcm")
    val hashed = decoded.withColumn("_ahash", audioHash64(col("_dec_pcm")))
    val pairs = perceptualNearDupPairs(hashed, idCol, "_ahash", bands, maxHamming,
        corpusSize = sizing)
      .select(col("doc_a"), col("doc_b"))
    graft.llm.Dedup.dedupKeepBest(media, idCol, pairs, scoreCol)
  }

  /** One-call perceptual dedup over REAL image bytes:
    * [[decodeImage]] → [[dedupMediaPerceptual]] — keeps the best-scored
    * survivor per near-dup cluster exactly like the grid-column entry,
    * but starting from encoded PNG/JPEG blobs. Decode columns are
    * internal; the output carries the input schema. A re-encoded /
    * integer-resized / brightness-shifted copy of the same picture
    * collapses (spec-pinned on committed fixture images); undecodable
    * rows survive untouched (NULL hash never pairs).
    */
  def dedupImagesPerceptual(media: DataFrame, idCol: String, bytesCol: String,
                            scoreCol: String, bands: Int = 0,
                            maxHamming: Int = 3,
                            corpusSize: Option[Long] = None): DataFrame = {
    // bands=0 sizing count runs on the RAW media frame, never the decoded
    // one: mapPartitions is a pruning barrier, so a count placed after
    // decodeImage would decode every image just to derive a band count —
    // here it prunes to the id column on the source scan (and a caller
    // who knows the corpus size skips even that via corpusSize)
    val sizing =
      if (bands == 0) Some(corpusSize.getOrElse(media.select(col(idCol)).count()))
      else None
    // decode ONLY the narrow (id, bytes) projection, and only inside the
    // pair path: the explicit select keeps meta/score columns out of the
    // decode stage, and the keep-best below joins back to the RAW media —
    // the decode runs once (inside the pair stage's reused Exchange),
    // never a second time for the survivors (the dedupMediaPerceptual
    // argument, one level up)
    val decoded = decodeImage(media.select(col(idCol), col(bytesCol)), bytesCol,
      widthCol = "_dec_w", heightCol = "_dec_h", grayCol = "_dec_gray")
    val hashed = decoded.withColumn("_dhash",
      dHash64(col("_dec_gray"), col("_dec_w"), col("_dec_h")))
    val pairs = perceptualNearDupPairs(hashed, idCol, "_dhash", bands, maxHamming,
        corpusSize = sizing)
      .select(col("doc_a"), col("doc_b"))
    graft.llm.Dedup.dedupKeepBest(media, idCol, pairs, scoreCol)
  }

  /** Perceptual 64-bit dHash of a decoded grayscale grid — see
    * [[graft.functions.DHash64]] for the construction and the
    * NULL-on-undecodable contract. This is the media analog of
    * [[graft.llm.Dedup.simHashBits]]: the signature that lets the banded
    * candidate machinery find RE-ENCODED copies (resize, brightness,
    * re-compression) that the exact byte fingerprint (Q-M2) cannot see.
    */
  def dHash64(bytes: org.apache.spark.sql.Column,
              width: org.apache.spark.sql.Column,
              height: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    graft.functions.PerceptualHash.dHash64(bytes, width, height)

  /** Near-duplicate media pairs from a 64-bit perceptual hash column —
    * the [[graft.llm.Dedup.simHashCandidates]] shape on a LongType
    * signature: the hash splits into `bands` contiguous bit slices, docs
    * colliding on ANY slice become candidates (bands=4 → 16-bit slices ≈
    * a Hamming≤3 guarantee), and candidates are re-scored with the EXACT
    * Hamming distance (`bit_count(xor)`) and cut at `maxHamming`. Rows
    * with a NULL hash (undecodable media) never pair.
    *
    * Scale: the self-join keys on an 8-byte (band, slice) pair — never
    * all-pairs; only narrow (id, hash) rows ride the Exchange (the hash
    * IS the content here, 8 bytes/row — media bytes never shuffle). The
    * default `bands = 0` derives the band count from the corpus size via
    * [[graft.llm.Dedup.autoBands]] (identical noise math — a b-bit slice
    * collides randomly at 2^-b, so fixed 16-bit slices degrade
    * quadratically past n ≈ 10^5; pass `corpusSize` to skip the count).
    * A pinned `bands` stays available for oracle replay (the Q-L52
    * convention; Q-M3 pins 4).
    */
  def perceptualNearDupPairs(media: DataFrame, idCol: String, hashCol: String,
                             bands: Int = 0, maxHamming: Int = 3,
                             corpusSize: Option[Long] = None): DataFrame = {
    // Derived bands are CLAMPED to the pigeonhole bound: maxHamming
    // differing bits can split across at most maxHamming+1 contiguous
    // slices, so fewer bands than that silently drops true pairs —
    // autoBands can return 2 (32-bit slices, Hamming<=1 guarantee) for
    // large corpora while the default maxHamming is 3. The clamp trades
    // band-collision noise (cost: more candidates into the exact
    // rescore) for the documented recall guarantee, never the reverse.
    val b0 =
      if (bands == 0) {
        // the sizing count lives INSIDE this branch: pinned-bands callers
        // (and pinned-corpusSize ones) must never pay a corpus pass just
        // to size bands they didn't ask for — and when it does run it
        // counts the id-pruned projection, not the hash/decode chain
        val sizeBound = math.max(
          corpusSize.getOrElse(media.select(col(idCol)).count()), 1L)
        val derived = graft.llm.Dedup.autoBands(sizeBound)
        val floor = Seq(1, 2, 4, 8, 16, 32, 64).find(_ >= maxHamming + 1)
          .getOrElse(64)
        math.max(derived, floor)
      } else bands
    require(b0 > 0 && 64 % b0 == 0, s"bands must divide 64, got $b0")
    require(maxHamming >= 0, s"maxHamming must be >= 0, got $maxHamming")
    val width = 64 / b0
    val mask = if (width == 64) lit(-1L) else lit((1L << width) - 1)
    val hashed = media.select(col(idCol).as("id"), col(hashCol).as("h"))
      .filter(col("h").isNotNull)
    val banded = hashed.select(col("id"), col("h"),
      posexplode(array((0 until b0).map(b =>
        shiftrightunsigned(col("h"), b * width).bitwiseAND(mask)): _*)))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bh")
    // shuffle_hash → both sides share one reused Exchange, so the hash
    // projection (and, upstream, the decode) computes ONCE for the pair
    // stage (the Dedup.candidatePairsFromBands argument — for media the
    // avoided recompute is the decode itself)
    val a = banded.hint("shuffle_hash").as("a")
    val b = banded.hint("shuffle_hash").as("b")
    a.join(b, col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
        col("a.id") < col("b.id"))
      // exact distance scored INSIDE the band join (one xor+popcount per
      // collision), narrow (doc_a, doc_b, hamming) rows into the dedup
      // Exchange — the minHashLshCandidates discipline
      .select(col("a.id").as("doc_a"), col("b.id").as("doc_b"),
        bit_count(col("a.h").bitwiseXOR(col("b.h"))).cast("int").as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .dropDuplicates("doc_a", "doc_b")
  }

  /** One-call perceptual media dedup: hash → banded pairs → keep-best
    * ([[graft.llm.Dedup.dedupKeepBest]] — highest `scoreCol` per
    * duplicate cluster, ties → min id). The media dedup entry a crawl
    * pipeline calls between ingest and feature extraction.
    */
  def dedupMediaPerceptual(media: DataFrame, idCol: String,
                           bytesCol: String, widthCol: String, heightCol: String,
                           scoreCol: String, bands: Int = 0,
                           maxHamming: Int = 3): DataFrame = {
    require(!media.columns.contains("_dhash"),
      "dedupMediaPerceptual reserves the _dhash column; rename or drop the input's _dhash")
    val hashed = media.withColumn("_dhash",
      dHash64(col(bytesCol), col(widthCol), col(heightCol)))
    val pairs = perceptualNearDupPairs(hashed, idCol, "_dhash", bands, maxHamming)
      .select(col("doc_a"), col("doc_b"))
    // keep-best joins back to the RAW media — the hash column exists
    // only inside the pair path (where the reused Exchange computes it
    // once); feeding `hashed` here would decode+hash the full corpus a
    // second time just to drop the column afterwards
    graft.llm.Dedup.dedupKeepBest(media, idCol, pairs, scoreCol)
  }

  /** BYTE-level frame sampling over a packed binary video column — the
    * missing half of [[sampleFrames]] (which emits only metadata-derived
    * frame INDICES): slice every `everyK`-th fixed-size frame out of the
    * container, up to `maxFrames` samples per video. The container
    * convention is raw concatenated frames of exactly `frameBytes` each
    * (the synthetic-media fixture layout; a real codec would decode to
    * this shape first — the decode step is the documented external
    * boundary, the slicing/explode/partitioning plumbing here is real).
    *
    * Output: (idCol, frame_idx INT, n_frames INT, frame BINARY). Each
    * frame then feeds the real per-frame feature extractors ([[dHash64]]
    * → [[perceptualNearDupPairs]] composes directly — spec-pinned).
    *
    * LOUD GUARD: a byte length that is not a multiple of `frameBytes`
    * raises (a truncated/corrupt container silently losing its tail is
    * exactly the bug class the guard discipline exists for). Zero-byte
    * videos emit no frames (documented, not an error — an empty
    * container has nothing to sample).
    *
    * Scale: slicing is a scan-riding projection (substring on the
    * binary column inside the Generate stage — no shuffle anywhere, and
    * the full container bytes never ride an Exchange; pair the output
    * with [[repartitionByBytes]] when downstream work is per-frame).
    */
  def sliceFrames(media: DataFrame, idCol: String, bytesCol: String,
                  frameBytes: Int, everyK: Int = 1,
                  maxFrames: Int = Int.MaxValue): DataFrame = {
    require(frameBytes >= 1, s"frameBytes must be >= 1, got $frameBytes")
    require(everyK >= 1, s"everyK must be >= 1, got $everyK")
    require(maxFrames >= 1, s"maxFrames must be >= 1, got $maxFrames")
    val lastIdx = least(col("_nf") - 1,
      lit(maxFrames.toLong - 1L) * everyK).cast("int")
    media.select(col(idCol), col(bytesCol).as("_vb"),
      length(col(bytesCol)).as("_len"))
      .withColumn("_nf",
        when(pmod(col("_len"), lit(frameBytes)) =!= 0, raise_error(concat(
          lit(s"sliceFrames: container length is not a multiple of frameBytes=$frameBytes (got "),
          col("_len").cast("string"),
          lit(" bytes) — truncated or corrupt media"))))
          .otherwise((col("_len") / lit(frameBytes)).cast("int")))
      .filter(col("_nf") > 0)
      .select(col(idCol), col("_vb"), col("_nf"),
        explode(sequence(lit(0), lastIdx, lit(everyK))).as("frame_idx"))
      .select(col(idCol), col("frame_idx"), col("_nf").as("n_frames"),
        col("_vb").substr(col("frame_idx") * frameBytes + 1,
          lit(frameBytes)).as("frame"))
  }

  /** RAGGED-container frame slicing — the shape real extractor output
    * has: per-frame byte spans in parallel `offsetsCol`/`lengthsCol`
    * array columns (a frame index), not [[sliceFrames]]'s fixed
    * `frameBytes` packing. Compressed frames differ in size per frame
    * (I-frames ≫ P/B-frames), so a real demuxer emits exactly this
    * (offset, length) index next to the blob; everyK/maxFrames sampling
    * matches the fixed-size form.
    *
    * Output: (idCol, frame_idx INT, n_frames INT, frame BINARY), where
    * n_frames = the index length and frame_idx walks 0, everyK, 2·everyK…
    *
    * CONTRACTS (spec-pinned):
    *  - LOUD GUARD on a corrupt index: offsets/lengths arrays of
    *    different sizes, a NULL/negative offset or length, or a span
    *    past the container's end all raise with the offending id — a
    *    truncated container silently losing frames is the bug class the
    *    guard discipline exists for.
    *  - zero-LENGTH frames emit as empty BINARY (an empty frame is
    *    data, not corruption — extractors emit them for dropped
    *    frames); zero-ENTRY indexes and NULL bytes/index columns emit
    *    no rows (nothing to sample).
    *  - OVERLAPPING spans are allowed (frame indexes legitimately share
    *    bytes — headers, reference frames); this slicer never assumes
    *    the spans partition the container.
    *
    * Scale: identical plan family to [[sliceFrames]] — the sampled
    * index explodes in a Generate and each frame is a substring
    * projection riding the scan; zero shuffles, container bytes never
    * enter an Exchange.
    */
  def sliceFramesRagged(media: DataFrame, idCol: String, bytesCol: String,
                        offsetsCol: String, lengthsCol: String,
                        everyK: Int = 1,
                        maxFrames: Int = Int.MaxValue): DataFrame = {
    require(everyK >= 1, s"everyK must be >= 1, got $everyK")
    require(maxFrames >= 1, s"maxFrames must be >= 1, got $maxFrames")
    val lastIdx = least(col("_nf") - 1,
      lit(maxFrames.toLong - 1L) * everyK).cast("int")
    val off = element_at(col("_off"), col("frame_idx") + 1).cast("long")
    val len = element_at(col("_ln"), col("frame_idx") + 1).cast("long")
    val corrupt = off.isNull || len.isNull || off < 0 || len < 0 ||
      (off + len) > col("_cap")
    media.select(col(idCol), col(bytesCol).as("_vb"),
        col(offsetsCol).as("_off"), col(lengthsCol).as("_ln"),
        coalesce(length(col(bytesCol)).cast("long"), lit(0L)).as("_cap"))
      .filter(col("_vb").isNotNull && col("_off").isNotNull && col("_ln").isNotNull)
      .withColumn("_nf",
        when(size(col("_off")) =!= size(col("_ln")), raise_error(concat(
          lit("sliceFramesRagged: offsets/lengths disagree ("),
          size(col("_off")).cast("string"), lit(" vs "),
          size(col("_ln")).cast("string"), lit(") for id "),
          col(idCol).cast("string"), lit(" — corrupt frame index"))))
          .otherwise(size(col("_off"))))
      .filter(col("_nf") > 0)
      .select(col(idCol), col("_vb"), col("_off"), col("_ln"), col("_cap"),
        col("_nf"), explode(sequence(lit(0), lastIdx, lit(everyK))).as("frame_idx"))
      .select(col(idCol), col("frame_idx"), col("_nf").as("n_frames"),
        when(corrupt, raise_error(concat(
          lit("sliceFramesRagged: frame "), col("frame_idx").cast("string"),
          lit(" of id "), coalesce(col(idCol).cast("string"), lit("null")),
          lit(" spans ["),
          // a NULL index entry must not null the whole message (concat
          // is null-intolerant) — the guard text is the diagnosis
          coalesce(off.cast("string"), lit("null")), lit(", +"),
          coalesce(len.cast("string"), lit("null")),
          lit(") past the "), col("_cap").cast("string"),
          lit("-byte container — truncated or corrupt media"))))
          .otherwise(col("_vb").substr((off + 1L).cast("int"), len.cast("int")))
          .as("frame"))
  }

  /** Frame sampling stage (video): every `stride`-th frame index up to
    * `maxFrames`, as (media_id, frame_idx) rows ready for per-frame decode.
    */
  def sampleFrames(name: String, fps: Int, stride: Int, maxFrames: Int): Stage =
    Stage(StageId(name)) { df =>
      val nFrames = least(ceil(col("meta.duration_ms") / 1000.0 * fps).cast("int"),
        lit(maxFrames * stride))
      df.withColumn("frame_idx",
          explode(sequence(lit(0), greatest(nFrames - 1, lit(0)), lit(stride))))
        .select(col("media_id"), col("frame_idx"))
    }
}
