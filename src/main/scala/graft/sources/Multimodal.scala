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

  /** Byte-aware repartitioning: target ~`targetBytesPerTask` per partition
    * using the binary column's length (media rows are wildly skewed; row
    * count is the wrong unit at 100 TB).
    */
  def repartitionByBytes(df: DataFrame, bytesCol: String, targetBytesPerTask: Long): DataFrame = {
    val totalBytes = df.agg(sum(length(col(bytesCol)).cast("long"))).head().getLong(0)
    val parts = math.max(1, (totalBytes / math.max(1L, targetBytesPerTask)).toInt)
    df.repartition(parts)
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
