package graft.sources

import graft.core.{Stage, StageId}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet sources over the oracle tables (`TESTDATA.md`). A source is just
  * a stage-graph entry point; reads stay fully declarative so Catalyst
  * pushes filters and prunes columns into the scan.
  */
object Tables {
  val all = Seq("region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, table: String): DataFrame = {
    if (table == "events") loadEvents(spark, sfDir)
    else spark.read.parquet(s"$sfDir/$table.parquet")
  }

  /** `events.ts` is parquet TIMESTAMP(NANOS), which the Spark scanner
    * rejects outright ([PARQUET_TYPE_ILLEGAL]). Read it as a raw
    * nanos-since-epoch long (`spark.sql.legacy.parquet.nanosAsLong`) and
    * surface both a microsecond-precision `ts` TimestampType column (for
    * window/session operators) and the exact `ts_ns` long (for queries that
    * must keep full precision for oracle parity).
    */
  def loadEvents(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$sfDir/events.parquet")
      .withColumnRenamed("ts", "ts_ns")
      // integer division: `/` would go through Double and ns-epoch values
      // (~1.7e18) exceed Double's 2^53 exact-integer range
      .withColumn("ts", timestamp_micros(expr("ts_ns div 1000")))
  }
}

/** ParquetSource as a composable Stage (ignores its input frame). */
final case class ParquetSource(id: StageId, path: String) extends Stage {
  def apply(df: DataFrame): DataFrame = df.sparkSession.read.parquet(path)
}

object ParquetSource {
  def apply(path: String): ParquetSource = ParquetSource(StageId(s"parquet:$path"), path)
}

/** Parquet sink stage: writes and passes the frame through (Effect-like). */
final case class ParquetSink(id: StageId, path: String, mode: String = "overwrite")
    extends Stage {
  def apply(df: DataFrame): DataFrame = { df.write.mode(mode).parquet(path); df }
}
