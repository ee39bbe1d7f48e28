package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed tables — shuffle-free co-located joins and aggregations.
  *
  * At 100 TB the dominant cost of a fact–fact join is shuffling both
  * sides. Writing both tables bucketed (and sorted) on the join key gives
  * every future join/aggregation on that key a plan with NO Exchange: the
  * scan's output partitioning already satisfies the join's distribution
  * requirement, and the sort order feeds SortMergeJoin directly. One write
  * amortizes over every downstream query — the canonical warehouse layout
  * for repeatedly-joined big tables.
  */
object Bucketing {

  /** Write `df` as a bucketed, sorted table backed by parquet at `path`.
    * `numBuckets` should be sized so a bucket fits an executor's working
    * memory at full scale (buckets = parallelism unit for later reads).
    */
  def writeBucketed(df: DataFrame, table: String, path: String,
                    bucketCols: Seq[String], numBuckets: Int,
                    sortCols: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite")
      .format("parquet")
      .option("path", path)
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .saveAsTable(table)
  }

  /** Read a bucketed table (bucketing metadata lives in the catalog, so
    * reads must go through the table name, not the path).
    */
  def readBucketed(spark: SparkSession, table: String): DataFrame =
    spark.table(table)

  /** True when the physical plan of `df` contains no shuffle exchange —
    * the property bucketing is supposed to buy. Exposed for tests and
    * plan audits.
    */
  def isShuffleFree(df: DataFrame): Boolean =
    !df.queryExecution.executedPlan.toString.contains("Exchange")
}
