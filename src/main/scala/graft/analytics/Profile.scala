package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Column profiling — the data-quality survey pass run before committing
  * a corpus to training: per-column row/null/distinct counts and numeric
  * min/max, in long format `(col_name, metric, value)` so downstream
  * checks can diff profiles across snapshots without schema churn.
  *
  * Scale shape: ALL metrics for ALL columns ride ONE aggregation over ONE
  * scan — a single partial+final agg, no per-column jobs, no driver-side
  * loop over `collect()`. Exact distinct counts plan an Expand (one
  * duplicated pass per column inside the same stage); at the 100 TB scale
  * that multiplication matters, so `approxDistinct = true` swaps in
  * HyperLogLog sketches (`approx_count_distinct`) — same single pass, no
  * Expand, rsd ~2%. The exact form is the oracle-checked default at test
  * scale; the approx form is the fleet setting.
  *
  * Reference analog: the observability/metrics surface
  * (reference/metrics.go:30-52) — per-stage counters exposed as data.
  */
object Profile {

  val Metrics: Seq[String] = Seq("count", "nulls", "distinct", "min", "max")

  def profile(df: DataFrame, cols: Seq[String],
              approxDistinct: Boolean = false): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val distinctOf: String => Column =
      if (approxDistinct) c => approx_count_distinct(col(c), rsd = 0.02).cast("double")
      else c => count_distinct(col(c)).cast("double")
    val aggs = count(lit(1)).cast("double").as("__rows") +: cols.flatMap { c =>
      // min/max keep their native type here; the cast to the long-format
      // double happens below via try_cast so a string column profiles to
      // NULL min/max instead of an ANSI cast error
      Seq(count(col(c)).cast("double").as(s"__cnt_$c"),
        distinctOf(c).as(s"__dst_$c"),
        min(col(c)).as(s"__min_$c"),
        max(col(c)).as(s"__max_$c"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val entries = cols.flatMap { c =>
      Seq(
        struct(lit(c).as("col_name"), lit("count").as("metric"),
          col(s"__cnt_$c").as("value")),
        struct(lit(c).as("col_name"), lit("nulls").as("metric"),
          (col("__rows") - col(s"__cnt_$c")).as("value")),
        struct(lit(c).as("col_name"), lit("distinct").as("metric"),
          col(s"__dst_$c").as("value")),
        struct(lit(c).as("col_name"), lit("min").as("metric"),
          expr(s"try_cast(__min_$c AS DOUBLE)").as("value")),
        struct(lit(c).as("col_name"), lit("max").as("metric"),
          expr(s"try_cast(__max_$c AS DOUBLE)").as("value")))
    }
    one.select(explode(array(entries: _*)).as("e")).select(col("e.*"))
  }

  /** Equi-width histogram over `[lo, hi)` with `bins` buckets — the
    * distribution half of the profiling surface. One partial+final
    * aggregation over one scan (the groupBy key is a computed bucket id,
    * at most `bins` groups — the shuffle is `bins` rows per map task no
    * matter the data size). Out-of-range values CLAMP into the edge
    * buckets rather than vanish (a silent drop would under-report
    * outliers — the thing a histogram is usually looking for); NULLs are
    * excluded like every aggregate. All arithmetic is IEEE double
    * (division + floor), bit-reproducible in the DuckDB oracle.
    */
  def histogram(df: DataFrame, colName: String,
                lo: Double, hi: Double, bins: Int): DataFrame = {
    require(bins > 0, s"bins must be positive, got $bins")
    require(hi > lo, s"need hi > lo, got [$lo, $hi)")
    val w = (hi - lo) / bins
    val bucket = least(greatest(
      floor((col(colName).cast("double") - lo) / w), lit(0.0)), lit((bins - 1).toDouble))
      .cast("int")
    df.filter(col(colName).isNotNull)
      .groupBy(bucket.as("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }
}
