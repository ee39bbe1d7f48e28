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

  // col("a.b") parses the dot as struct access; backtick-quote so a column
  // NAME containing dots/spaces resolves as one identifier
  private def c(name: String): Column =
    col("`" + name.replace("`", "``") + "`")

  // try_cast, not cast: a string column must quantile to NULL, not throw
  // under ANSI mode — the same contract the min/max path documents
  private def tryDouble(name: String): Column =
    expr("try_cast(`" + name.replace("`", "``") + "` AS DOUBLE)")

  /** One-pass profile. `quantiles` (e.g. `Seq(0.5, 0.95, 0.99)`) adds a
    * `pNN` metric row per column from `approx_percentile` — the same
    * single aggregation, one KLL-class sketch per column riding the scan
    * (no extra pass, no shuffle growth; error is bounded by `accuracy`:
    * rank error ≲ 1/accuracy). Default empty keeps the exact-metric
    * surface byte-stable for the qx10 oracle. This is how an UNKNOWN
    * 100 TB table gets its distribution surveyed: quantiles first, then
    * [[histogram]] with bounds taken from them ([[histogramAuto]] wires
    * the two together).
    *
    * Internal aggregate aliases are positional (`__cnt_0`), never derived
    * from the column NAME — a column named `a.b` or `max price` must not
    * break alias parsing (the public `col_name` output keeps the real
    * name as a literal, which needs no quoting).
    */
  def profile(df: DataFrame, cols: Seq[String],
              approxDistinct: Boolean = false,
              quantiles: Seq[Double] = Nil,
              accuracy: Int = 10000): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    require(quantiles.forall(q => q >= 0.0 && q <= 1.0),
      s"quantiles must be in [0, 1], got $quantiles")
    val distinctOf: String => Column =
      if (approxDistinct) n => approx_count_distinct(c(n), rsd = 0.02).cast("double")
      else n => count_distinct(c(n)).cast("double")
    val aggs = count(lit(1)).cast("double").as("__rows") +: cols.zipWithIndex.flatMap {
      case (n, i) =>
        // min/max keep their native type here; the cast to the long-format
        // double happens below via try_cast so a string column profiles to
        // NULL min/max instead of an ANSI cast error
        Seq(count(c(n)).cast("double").as(s"__cnt_$i"),
          distinctOf(n).as(s"__dst_$i"),
          min(c(n)).as(s"__min_$i"),
          max(c(n)).as(s"__max_$i")) ++
          (if (quantiles.isEmpty) Nil
           else Seq(percentile_approx(tryDouble(n),
             array(quantiles.map(lit): _*), lit(accuracy)).as(s"__qtl_$i")))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    // decimal formatting: (0.07 * 100) is 7.000000000000001 in doubles —
    // metric names must come out as "p7", not float garbage
    def pName(q: Double): String =
      "p" + (BigDecimal(q.toString) * 100).bigDecimal.stripTrailingZeros.toPlainString
    val entries = cols.zipWithIndex.flatMap { case (n, i) =>
      Seq(
        struct(lit(n).as("col_name"), lit("count").as("metric"),
          col(s"__cnt_$i").as("value")),
        struct(lit(n).as("col_name"), lit("nulls").as("metric"),
          (col("__rows") - col(s"__cnt_$i")).as("value")),
        struct(lit(n).as("col_name"), lit("distinct").as("metric"),
          col(s"__dst_$i").as("value")),
        struct(lit(n).as("col_name"), lit("min").as("metric"),
          expr(s"try_cast(__min_$i AS DOUBLE)").as("value")),
        struct(lit(n).as("col_name"), lit("max").as("metric"),
          expr(s"try_cast(__max_$i AS DOUBLE)").as("value"))) ++
        quantiles.zipWithIndex.map { case (q, qi) =>
          struct(lit(n).as("col_name"), lit(pName(q)).as("metric"),
            element_at(col(s"__qtl_$i"), qi + 1).as("value"))
        }
    }
    one.select(explode(array(entries: _*)).as("e")).select(col("e.*"))
  }

  /** Equi-width histogram over `[lo, hi)` with `bins` buckets — the
    * distribution half of the profiling surface. One partial+final
    * aggregation over one scan (the groupBy key is a computed bucket id,
    * at most `bins` groups — the shuffle is `bins` rows per map task no
    * matter the data size). Out-of-range values CLAMP into the edge
    * buckets rather than vanish (a silent drop would under-report
    * outliers — the thing a histogram is usually looking for); NULLs and
    * NaNs are excluded (NaN passes `isNotNull` and Spark's greatest/least
    * order it above every double, so without the explicit isnan guard NaN
    * rows would silently clamp into the TOP bucket — a miscount, not an
    * outlier). All arithmetic is IEEE double (division + floor),
    * bit-reproducible in the DuckDB oracle.
    */
  def histogram(df: DataFrame, colName: String,
                lo: Double, hi: Double, bins: Int): DataFrame = {
    require(bins > 0, s"bins must be positive, got $bins")
    require(hi > lo, s"need hi > lo, got [$lo, $hi)")
    val w = (hi - lo) / bins
    val x = c(colName).cast("double")
    val bucket = least(greatest(
      floor((x - lo) / w), lit(0.0)), lit((bins - 1).toDouble))
      .cast("int")
    df.filter(x.isNotNull && !isnan(x))
      .groupBy(bucket.as("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Histogram with data-derived bounds — the "profile an unknown table"
    * loop closed: one sketch aggregation picks robust bounds (default
    * p001/p999, clipping the extreme tails that would otherwise stretch
    * every bucket), then the [[histogram]] pass buckets against them.
    * Two scans total, both single-agg; the alternative (exact min/max
    * bounds) is one `profile` call away and degrades badly on heavy
    * tails. Returns (lo, hi, histogram) so callers can label the axes.
    */
  def histogramAuto(df: DataFrame, colName: String, bins: Int,
                    loQuantile: Double = 0.001, hiQuantile: Double = 0.999,
                    accuracy: Int = 10000): (Double, Double, DataFrame) = {
    require(loQuantile < hiQuantile, s"need loQuantile < hiQuantile")
    val x = c(colName).cast("double")
    val row = df.filter(x.isNotNull && !isnan(x))
      .agg(percentile_approx(x, array(lit(loQuantile), lit(hiQuantile)),
        lit(accuracy)).as("b"))
      .select(element_at(col("b"), 1).as("lo"), element_at(col("b"), 2).as("hi"))
      .head()
    require(!row.isNullAt(0) && !row.isNullAt(1),
      s"histogramAuto: no non-NULL/NaN values in $colName")
    val (lo, rawHi) = (row.getDouble(0), row.getDouble(1))
    // equal quantiles (near-constant column): widen so hi > lo holds
    val hi = if (rawHi > lo) rawHi else lo + math.max(math.ulp(lo), 1e-9)
    (lo, hi, histogram(df, colName, lo, hi, bins))
  }
}
