package graft.analytics

import graft.SparkSpec

class ProfileSpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = Seq(
    (Some(1.0), "a"), (Some(2.0), "b"), (Some(2.0), "b"), (None, "c"))
    .toDF("x", "s")

  test("profile emits count/nulls/distinct/min/max per column from one pass") {
    val m = Profile.profile(df, Seq("x")).collect()
      .map(r => r.getString(1) -> r.getDouble(2)).toMap
    assert(m == Map("count" -> 3.0, "nulls" -> 1.0, "distinct" -> 2.0,
      "min" -> 1.0, "max" -> 2.0))
  }

  test("profile handles several columns in the same aggregation") {
    val rows = Profile.profile(df, Seq("x", "s")).collect()
    assert(rows.length == 10) // 5 metrics x 2 columns
    val sCount = rows.find(r => r.getString(0) == "s" && r.getString(1) == "count").get
    assert(sCount.getDouble(2) == 4.0)
    // min/max of a string column cast to double -> null value, not a crash
    val sMin = rows.find(r => r.getString(0) == "s" && r.getString(1) == "min").get
    assert(sMin.isNullAt(2))
  }

  test("approxDistinct stays within 5% of exact on real data") {
    val li = graft.sources.Tables.load(spark, sf, "lineitem")
    val exact = Profile.profile(li, Seq("l_orderkey"))
      .filter($"metric" === "distinct").head().getDouble(2)
    val approx = Profile.profile(li, Seq("l_orderkey"), approxDistinct = true)
      .filter($"metric" === "distinct").head().getDouble(2)
    assert(math.abs(approx - exact) / exact < 0.05, s"approx=$approx exact=$exact")
  }

  test("histogram clamps outliers into edge buckets and drops only NULLs") {
    val data = Seq(Some(-5.0), Some(0.0), Some(4.9), Some(5.0), Some(9.9),
      Some(10.0), Some(25.0), None).toDF("x")
    val h = Profile.histogram(data, "x", lo = 0.0, hi = 10.0, bins = 2)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    // [-5 clamp, 0, 4.9] -> bucket 0; [5.0, 9.9, 10.0 clamp, 25 clamp] -> 1
    assert(h == Map(0 -> 3, 1 -> 4))
    assert(h.values.sum == 7) // all non-null rows accounted for
  }

  test("quantiles ride the same single aggregation and land within sketch error") {
    val data = (1 to 1000).map(_.toDouble).toDF("x")
    val rows = Profile.profile(data, Seq("x"), quantiles = Seq(0.5, 0.95, 0.99))
      .collect().map(r => r.getString(1) -> r.getDouble(2)).toMap
    // base metrics untouched by the quantile columns
    assert(rows("count") == 1000.0 && rows("min") == 1.0 && rows("max") == 1000.0)
    // accuracy=10000 over n=1000 -> rank error under a handful of rows
    assert(math.abs(rows("p50") - 500.0) <= 10.0, s"p50=${rows("p50")}")
    assert(math.abs(rows("p95") - 950.0) <= 10.0, s"p95=${rows("p95")}")
    assert(math.abs(rows("p99") - 990.0) <= 10.0, s"p99=${rows("p99")}")
  }

  test("quantile columns add no second pass (they ride the base aggregation)") {
    val li = graft.sources.Tables.load(spark, sf, "lineitem")
    // HLL path: the original one-aggregation-over-one-scan claim holds
    // verbatim — quantile sketches and approx distincts all ride the base
    // agg, no join/union of extra jobs
    val approx = Profile.profile(li, Seq("l_quantity"),
      approxDistinct = true, quantiles = Seq(0.5, 0.99))
      .queryExecution.executedPlan.toString
    assert(!approx.contains("Union") && !approx.contains("Join"), approx)
    // exact path (round 22): each exact distinct is its own NARROW
    // column-pruned aggregation crossjoined onto the base row — quantiles
    // still add no scan of their own (scans = 1 base + 1 per distinct),
    // and the Expand rewrite (the 111-MB-shuffle shape this replaced)
    // must never come back
    val exact = Profile.profile(li, Seq("l_quantity"), quantiles = Seq(0.5, 0.99))
      .queryExecution.executedPlan.toString
    assert(!exact.contains("Expand"), exact)
    val scans = "FileScan parquet".r.findAllIn(exact).size
    assert(scans == 2, s"expected base + one distinct scan, got $scans:\n$exact")
  }

  test("profile survives column names with dots and spaces (positional aliases)") {
    val odd = Seq((1.0, 2.0)).toDF("a.b", "max price")
    val m = Profile.profile(odd, Seq("a.b", "max price"), quantiles = Seq(0.5))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.get(2)).toMap
    assert(m(("a.b", "count")) == 1.0)
    assert(m(("max price", "max")) == 2.0)
    assert(m(("a.b", "p50")) == 1.0)
  }

  test("quantiles over a string column yield NULL rows, not an ANSI cast crash") {
    val rows = Profile.profile(df, Seq("s"), quantiles = Seq(0.5)).collect()
    val p50 = rows.find(_.getString(1) == "p50").get
    assert(p50.isNullAt(2)) // same try_cast contract as min/max
  }

  test("quantile metric names are decimal-clean for float-hostile fractions") {
    val data = (1 to 100).map(_.toDouble).toDF("x")
    val names = Profile.profile(data, Seq("x"), quantiles = Seq(0.07, 0.29, 0.001))
      .select("metric").collect().map(_.getString(0)).toSet
    // (0.07 * 100).toString would be "7.000000000000001"
    assert(names.contains("p7") && names.contains("p29") && names.contains("p0.1"),
      s"got $names")
  }

  test("histogram excludes NaN instead of clamping it into the top bucket") {
    val data = Seq(Some(1.0), Some(Double.NaN), Some(9.0), None).toDF("x")
    val h = Profile.histogram(data, "x", lo = 0.0, hi = 10.0, bins = 2)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(h == Map(0 -> 1, 1 -> 1)) // NaN row gone, not in bucket 1
  }

  test("histogramAuto derives robust bounds from the quantile sketch") {
    val data = ((1 to 9998).map(_.toDouble) ++ Seq(1e12, -1e12)).toDF("x")
    val (lo, hi, hist) = Profile.histogramAuto(data, "x", bins = 10)
    // p001/p999 clip the planted extreme outliers out of the bounds
    assert(lo > -1e6 && hi < 1e6, s"bounds not clipped: [$lo, $hi)")
    assert(hi > lo)
    // clamping keeps every non-null row counted, outliers in edge buckets
    assert(hist.collect().map(_.getLong(1)).sum == 10000)
  }

  test("approxDistinct plans without Expand (single-pass HLL at scale)") {
    val li = graft.sources.Tables.load(spark, sf, "lineitem")
    val plan = Profile.profile(li, Seq("l_orderkey", "l_partkey"), approxDistinct = true)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Expand"), s"approx profile should not Expand:\n$plan")
  }
}
