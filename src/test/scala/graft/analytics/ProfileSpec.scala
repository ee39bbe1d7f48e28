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

  test("approxDistinct plans without Expand (single-pass HLL at scale)") {
    val li = graft.sources.Tables.load(spark, sf, "lineitem")
    val plan = Profile.profile(li, Seq("l_orderkey", "l_partkey"), approxDistinct = true)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Expand"), s"approx profile should not Expand:\n$plan")
  }
}
