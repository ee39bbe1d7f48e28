package graft.analytics

import graft.SparkSpec
import graft.core.StageId
import org.apache.spark.sql.functions._

class AnalyticsSpec extends SparkSpec {
  import spark.implicits._

  test("asOfBackward picks the latest right row at-or-before the left time") {
    val quotes = Seq(
      ("A", 10L, 1.0), ("A", 20L, 2.0), ("A", 30L, 3.0),
      ("B", 15L, 9.0)
    ).toDF("sym", "qt", "px")
    val trades = Seq(
      (1L, "A", 25L), (2L, "A", 30L), (3L, "B", 10L), (4L, "A", 5L)
    ).toDF("tid", "tsym", "tt")
    val stage = Joins.asOfBackward("asof", quotes,
      leftKey = col("tsym"), rightKey = col("sym"),
      leftTime = col("tt"), rightTime = col("qt"),
      leftPk = Seq("tid"), rightTieBreak = col("px"))
    val out = stage(trades).select("tid", "qt", "px")
    // trade 3 (B@10) has no quote <= 10; trade 4 (A@5) none either → dropped
    assert(rowsOf(out) == Set(Seq(1L, 20L, 2.0), Seq(2L, 30L, 3.0)))
  }

  test("asOfBackward breaks time ties deterministically") {
    val quotes = Seq(("A", 10L, 1.0), ("A", 10L, 5.0)).toDF("sym", "qt", "px")
    val trades = Seq((1L, "A", 10L)).toDF("tid", "tsym", "tt")
    val stage = Joins.asOfBackward("asof", quotes,
      col("tsym"), col("sym"), col("tt"), col("qt"),
      Seq("tid"), rightTieBreak = col("px"))
    assert(stage(trades).select("px").head().getDouble(0) == 5.0) // max tiebreak wins
  }

  test("asOfBackwardAggWithin drops matches staler than the lookback; boundary is half-open") {
    val quotes = Seq(
      ("A", 10L, 1.0), ("A", 20L, 2.0),
      ("B", 5L, 9.0)
    ).toDF("sym", "qt", "px")
    val trades = Seq(
      (1L, "A", 25L), // nearest quote at 20, gap 5  -> kept (5 < 10)
      (2L, "B", 40L), // nearest quote at 5, gap 35  -> stale, NO match
      (3L, "A", 30L)  // nearest quote at 20, gap 10 -> boundary: 20 > 30-10 is FALSE -> dropped
    ).toDF("tid", "tsym", "tt")
    val stage = Joins.asOfBackwardAggWithin("asof_tol", quotes,
      leftKey = col("tsym"), rightKey = col("sym"),
      leftTime = col("tt"), rightTime = col("qt"),
      leftPk = Seq("tid"), rightTieBreak = col("px"),
      lookback = lit(10L),
      "px" -> col("px"))
    assert(rowsOf(stage(trades)) == Set(Seq(1L, 2.0)))
    // a wide-enough window reproduces the unbounded form exactly
    val wide = Joins.asOfBackwardAggWithin("asof_tol", quotes,
      col("tsym"), col("sym"), col("tt"), col("qt"), Seq("tid"), col("px"),
      lookback = lit(1000L), "px" -> col("px"))
    val unbounded = Joins.asOfBackwardAgg("asof", quotes,
      col("tsym"), col("sym"), col("tt"), col("qt"), Seq("tid"), col("px"),
      "px" -> col("px"))
    assert(rowsOf(wide(trades)) == rowsOf(unbounded(trades)))
  }

  test("encoded as-of fast path equals the max_by form (date times, key ties)") {
    // single integral payload == tiebreak + DATE right time → the
    // DECIMAL(38,0) (time, key) encoding replaces the struct max_by
    // (round 22); pin row-equality against a payload that defeats the
    // fast path (extra column) on a fixture with same-date key ties
    val orders = Seq(
      (100L, 1L, "2020-01-05"), (101L, 1L, "2020-01-05"), // tie on date → max key
      (102L, 1L, "2020-01-01"),
      (103L, 2L, "2020-03-01")
    ).toDF("okey", "cust", "d").withColumn("d", to_date(col("d")))
    val probes = Seq(
      (1L, 1L, "2020-02-01"), (2L, 2L, "2020-02-01"), (3L, 3L, "2020-02-01")
    ).toDF("pid", "pcust", "pd").withColumn("pd", to_date(col("pd")))
    val fast = Joins.asOfBackwardAgg("asof", orders,
      leftKey = col("pcust"), rightKey = orders("cust"),
      leftTime = col("pd"), rightTime = orders("d"),
      leftPk = Seq("pid"), rightTieBreak = orders("okey"),
      "match_key" -> orders("okey"))
    // slow form: payload carries a second column, so the struct max_by
    // path plans; project down to the same columns for comparison
    val slow = Joins.asOfBackwardAgg("asof_slow", orders,
      leftKey = col("pcust"), rightKey = orders("cust"),
      leftTime = col("pd"), rightTime = orders("d"),
      leftPk = Seq("pid"), rightTieBreak = orders("okey"),
      "match_key" -> orders("okey"), "d2" -> orders("d"))
    val f = rowsOf(fast(probes))
    val s = rowsOf(slow(probes).select("pid", "match_key"))
    assert(f == s && f == Set(Seq(1L, 101L)),
      s"fast=$f slow=$s — tie on 2020-01-05 must keep key 101, probe 2/3 unmatched")
    // the fast path must actually be hash-aggregable: no SortAggregate
    val plan = fast(probes).queryExecution.executedPlan.toString
    assert(!plan.contains("SortAggregate") && !plan.contains("max_by"),
      s"fast path did not engage:\n$plan")
    // forward form: min over the encoding (earliest time, ties → lower
    // key) — probe 2020-01-02 lands on the tied 2020-01-05 pair
    val fwdProbes = Seq((1L, 1L, "2020-01-02"), (2L, 2L, "2020-02-01"))
      .toDF("pid", "pcust", "pd").withColumn("pd", to_date(col("pd")))
    val fwd = Joins.asOfForwardAgg("asof_fwd", orders,
      leftKey = col("pcust"), rightKey = orders("cust"),
      leftTime = col("pd"), rightTime = orders("d"),
      leftPk = Seq("pid"), rightTieBreak = orders("okey"),
      "match_key" -> orders("okey"))
    assert(rowsOf(fwd(fwdProbes)) == Set(Seq(1L, 100L), Seq(2L, 103L)),
      "forward tie on 2020-01-05 must keep the LOWER key 100")
    // loud guard: a negative key would corrupt the encoding — must raise
    val neg = Seq((-7L, 1L, "2020-01-05")).toDF("okey", "cust", "d")
      .withColumn("d", to_date(col("d")))
    val bad = Joins.asOfBackwardAgg("asof_bad", neg,
      leftKey = col("pcust"), rightKey = neg("cust"),
      leftTime = col("pd"), rightTime = neg("d"),
      leftPk = Seq("pid"), rightTieBreak = neg("okey"),
      "match_key" -> neg("okey"))
    val ex = intercept[Exception] { bad(probes).collect() }
    assert(ex.getMessage != null)
  }

  test("asOfForwardAgg picks the earliest right row at-or-after the left time") {
    val quotes = Seq(
      ("A", 10L, 1.0), ("A", 20L, 2.0), ("A", 30L, 3.0),
      ("B", 15L, 9.0)
    ).toDF("sym", "qt", "px")
    val trades = Seq(
      (1L, "A", 25L), (2L, "A", 30L), (3L, "B", 20L), (4L, "A", 35L)
    ).toDF("tid", "tsym", "tt")
    val stage = Joins.asOfForwardAgg("asof_fwd", quotes,
      leftKey = col("tsym"), rightKey = col("sym"),
      leftTime = col("tt"), rightTime = col("qt"),
      leftPk = Seq("tid"), rightTieBreak = col("px"),
      "qt" -> col("qt"), "px" -> col("px"))
    val out = stage(trades).select("tid", "qt", "px")
    // trade 1 (A@25) → next quote A@30; trade 2 (A@30) → A@30 (inclusive);
    // trade 3 (B@20) has no quote >= 20 → dropped; trade 4 (A@35) → dropped
    assert(rowsOf(out) == Set(Seq(1L, 30L, 3.0), Seq(2L, 30L, 3.0)))
  }

  test("asOfForwardAgg breaks time ties to the LOWER tiebreak") {
    val quotes = Seq(("A", 10L, 1.0), ("A", 10L, 5.0)).toDF("sym", "qt", "px")
    val trades = Seq((1L, "A", 10L)).toDF("tid", "tsym", "tt")
    val stage = Joins.asOfForwardAgg("asof_fwd", quotes,
      col("tsym"), col("sym"), col("tt"), col("qt"),
      Seq("tid"), rightTieBreak = col("px"), "px" -> col("px"))
    assert(stage(trades).select("px").head().getDouble(0) == 1.0) // min tiebreak wins
  }

  test("topKPerGroup keeps k rows per partition in order") {
    val df = Seq(("g1", 3), ("g1", 1), ("g1", 2), ("g2", 9)).toDF("g", "v")
    val out = Windows.topKPerGroup("top2", Seq(col("g")), Seq(col("v").desc), 2)(df)
    assert(rowsOf(out.select("g", "v", "rn")) ==
      Set(Seq("g1", 3, 1), Seq("g1", 2, 2), Seq("g2", 9, 1)))
  }

  test("global topK plans as TakeOrderedAndProject (no full sort at scale)") {
    val df = (1 to 1000).toDF("v")
    val out = Sorts.topK("top5", 5, col("v").desc)(df)
    val physical = out.queryExecution.executedPlan.toString
    assert(physical.contains("TakeOrderedAndProject"))
    assert(out.as[Int].collect().toSeq == Seq(1000, 999, 998, 997, 996))
  }

  test("agg with no keys is a global aggregate") {
    val df = (1 to 10).toDF("v")
    val out = Aggs.agg("sum", Nil, Seq(sum("v").as("s")))(df)
    assert(out.head().getLong(0) == 55)
  }
}
