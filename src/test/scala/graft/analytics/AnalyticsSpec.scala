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
