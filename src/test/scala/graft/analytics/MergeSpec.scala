package graft.analytics

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MergeSpec extends SparkSpec {
  import spark.implicits._

  test("upsert updates matched keys, inserts new ones, keeps the rest") {
    val target = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("id", "tag", "v")
    val updates = Seq((2L, "B", 99.0), (4L, "d", 40.0))
      .toDF("id", "tag", "v")
    val merged = Merge.upsert(target, updates, Seq("id"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getDouble(2))).toMap
    assert(merged == Map(
      1L -> ("a", 10.0),
      2L -> ("B", 99.0),  // updated
      3L -> ("c", 30.0),
      4L -> ("d", 40.0))) // inserted
  }

  test("updates may set values to NULL (whole-row wins, not coalesce)") {
    val target = Seq((1L, "keep"), (2L, "old")).toDF("id", "tag")
    val updates = Seq((2L, null.asInstanceOf[String])).toDF("id", "tag")
    val merged = Merge.upsert(target, updates, Seq("id"))
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(merged == Map(1L -> Some("keep"), 2L -> None))
  }

  test("schema mismatch is rejected") {
    val target = Seq((1L, "a")).toDF("id", "tag")
    val updates = Seq((1L, 2.0)).toDF("id", "other")
    intercept[IllegalArgumentException](Merge.upsert(target, updates, Seq("id")))
  }

  test("one full-outer join, no window in the plan") {
    val target = Seq((1L, "a")).toDF("id", "tag")
    val updates = Seq((2L, "b")).toDF("id", "tag")
    val plan = Merge.upsert(target, updates, Seq("id")).queryExecution.optimizedPlan.toString
    assert(plan.contains("FullOuter"), plan)
    assert(!plan.toLowerCase.contains("window"), plan)
  }
}
