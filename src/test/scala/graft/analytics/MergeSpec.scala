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

  test("dup-key update batch: dedupOrder keeps one deterministic winner per key") {
    val target = Seq((1L, "a", 10.0)).toDF("id", "tag", "v")
    val dupBatch = Seq((1L, "x", 1.0), (1L, "y", 2.0), (2L, "z", 3.0))
      .toDF("id", "tag", "v")
    // without the guard the full-outer join fans out: 2 rows for key 1
    assert(Merge.upsert(target, dupBatch, Seq("id")).filter(col("id") === 1).count() == 2)
    val merged = Merge.upsert(target, dupBatch, Seq("id"), dedupOrder = Some(col("v")))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getDouble(2))).toMap
    assert(merged == Map(1L -> ("y", 2.0), 2L -> ("z", 3.0))) // max v wins per key
  }

  test("dedupOrder ties resolve deterministically across partitionings") {
    val target = Seq((1L, "a", 10.0)).toDF("id", "tag", "v")
    // two rows tie on the ordering column — the winner must not depend on
    // partitioning or merge order
    val tieBatch = Seq((1L, "x", 5.0), (1L, "y", 5.0)).toDF("id", "tag", "v")
    def winner(parts: Int) =
      Merge.upsert(target, tieBatch.repartition(parts), Seq("id"), dedupOrder = Some(col("v")))
        .collect().map(r => r.getString(1)).toSeq.sorted
    val w1 = winner(1)
    assert(w1 == winner(2) && w1 == winner(7), "tie winner changed with partitioning")
  }

  test("dedupOrder tolerates map columns (tie-break hash skips unhashable types)") {
    val target = Seq((1L, "a", Map("k" -> 1))).toDF("id", "tag", "m")
    val batch = Seq((1L, "x", Map("k" -> 2)), (1L, "y", Map("k" -> 3))).toDF("id", "tag", "m")
    val merged = Merge.upsert(target, batch, Seq("id"), dedupOrder = Some(col("tag")))
    assert(merged.count() == 1)
    assert(merged.head().getString(1) == "y") // max tag wins
  }

  test("requireUniqueKeys throws on duplicate keys, passes on unique") {
    val dup = Seq((1L, "x"), (1L, "y")).toDF("id", "tag")
    val ok = Seq((1L, "x"), (2L, "y")).toDF("id", "tag")
    val e = intercept[IllegalArgumentException](Merge.requireUniqueKeys(dup, Seq("id")))
    assert(e.getMessage.contains("duplicate key"))
    Merge.requireUniqueKeys(ok, Seq("id"))
  }

  test("scd2 closes the open version and appends the update as current") {
    def ts(d: Int) = java.sql.Timestamp.valueOf(f"2024-01-$d%02d 00:00:00")
    val target = Seq(
      (1L, "v1", ts(1), ts(5), false), // closed history for key 1
      (1L, "v2", ts(5), null.asInstanceOf[java.sql.Timestamp], true),
      (2L, "w1", ts(2), null.asInstanceOf[java.sql.Timestamp], true)
    ).toDF("id", "attr", "valid_from", "valid_to", "is_current")
    val updates = Seq((1L, "v3", ts(9))).toDF("id", "attr", "eff")
    val out = Merge.scd2(target,
      updates.select(col("id"), col("attr")), Seq("id"),
      effective = lit(ts(9)))
    val rows = out.collect().map(r =>
      (r.getLong(0), r.getString(1), Option(r.getTimestamp(3)), r.getBoolean(4))).toSet
    assert(rows == Set(
      (1L, "v1", Some(ts(5)), false),  // untouched history
      (1L, "v2", Some(ts(9)), false),  // closed at the effective time
      (1L, "v3", None, true),          // new current version
      (2L, "w1", None, true)))         // untouched other key
  }

  test("one full-outer join, no window in the plan") {
    val target = Seq((1L, "a")).toDF("id", "tag")
    val updates = Seq((2L, "b")).toDF("id", "tag")
    val plan = Merge.upsert(target, updates, Seq("id")).queryExecution.optimizedPlan.toString
    assert(plan.contains("FullOuter"), plan)
    assert(!plan.toLowerCase.contains("window"), plan)
  }
}
