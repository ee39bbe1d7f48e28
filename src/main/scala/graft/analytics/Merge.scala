package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Batch merge (upsert) over frames — the MERGE INTO shape without a
  * transactional table format: rows from `updates` replace same-key rows
  * of `target`, keys only in `updates` insert, everything else carries
  * over.
  *
  * Plan shape: ONE full-outer shuffle join on the key columns with a
  * per-column `coalesce(updates, target)` projection — no window, no
  * second pass. At warehouse scale this is the standard incremental-load
  * step; pair with [[graft.sources.Bucketing]] on the key to make the
  * join Exchange-free when target and updates are co-bucketed.
  */
object Merge {

  /** `updates` must share `target`'s schema (checked). Update rows win
    * whole-row: every non-key column takes the update's value when the
    * key matched.
    */
  def upsert(target: DataFrame, updates: DataFrame, keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "merge needs at least one key column")
    require(target.columns.toSet == updates.columns.toSet,
      s"schema mismatch: target ${target.columns.mkString(",")} vs updates ${updates.columns.mkString(",")}")
    val t = target.as("t")
    // presence marker: "did an update row join here" must not be inferred
    // from key/value nullability (updates may carry null keys or
    // legitimately set values to NULL)
    val u = updates.withColumn("_upd", lit(true)).as("u")
    val cond = keys.map(k => col(s"t.$k") <=> col(s"u.$k")).reduce(_ && _)
    val nonKeys = target.columns.filterNot(keys.contains)
    t.join(u, cond, "full_outer")
      .select(
        keys.map(k =>
          when(col("u._upd").isNotNull, col(s"u.$k")).otherwise(col(s"t.$k")).as(k)) ++
          nonKeys.map(c =>
            when(col("u._upd").isNotNull, col(s"u.$c")).otherwise(col(s"t.$c")).as(c)): _*)
  }
}
