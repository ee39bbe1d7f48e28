package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
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
    *
    * PRECONDITION: one update row per key — a duplicate key would fan out
    * through the full-outer join into duplicate output rows. Pass
    * `dedupOrder` to enforce it in-plan (deterministic `max_by` keeps the
    * greatest row per key by that ordering — no extra job), or call
    * [[requireUniqueKeys]] for an explicit one-job validation when batches
    * are supposed to already be unique.
    */
  def upsert(target: DataFrame, updates: DataFrame, keys: Seq[String],
             dedupOrder: Option[Column] = None): DataFrame = {
    require(keys.nonEmpty, "merge needs at least one key column")
    require(target.columns.toSet == updates.columns.toSet,
      s"schema mismatch: target ${target.columns.mkString(",")} vs updates ${updates.columns.mkString(",")}")
    val updates1 = dedupOrder match {
      case Some(ord) =>
        val allCols = updates.columns
        // Tie-break `ord` by a content hash so max_by is deterministic
        // under any partitioning: two rows tying on `ord` always resolve
        // the same way, and a residual tie means the hashed columns are
        // identical. Spark forbids hashing MapType (at any nesting), so
        // the hash covers only hashable columns; rows differing solely in
        // map columns at an `ord` tie remain order-dependent — unavoidable
        // without an order on maps.
        import org.apache.spark.sql.types.{ArrayType, DataType, MapType, StructType}
        def hasMap(dt: DataType): Boolean = dt match {
          case _: MapType    => true
          case s: StructType => s.fields.exists(f => hasMap(f.dataType))
          case a: ArrayType  => hasMap(a.elementType)
          case _             => false
        }
        val hashable = updates.schema.fields.collect {
          case f if !hasMap(f.dataType) => f.name
        }
        val order =
          if (hashable.isEmpty) ord
          else struct(ord, xxhash64(struct(hashable.toIndexedSeq.map(col): _*)))
        updates.groupBy(keys.map(col): _*)
          .agg(max_by(struct(allCols.map(col): _*), order).as("_r"))
          .select(allCols.map(c => col(s"_r.$c").as(c)): _*)
      case None => updates
    }
    val t = target.as("t")
    // presence marker: "did an update row join here" must not be inferred
    // from key/value nullability (updates may carry null keys or
    // legitimately set values to NULL)
    val u = updates1.withColumn("_upd", lit(true)).as("u")
    val cond = keys.map(k => col(s"t.$k") <=> col(s"u.$k")).reduce(_ && _)
    val nonKeys = target.columns.filterNot(keys.contains)
    t.join(u, cond, "full_outer")
      .select(
        keys.map(k =>
          when(col("u._upd").isNotNull, col(s"u.$k")).otherwise(col(s"t.$k")).as(k)) ++
          nonKeys.map(c =>
            when(col("u._upd").isNotNull, col(s"u.$c")).otherwise(col(s"t.$c")).as(c)): _*)
  }

  /** Explicit validation of the one-row-per-key precondition shared by
    * [[upsert]] and [[scd2]] — ONE bounded Spark job (limit-1 on the
    * violating keys). Callers opt in; the merge itself stays action-free.
    */
  def requireUniqueKeys(updates: DataFrame, keys: Seq[String]): Unit = {
    val dup = updates.groupBy(keys.map(col): _*).count()
      .filter(col("count") > 1).limit(1).collect()
    if (dup.nonEmpty)
      throw new IllegalArgumentException(
        s"updates carry duplicate key ${dup.head.toSeq.init.mkString("(", ",", ")")}: " +
          "one row per key required — pre-dedup with dedupOrder or fix the batch")
  }

  /** SCD type-2 apply: close the current version of every updated key
    * (valid_to = the update's effective time, no longer current) and
    * append the update as the new open version. History rows and
    * untouched keys pass through.
    *
    * `updates` must have one row per key (enforce upstream with
    * `max_by(effective)` if batches can carry several versions) and share
    * `target`'s business columns; `target` additionally carries
    * `valid_from/valid_to/is_current`. Plan: one left join of target
    * against the update keys + one union — both shuffle on the key.
    */
  def scd2(target: DataFrame, updates: DataFrame, keys: Seq[String],
           effective: Column,
           validFrom: String = "valid_from", validTo: String = "valid_to",
           isCurrent: String = "is_current"): DataFrame = {
    require(keys.nonEmpty, "scd2 needs at least one key column")
    val bizCols = target.columns.filterNot(Seq(validFrom, validTo, isCurrent).contains)
    require(bizCols.toSet == updates.columns.toSet,
      s"updates must carry exactly the business columns ${bizCols.mkString(",")}")
    val updKeyed = updates.select(
      (keys.map(k => col(k).as(s"_uk_$k")) :+ effective.as("_eff")): _*)
    val joinCond = keys.map(k => col(k) <=> col(s"_uk_$k")).reduce(_ && _)
    val joined = target.join(updKeyed, joinCond, "left")
    val closed = joined.select(
      (bizCols.map(col) ++ Seq(
        col(validFrom),
        // close ONLY the open version of an updated key
        when(col(isCurrent) && col("_eff").isNotNull, col("_eff"))
          .otherwise(col(validTo)).as(validTo),
        when(col("_eff").isNotNull, lit(false)).otherwise(col(isCurrent)).as(isCurrent))): _*)
    val opened = updates.select(
      (bizCols.map(col) ++ Seq(
        effective.as(validFrom),
        lit(null).cast(target.schema(validTo).dataType).as(validTo),
        lit(true).as(isCurrent))): _*)
    closed.unionByName(opened)
  }
}
