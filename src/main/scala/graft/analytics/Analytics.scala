package graft.analytics

import graft.core._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.functions._

/** Analytic operator surface (`SURVEY.md §2.3`): the engine-level stages the
  * reference delegates to user functions but a real analytics engine must
  * provide. Every stage is a thin declarative wrapper over Spark built-ins
  * so Catalyst keeps pushdown / pruning / join-strategy / AQE — the engine
  * adds the uniform Stage face (identity, plan export, composition), not a
  * second optimizer.
  */
object Joins {

  /** Equi/theta join stage. `broadcastRight` hints the dimension side —
    * at 100 TB the small side MUST be broadcast or the shuffle dominates.
    */
  def join(name: String, right: DataFrame, cond: Column, how: String = "inner",
           broadcastRight: Boolean = false): Stage =
    new Stage {
      val id: StageId = StageId(name)
      def apply(df: DataFrame): DataFrame =
        df.join(if (broadcastRight) broadcast(right) else right, cond, how)
      override protected def kind: String = s"Join($how)"
    }

  def semi(name: String, right: DataFrame, cond: Column): Stage =
    join(name, right, cond, "left_semi")

  def anti(name: String, right: DataFrame, cond: Column): Stage =
    join(name, right, cond, "left_anti")

  /** As-of join (backward): for each left row, the single right row with
    * the greatest `rightTime <= leftTime` within the same key — Spark has
    * no built-in (`SURVEY.md §2.3`), so compose: equi-join on key with the
    * range predicate, then keep the per-left-row argmax via a window.
    *
    * Scale: the join is an equi-join on `key` (shuffle-partitioned both
    * sides, AQE-skew-handled); the window re-uses the same partitioning, so
    * the whole operator costs ONE shuffle of each input. Tie-break on
    * `rightTieBreak` keeps results deterministic.
    */
  def asOfBackward(name: String, right: DataFrame, leftKey: Column, rightKey: Column,
                   leftTime: Column, rightTime: Column, leftPk: Seq[String],
                   rightTieBreak: Column): Stage =
    new Stage {
      val id: StageId = StageId(name)
      def apply(df: DataFrame): DataFrame = {
        val joined = df.join(right, leftKey === rightKey && rightTime <= leftTime, "inner")
        val w = Window.partitionBy(leftPk.map(col): _*)
          .orderBy(rightTime.desc, rightTieBreak.desc)
        joined.withColumn("_asof_rn", row_number().over(w))
          .filter(col("_asof_rn") === 1)
          .drop("_asof_rn")
      }
      override protected def kind: String = "AsOfJoin"
    }

  /** As-of join, aggregation form: when only specific right-side values are
    * needed, `max_by(payload, struct(time, tiebreak))` replaces the window
    * — partial aggregation combines map-side BEFORE the shuffle, so the
    * post-join shuffle carries one row per (left-pk, partial) instead of
    * every joined candidate. Prefer this at scale; the window form when the
    * whole right row must survive.
    */
  def asOfBackwardAgg(name: String, right: DataFrame, leftKey: Column, rightKey: Column,
                      leftTime: Column, rightTime: Column, leftPk: Seq[String],
                      rightTieBreak: Column, payload: (String, Column)*): Stage =
    new Stage {
      val id: StageId = StageId(name)
      def apply(df: DataFrame): DataFrame = {
        val joined = df.join(right, leftKey === rightKey && rightTime <= leftTime, "inner")
        val ord = struct(rightTime, rightTieBreak)
        joined.groupBy(leftPk.map(col): _*)
          .agg(max_by(struct(payload.map { case (n, c) => c.as(n) }: _*), ord).as("_asof"))
          .select(leftPk.map(col) ++ payload.map { case (n, _) => col(s"_asof.$n").as(n) }: _*)
      }
      override protected def kind: String = "AsOfJoinAgg"
    }

  /** [[asOfBackwardAgg]] with a LOOKBACK TOLERANCE: only right rows in
    * the half-open window `(leftTime - lookback, leftTime]` match — rows
    * whose nearest predecessor is older than the tolerance get NO match
    * (stale quotes/profiles must not join forward in time-series
    * practice). As important at scale: the extra range predicate BOUNDS
    * the per-key candidate set the join materializes before the
    * map-side-combining aggregate — an unbounded as-of against a hot key
    * joins that key's entire history per probe row.
    */
  def asOfBackwardAggWithin(name: String, right: DataFrame, leftKey: Column,
                            rightKey: Column, leftTime: Column, rightTime: Column,
                            leftPk: Seq[String], rightTieBreak: Column,
                            lookback: Column, payload: (String, Column)*): Stage =
    new Stage {
      val id: StageId = StageId(name)
      def apply(df: DataFrame): DataFrame = {
        val joined = df.join(right, leftKey === rightKey &&
          rightTime <= leftTime && rightTime > leftTime - lookback, "inner")
        val ord = struct(rightTime, rightTieBreak)
        joined.groupBy(leftPk.map(col): _*)
          .agg(max_by(struct(payload.map { case (n, c) => c.as(n) }: _*), ord).as("_asof"))
          .select(leftPk.map(col) ++ payload.map { case (n, _) => col(s"_asof.$n").as(n) }: _*)
      }
      override protected def kind: String = "AsOfJoinAggWithin"
    }

  /** As-of join (forward): the EARLIEST right row with `rightTime >=
    * leftTime` per key — the "next event after" complement of
    * [[asOfBackwardAgg]]; same single-shuffle map-side-combining shape
    * (`min_by` instead of `max_by`), ties broken to the LOWER tiebreak.
    */
  def asOfForwardAgg(name: String, right: DataFrame, leftKey: Column, rightKey: Column,
                     leftTime: Column, rightTime: Column, leftPk: Seq[String],
                     rightTieBreak: Column, payload: (String, Column)*): Stage =
    new Stage {
      val id: StageId = StageId(name)
      def apply(df: DataFrame): DataFrame = {
        val joined = df.join(right, leftKey === rightKey && rightTime >= leftTime, "inner")
        val ord = struct(rightTime, rightTieBreak)
        joined.groupBy(leftPk.map(col): _*)
          .agg(min_by(struct(payload.map { case (n, c) => c.as(n) }: _*), ord).as("_asof"))
          .select(leftPk.map(col) ++ payload.map { case (n, _) => col(s"_asof.$n").as(n) }: _*)
      }
      override protected def kind: String = "AsOfJoinForwardAgg"
    }
}

object Aggs {

  /** Hash aggregation; Catalyst plans partial (map-side) + final
    * automatically — never pre-shuffle by hand.
    */
  def agg(name: String, keys: Seq[Column], aggs: Seq[Column]): Stage =
    Stage(StageId(name)) { df =>
      if (keys.isEmpty) df.agg(aggs.head, aggs.tail: _*)
      else df.groupBy(keys: _*).agg(aggs.head, aggs.tail: _*)
    }

  def rollup(name: String, keys: Seq[Column], aggs: Seq[Column]): Stage =
    Stage(StageId(name))(_.rollup(keys: _*).agg(aggs.head, aggs.tail: _*))

  def cube(name: String, keys: Seq[Column], aggs: Seq[Column]): Stage =
    Stage(StageId(name))(_.cube(keys: _*).agg(aggs.head, aggs.tail: _*))

  def distinct(name: String, cols: Seq[String] = Nil): Stage =
    Stage(StageId(name)) { df =>
      if (cols.isEmpty) df.distinct() else df.dropDuplicates(cols)
    }

  /** Pivot (wide aggregation). `values` must be explicit — the two-pass
    * value-discovery form runs an extra distinct job over the full input,
    * which at 100 TB is a silent second scan.
    */
  def pivot(name: String, keys: Seq[Column], pivotCol: String, values: Seq[Any],
            aggs: Seq[Column]): Stage =
    Stage(StageId(name))(
      _.groupBy(keys: _*).pivot(pivotCol, values).agg(aggs.head, aggs.tail: _*))
}

object Windows {

  /** Window-function stage: ranking/analytic expressions over a
    * partition/order/frame spec — a single shuffle on the partition keys.
    */
  def over(name: String, spec: WindowSpec, outs: (String, WindowSpec => Column)*): Stage =
    Stage(StageId(name)) { df =>
      outs.foldLeft(df) { case (d, (n, f)) => d.withColumn(n, f(spec)) }
    }

  /** Top-k rows per group — row_number over (partition, order) then filter;
    * the canonical scale-safe "first k" (no global sort, no collect).
    */
  def topKPerGroup(name: String, partition: Seq[Column], order: Seq[Column], k: Int,
                   rankCol: String = "rn"): Stage =
    Stage(StageId(name)) { df =>
      val w = Window.partitionBy(partition: _*).orderBy(order: _*)
      df.withColumn(rankCol, row_number().over(w)).filter(col(rankCol) <= k)
    }
}

object SetOps {
  def union(name: String, other: DataFrame): Stage =
    Stage(StageId(name))(_.unionByName(other, allowMissingColumns = true))
  def intersect(name: String, other: DataFrame): Stage =
    Stage(StageId(name))(_.intersect(other))
  def except(name: String, other: DataFrame): Stage =
    Stage(StageId(name))(_.except(other))
}

object Sorts {
  def sort(name: String, keys: Column*): Stage =
    Stage(StageId(name))(_.orderBy(keys: _*))

  /** Global top-k: Spark turns orderBy+limit into TakeOrderedAndProject —
    * a per-partition heap + driver merge of k rows, NOT a full sort. The
    * only safe global "sort" at 100 TB.
    */
  def topK(name: String, k: Int, keys: Column*): Stage =
    Stage(StageId(name))(_.orderBy(keys: _*).limit(k))

  def limit(name: String, n: Int): Stage = Stage(StageId(name))(_.limit(n))
}
