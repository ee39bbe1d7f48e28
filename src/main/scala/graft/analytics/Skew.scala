package graft.analytics

import graft.core._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation (`SURVEY.md §7.4.6`, builder brief: "skewed keys →
  * salting or AQE skew-join").
  *
  * First line of defense is AQE's skew-join split (on by default); this
  * helper covers the case AQE can't fix — a join key so hot that one
  * logical key exceeds a single task even after splitting, e.g. the
  * null/default key of a fact table.
  *
  * The salt is DETERMINISTIC (hash of the whole fact row, mod factor), not
  * `rand()` — task retries must not re-deal rows or results become
  * non-reproducible under failure.
  */
object Skew {

  /** Salted equi-join: the big (skewed) side gets a per-row deterministic
    * salt in [0, factor); the small side is exploded ×factor so every
    * (key, salt) bucket finds its match. Join cardinality is unchanged;
    * the hot key's rows spread over `factor` tasks.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
                 factor: Int, how: String = "inner"): DataFrame = {
    require(factor >= 1)
    val saltedBig = big.withColumn("_salt",
      pmod(xxhash64(big.columns.map(col).toIndexedSeq: _*), lit(factor)).cast("int"))
    val explodedSmall = small.withColumn("_salt",
      explode(sequence(lit(0), lit(factor - 1))))
    saltedBig.join(explodedSmall, keys :+ "_salt", how).drop("_salt")
  }

  /** Two-phase aggregation for skewed group keys with non-algebraic
    * aggregates (e.g. collect-heavy). For plain sums/counts Catalyst's
    * partial aggregation already does this — use `Aggs.agg`.
    *
    * Phase 1 groups by (keys, salt) shrinking each hot key into ≤factor
    * partials; phase 2 merges partials per key.
    */
  def twoPhaseAgg(df: DataFrame, keys: Seq[String], factor: Int,
                  phase1: Seq[Column], phase2: Seq[Column]): DataFrame = {
    val salted = df.withColumn("_salt",
      pmod(xxhash64(df.columns.map(col).toIndexedSeq: _*), lit(factor)).cast("int"))
    salted.groupBy((keys :+ "_salt").map(col): _*)
      .agg(phase1.head, phase1.tail: _*)
      .groupBy(keys.map(col): _*)
      .agg(phase2.head, phase2.tail: _*)
  }
}
