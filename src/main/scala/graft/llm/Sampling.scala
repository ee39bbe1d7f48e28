package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sampling operators for training-data pipelines.
  *
  * The scale constraint: a sample must be REPRODUCIBLE — the same rows
  * selected on every run, every partitioning, every engine — or dataset
  * versions drift between pipeline stages. `rand()`-based sampling
  * violates that (per-partition seeds shift when the input repartitions),
  * so the primitives here key off content hashes instead.
  */
object Sampling {

  /** Deterministic ~keepPerMille/1000 sample by id hash: a pure filter
    * (pushes to the scan, no shuffle), stable across runs and
    * partitionings.
    */
  def hashSample(df: DataFrame, idCol: String, keepPerMille: Int): DataFrame = {
    require(keepPerMille >= 0 && keepPerMille <= 1000, "keepPerMille in [0, 1000]")
    df.filter(pmod(xxhash64(col(idCol)), lit(1000L)) < keepPerMille)
  }

  /** Exactly `n` rows per group, chosen deterministically by id-hash order
    * (a fixed "random-looking" draw without rand()): one shuffle on the
    * group key.
    */
  def perGroup(df: DataFrame, groupCols: Seq[Column], idCol: String, n: Int): DataFrame = {
    val w = Window.partitionBy(groupCols: _*)
      .orderBy(xxhash64(col(idCol)), col(idCol))
    df.withColumn("_smp_rn", row_number().over(w))
      .filter(col("_smp_rn") <= n)
      .drop("_smp_rn")
  }

  /** Per-stratum fractions via seeded `sampleBy` (deterministic for a
    * fixed seed AND input partitioning — prefer [[hashSample]] when the
    * partitioning itself may change).
    */
  def stratified(df: DataFrame, stratumCol: String,
                 fractions: Map[String, Double], seed: Long): DataFrame =
    df.stat.sampleBy(stratumCol, fractions, seed)
}
