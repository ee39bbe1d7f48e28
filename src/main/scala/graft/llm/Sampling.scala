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

  /** Deterministic named split (train/val/test): every row gets a bucket
    * label by id hash, proportional to `weights`. Unlike `randomSplit`,
    * assignment is a pure projection — stable across runs, partitionings
    * and cluster sizes, and the same row NEVER moves between splits when
    * the corpus grows (the property that prevents test-set leakage across
    * dataset versions). Weights are normalized; `seed` salts the hash so
    * independent splits of the same corpus decorrelate.
    */
  def hashSplit(df: DataFrame, idCol: String, weights: Seq[(String, Double)],
                seed: Long = 42L, as: String = "split"): DataFrame = {
    require(weights.nonEmpty && weights.forall(_._2 > 0), "positive weights required")
    val total = weights.map(_._2).sum
    val u = pmod(xxhash64(col(idCol), lit(seed)), lit(1000000L)).cast("double") / 1000000.0
    val cumulative = weights.scanLeft(0.0) { case (acc, (_, w)) => acc + w / total }.tail
    val expr = weights.zip(cumulative).init.foldRight(lit(weights.last._1): Column) {
      case (((name, _), cut), acc) => when(u < cut, lit(name)).otherwise(acc)
    }
    df.withColumn(as, expr)
  }
}
