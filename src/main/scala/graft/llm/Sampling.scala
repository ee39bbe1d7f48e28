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

  /** Assign every row a training SHARD id such that consecutive documents
    * (in `idCol` order) pack into shards of ≈ `budgetTokens` tokens each —
    * the "fixed-token-count output files" step at the end of a training
    * data pipeline. `shard = exclusive-prefix-sum(tokens) div budget`, so
    * the assignment is a pure function of the id order and token counts:
    * deterministic across runs, partitionings and cluster sizes
    * (requires `idCol` unique — ties would make the prefix order, and
    * thus boundary rows' shards, arbitrary).
    *
    * Scale shape — the classic TWO-PHASE distributed prefix sum, because a
    * naive `sum().over(Window.orderBy(id))` with no partition key drags
    * the whole corpus through ONE window partition (the single-task
    * bottleneck that kills global windows at 100 TB):
    * phase 1: range-partition by id (contiguous id ranges, so partition
    * rank = global chunk order) and window INSIDE each partition — all
    * partitions in parallel; phase 2: per-partition token totals (one tiny
    * row per partition) come to the driver, their running sum gives each
    * partition's global offset, broadcast back as a 2-column dim join.
    * Range boundaries come from sampling, but the result never depends on
    * WHERE the cuts land — offset + local prefix is the same global
    * prefix regardless — so sampling nondeterminism cannot leak into the
    * output.
    */
  def shardByTokenBudget(df: DataFrame, idCol: String, tokensCol: String,
                         budgetTokens: Long, partitions: Int = 0): DataFrame = {
    require(budgetTokens > 0, "budgetTokens must be positive")
    val spark = df.sparkSession
    val parts =
      if (partitions > 0) partitions
      else spark.conf.get("spark.sql.shuffle.partitions").toInt
    // MATERIALIZE the partitioning once (eager localCheckpoint):
    // repartitionByRange picks boundaries by sampling, and separate
    // actions re-plan with fresh sample seeds — phase 2's totals would be
    // computed against DIFFERENT ranges than the final query's, silently
    // skewing every offset (observed as off-by-one shards at sf0.1).
    // Both phases below must read the same materialized blocks.
    val ranged = df.repartitionByRange(parts, col(idCol))
      .sortWithinPartitions(col(idCol))
      .withColumn("_pid", spark_partition_id())
      .localCheckpoint(true)
    val w = Window.partitionBy(col("_pid")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val prefixed = ranged.withColumn("_prefix",
      coalesce(sum(col(tokensCol).cast("long")).over(w), lit(0L)))
    // phase 2: ≤ `parts` rows to the driver — same bounded-collect class
    // as IVF training / merge guards
    val totals = prefixed.groupBy(col("_pid"))
      .agg(sum(col(tokensCol).cast("long")).as("_tot"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val pids = totals.keys.toSeq.sorted
    val offsets = pids.zip(pids.scanLeft(0L)((acc, p) => acc + totals(p)).init)
    import spark.implicits._
    val offsetDf = broadcast(offsets.toDF("_pid", "_off"))
    // integral DIV, not double division: global prefixes at 100 TB token
    // counts can pass 2^53 where float64 division would round the boundary
    prefixed.join(offsetDf, Seq("_pid"))
      .withColumn("shard", expr(s"(_prefix + _off) DIV ${budgetTokens}L"))
      .drop("_pid", "_prefix", "_off")
  }

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
