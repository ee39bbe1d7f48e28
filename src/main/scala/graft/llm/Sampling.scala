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

  /** The reproducible Gumbel noise behind weighted sampling WITHOUT
    * replacement: `−log10(−log10 u)` over the engine's closed-form
    * uniform `u = (pmod(xxhash64(id), 10^6) + 0.5) / 10^6`. Since
    * `−log10(−log10 u) = (G + ln ln 10)/ln 10` for the true standard
    * Gumbel `G = −ln(−ln u)` (spec-pinned identity, `DsirSpec`), a key
    * of `log10(w) + hashGumbel10(id)` is an affine map of the classic
    * `ln w + G` — so top-k under it IS Efraimidis–Spirakis / Gumbel-top-k
    * sampling without replacement, exactly, while staying replayable in
    * the DuckDB oracle through the ql15 hash chain + the log10 bridge.
    */
  def hashGumbel10(id: Column): Column = {
    val u = (pmod(xxhash64(id), lit(1000000L)).cast("double") + lit(0.5)) /
      lit(1000000.0)
    -log10(-log10(u))
  }

  /** Weighted sampling WITHOUT replacement (Efraimidis–Spirakis 2006 via
    * the Gumbel-top-k formulation): keep the top-`n` rows by
    * `log10(weight) + hashGumbel10(id)`, so each subset of size n is
    * drawn with the probability the sequential weighted scheme assigns —
    * the principled "sample 1M docs preferring high quality-score" step
    * ([[sampleByRates]] is the with-repetition sibling; this is the
    * without-replacement one). Deterministic given ids, replayable in
    * the oracle; ranking compares the DECIMAL(18,6)-rounded key (ties →
    * ascending id).
    *
    * NULL or non-positive weights raise loudly — a zero weight has
    * log10 = −∞ (it could silently never be sampled, hiding an upstream
    * scoring bug), the repo's loud-guard discipline.
    *
    * Scale: the key is a scan-riding projection; the global-n tail is a
    * map-side-bounded TakeOrdered (driver merge of n × partitions rows —
    * fine for dim-sized n; for fleet budgets use [[weightedSamplePerGroup]]
    * whose per-group window prunes map-side, or a threshold on the key
    * via [[percentileBucketsApprox]]).
    */
  def weightedSample(df: DataFrame, idCol: String, weightCol: String,
                     n: Int): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    df.withColumn("sample_key", weightedKey(col(idCol), col(weightCol)))
      .orderBy(col("sample_key").desc, col(idCol))
      .limit(n)
      .withColumn("sample_key", col("sample_key").cast("double"))
  }

  /** [[weightedSample]] per group: the top-`nPerGroup` rows of each
    * group by the same Gumbel key — one rank window whose
    * WindowGroupLimit prunes map-side, so no group ever materializes
    * beyond nPerGroup rows per task.
    */
  def weightedSamplePerGroup(df: DataFrame, groupCols: Seq[Column],
                             idCol: String, weightCol: String,
                             nPerGroup: Int): DataFrame = {
    require(nPerGroup >= 1, s"nPerGroup must be >= 1, got $nPerGroup")
    val w = Window.partitionBy(groupCols: _*)
      .orderBy(col("sample_key").desc, col(idCol))
    df.withColumn("sample_key", weightedKey(col(idCol), col(weightCol)))
      .withColumn("_smp_rn", row_number().over(w))
      .filter(col("_smp_rn") <= nPerGroup)
      .drop("_smp_rn")
      .withColumn("sample_key", col("sample_key").cast("double"))
  }

  private def weightedKey(id: Column, weight: Column): Column =
    (log10(when(weight.isNull || weight <= 0,
      raise_error(concat(lit("weightedSample: weight must be positive, got "),
        coalesce(weight.cast("string"), lit("NULL")))))
      .otherwise(weight.cast("double")))
      + hashGumbel10(id)).cast("decimal(18,6)")

  /** Per-stratum fractions via seeded `sampleBy` (deterministic for a
    * fixed seed AND input partitioning — prefer [[hashSample]] when the
    * partitioning itself may change).
    */
  def stratified(df: DataFrame, stratumCol: String,
                 fractions: Map[String, Double], seed: Long): DataFrame =
    df.stat.sampleBy(stratumCol, fractions, seed)

  /** Weighted mixture sampling WITH REPETITION — the "epochs per source"
    * step that turns per-source mixture weights (temperature-flattened
    * sampling ratios, domain up/down-weighting) into a concrete training
    * corpus. Each row of group g with rate r emits floor(r) copies plus
    * one more when its deterministic uniform draw lands under frac(r):
    * rate 2.25 means every row twice and a 25% hash-chosen quarter a
    * third time; rate 0.4 keeps a 40% subset once. Expected copies per
    * row = r exactly.
    *
    * Determinism is the [[hashSample]] discipline: the draw is
    * `pmod(xxhash64(id), 1e6)` — reproducible across runs, partitionings
    * and engines (the Q-L56 oracle replays it closed-form), and
    * growth-stable (adding rows never flips an existing row's draw).
    * The fractional threshold compares that integer against
    * `frac(rate)·1e6` computed in DECIMAL — exact, no float boundary.
    *
    * Rates are a USER-SUPPLIED (group, rate) DataFrame — a handful of
    * rows, the classic broadcast dim; groups absent from it are DROPPED
    * (a mixture spec is exhaustive by definition — emitting unlisted
    * sources at an implicit rate would silently distort the mixture).
    * Output adds a `copy` index (0-based) so downstream sharding/packing
    * sees distinct rows per repetition.
    *
    * Scale shape: broadcast-join + scan-riding copy arithmetic + a
    * bounded explode (ceil(rate) rows max per input row) — no shuffle
    * anywhere in the operator.
    */
  def sampleByRates(df: DataFrame, groupCol: String, idCol: String,
                    rates: DataFrame): DataFrame = {
    // loud-error discipline (ADVICE r11): `copy` is the operator's output
    // column and `_mix_*` are its temporaries — an input already carrying
    // one would be silently clobbered by the withColumn/join below; and a
    // rates dim without a `rate` column would fail deep in analysis with
    // an unattributable message.
    require(rates.columns.contains("rate"),
      s"sampleByRates: rates must carry a 'rate' column, got ${rates.columns.mkString(", ")}")
    val reserved = df.columns.filter(c => c == "copy" || c.startsWith("_mix_"))
    require(reserved.isEmpty,
      s"sampleByRates: input columns ${reserved.mkString(", ")} collide with " +
        "the operator's output/temporary names ('copy', '_mix_*') — rename them first")
    val r = broadcast(rates.select(col(groupCol).as("_mix_g"),
      col("rate").cast("decimal(12,6)").as("_mix_rate")))
    val u = pmod(xxhash64(col(idCol)), lit(1000000L))
    val frac = col("_mix_rate") % lit(1)
    df.join(r, df(groupCol) === col("_mix_g"))
      .withColumn("_mix_copies", floor(col("_mix_rate")).cast("long") +
        when(u < (frac * 1000000).cast("long"), 1L).otherwise(0L))
      .filter(col("_mix_copies") > 0)
      .withColumn("copy", explode(sequence(lit(0L), col("_mix_copies") - 1)))
      .drop("_mix_g", "_mix_rate", "_mix_copies")
  }

  /** Temperature-scaled mixture rates — the published multilingual /
    * multi-source mixing convention (mT5 §3.1, PaLM data mixtures):
    * group i gets sampling weight `n_i^alpha / Σ n_j^alpha`, so
    * `alpha = 1` reproduces natural proportions and `alpha → 0`
    * approaches uniform-over-groups; the returned per-group `rate` =
    * (budget · weight_i) / n_i feeds [[sampleByRates]] directly (rates
    * > 1 mean upsampling of small groups — exactly the low-resource
    * boost temperature sampling exists for).
    *
    * `sizes` is one row per group (e.g. `docs.groupBy(lang).count()` or
    * a token-count agg) — group-sized, so the Σ n^alpha aggregate and
    * the broadcast join back are both dim-sized; nothing corpus-sized
    * runs here. Zero/negative sizes raise (a rate against an empty
    * group is undefined, and a silent 0 would hide a broken upstream
    * count).
    */
  def mixtureRatesByTemperature(sizes: DataFrame, groupCol: String,
                                sizeCol: String, totalBudget: Double,
                                alpha: Double): DataFrame = {
    require(alpha > 0, s"alpha must be > 0 (alpha=1 is natural proportions), got $alpha")
    require(totalBudget > 0, s"totalBudget must be > 0, got $totalBudget")
    val n = when(col(sizeCol).isNull || col(sizeCol) <= 0,
      raise_error(concat(lit(s"mixtureRatesByTemperature: $sizeCol must be positive for group "),
        col(groupCol).cast("string"))).cast("double"))
      .otherwise(col(sizeCol).cast("double"))
    val weighted = sizes.select(col(groupCol), n.as("_n"),
      pow(n, lit(alpha)).as("_w"))
    val tot = weighted.agg(sum(col("_w")).as("_wsum"))
    weighted.crossJoin(broadcast(tot))
      .select(col(groupCol),
        (lit(totalBudget) * col("_w") / col("_wsum") / col("_n")).as("rate"))
  }

  /** Assign every row a training SHARD id such that consecutive documents
    * (in `idCol` order) pack into shards of ≈ `budgetTokens` tokens each —
    * the "fixed-token-count output files" step at the end of a training
    * data pipeline. `shard = exclusive-prefix-sum(tokens) div budget`, so
    * the assignment is a pure function of the id order and token counts:
    * deterministic across runs, partitionings and cluster sizes
    * (requires `idCol` unique and non-null — ties would make the prefix
    * order, and thus boundary rows' shards, arbitrary; pass
    * `validateIds = true` to fail fast on violations at the cost of one
    * extra validation job). NULL token counts contribute 0 tokens —
    * consistently in both the per-bucket prefix window and the bucket
    * totals.
    *
    * Scale shape — the classic TWO-PHASE distributed prefix sum, because a
    * naive `sum().over(Window.orderBy(id))` with no partition key drags
    * the whole corpus through ONE window partition (the single-task
    * bottleneck that kills global windows at 100 TB):
    * phase 1: bucket rows into contiguous id ranges and window INSIDE
    * each bucket — all buckets in parallel; phase 2: per-bucket token
    * totals (one tiny row per bucket) come to the driver, their running
    * sum gives each bucket's global offset, broadcast back as a 2-column
    * dim join.
    *
    * The bucket boundaries are approxQuantile cuts collected ONCE and
    * baked into the plan as literals, making the bucket id a PURE
    * FUNCTION of the id. That is what keeps the two phases consistent: an
    * earlier `repartitionByRange + spark_partition_id` form re-sampled
    * range boundaries per action, so the totals job and the final query
    * could cut the ranges differently — observed as off-by-one shards at
    * sf0.1 — and pinning it needed an eager localCheckpoint of the whole
    * corpus. Literal boundaries need no materialization at any scale.
    */
  def shardByTokenBudget(df: DataFrame, idCol: String, tokensCol: String,
                         budgetTokens: Long, partitions: Int = 0,
                         validateIds: Boolean = false): DataFrame = {
    require(budgetTokens > 0, "budgetTokens must be positive")
    if (validateIds) validateUniqueIds(df, idCol, "shardByTokenBudget")
    // integral DIV, not double division: global prefixes at 100 TB token
    // counts can pass 2^53 where float64 division would round the boundary
    globalTokenPrefix(df, idCol, tokensCol, partitions)
      .withColumn("shard", expr(s"_gprefix DIV ${budgetTokens}L"))
      .drop("_gprefix")
  }

  /** One extra count-style job (flag-gated — at 100 TB that is a full
    * scan, so opt-in): a duplicate or null id makes a prefix ORDER
    * ill-defined — boundary rows land in arbitrary shards/sequences with
    * no error — so callers that cannot prove uniqueness upstream get a
    * fail-fast instead of silent nondeterminism.
    */
  private def validateUniqueIds(df: DataFrame, idCol: String, op: String): Unit = {
    val r = df.agg(count(lit(1)).as("n"), count(col(idCol)).as("nonNull"),
      countDistinct(col(idCol)).as("distinct")).head()
    val (n, nonNull, distinct) = (r.getLong(0), r.getLong(1), r.getLong(2))
    require(nonNull == n, s"$op: ${n - nonNull} null '$idCol' values — ids must be non-null")
    require(distinct == n, s"$op: ${n - distinct} duplicate '$idCol' values — ids must be unique")
  }

  /** Global EXCLUSIVE prefix sum of `tokensCol` in `idCol` order, as the
    * `_gprefix` column — the two-phase distributed scan shared by
    * [[shardByTokenBudget]] and [[packTokenSequences]]. Phase 1 windows
    * inside approxQuantile-cut id buckets (all buckets in parallel — a
    * bare `Window.orderBy(id)` drags the corpus through ONE task); phase
    * 2 brings ≤ `partitions` per-bucket totals to the driver and
    * broadcasts their running sum back as each bucket's offset. Bucket
    * boundaries are LITERALS baked into the plan, so the bucket id is a
    * pure function of the id and both phases cut identically (a
    * repartitionByRange form re-sampled boundaries per action — observed
    * off-by-one shards at sf0.1). NULL token counts contribute 0,
    * consistently in the window and the totals.
    */
  private def globalTokenPrefix(df: DataFrame, idCol: String, tokensCol: String,
                                partitions: Int): DataFrame = {
    require(df.schema(idCol).dataType.isInstanceOf[org.apache.spark.sql.types.NumericType],
      s"prefix ordering cuts '$idCol' at quantile literals — numeric ids only")
    val spark = df.sparkSession
    val parts =
      if (partitions > 0) partitions
      else spark.conf.get("spark.sql.shuffle.partitions").toInt
    val bounds: Array[Double] =
      if (parts <= 1) Array.empty
      else df.stat.approxQuantile(idCol,
        (1 until parts).map(_.toDouble / parts).toArray, 0.001).distinct
    val pidExpr = bounds.foldLeft(lit(0)) { (acc, b) =>
      acc + when(col(idCol) > lit(b), 1).otherwise(0)
    }
    val marked = df.withColumn("_pid", pidExpr)
    val w = Window.partitionBy(col("_pid")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val prefixed = marked.withColumn("_prefix",
      coalesce(sum(col(tokensCol).cast("long")).over(w), lit(0L)))
    // phase 2: ≤ `parts` rows to the driver — same bounded-collect class
    // as IVF training / merge guards; deterministic because _pid is a
    // pure projection of the id. coalesce: sum() over an all-null bucket
    // is NULL, and an unguarded getLong would NPE on it
    val totals = marked.groupBy(col("_pid"))
      .agg(coalesce(sum(col(tokensCol).cast("long")), lit(0L)).as("_tot"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val pids = totals.keys.toSeq.sorted
    val offsets = pids.zip(pids.scanLeft(0L)((acc, p) => acc + totals(p)).init)
    import spark.implicits._
    val offsetDf = broadcast(offsets.toDF("_pid", "_off"))
    prefixed.join(offsetDf, Seq("_pid"))
      .withColumn("_gprefix", col("_prefix") + col("_off"))
      .drop("_pid", "_prefix", "_off")
  }

  /** Fixed-length SEQUENCE PACKING — the concat-and-chunk emission step
    * of a GPT-style training pipeline: documents (in `idCol` order) form
    * one conceptual token stream, cut into dense sequences of exactly
    * `seqLen` tokens with documents split across boundaries (no padding
    * — the standard causal-LM packing convention; pair with
    * [[TextAnalysis.tokenIdsBpe]] to materialize the ids this plan
    * addresses). Each output row is one (document, sequence) span:
    * `seq_id`, `doc_from`/`doc_to` (token half-open range within the
    * document) and `seq_off` (where that span starts inside the
    * sequence). Zero-token documents occupy no span and emit nothing.
    *
    * Work is the [[globalTokenPrefix]] two-phase scan plus a per-doc
    * explode of at most n/seqLen + 1 span rows — linear in corpus
    * tokens, no global window, deterministic for unique ids
    * (`validateIds = true` to fail fast otherwise). Integer arithmetic
    * throughout (`DIV`, never float), so the packing plan is
    * bit-reproducible and oracle-checkable (Q-L49).
    */
  def packTokenSequences(df: DataFrame, idCol: String, tokensCol: String,
                         seqLen: Long, partitions: Int = 0,
                         validateIds: Boolean = false): DataFrame = {
    require(seqLen > 0, "seqLen must be positive")
    if (validateIds) validateUniqueIds(df, idCol, "packTokenSequences")
    globalTokenPrefix(df, idCol, tokensCol, partitions)
      .withColumn("_n", coalesce(col(tokensCol).cast("long"), lit(0L)))
      .filter(col("_n") > 0L)
      .withColumn("_first", expr(s"_gprefix DIV ${seqLen}L"))
      .withColumn("_last", expr(s"(_gprefix + _n - 1) DIV ${seqLen}L"))
      .withColumn("seq_id", explode(sequence(col("_first"), col("_last"))))
      .withColumn("_tstart", greatest(col("_gprefix"), col("seq_id") * seqLen))
      .withColumn("_tend", least(col("_gprefix") + col("_n"),
        (col("seq_id") + 1L) * seqLen))
      .withColumn("doc_from", col("_tstart") - col("_gprefix"))
      .withColumn("doc_to", col("_tend") - col("_gprefix"))
      .withColumn("seq_off", col("_tstart") - col("seq_id") * seqLen)
      .drop("_gprefix", "_n", "_first", "_last", "_tstart", "_tend")
  }

  /** Deterministic DATA MIXING: cap each group (source / domain / lang) at
    * a per-group TOKEN budget — the "mix sources to a target token recipe"
    * step of a training-data pipeline. Within a group, documents are taken
    * in id-hash order (a fixed "random-looking" draw without rand(), the
    * same trick as [[perGroup]]) until the group's budget is exhausted:
    * keep iff the exclusive prefix-sum of tokens < budget. Assignment is a
    * pure function of (group, id, token counts) — deterministic across
    * runs, partitionings and cluster sizes, and a row never flips in/out
    * when OTHER groups change. NULL token counts contribute 0, matching
    * [[shardByTokenBudget]].
    *
    * Scale shape: a training mix has FEW groups (5–50 sources), so a
    * plain per-group window would drag each group — potentially most of
    * the corpus — through one window partition. Instead this runs the
    * TWO-PHASE prefix sum of [[shardByTokenBudget]] per group, with one
    * twist that removes the quantile sampling entirely: the order key is
    * `xxhash64(id)`, which is UNIFORM over the long range, so fixed
    * equal-width cuts of the hash space give balanced buckets as pure
    * literals — `bucket = hash >>> (64 - log2 n)` — no statistics job,
    * no re-sampling hazard. Windows run per (group, bucket) in parallel;
    * per-bucket token totals aggregate to ≤ groups × buckets tiny rows
    * whose per-group running sum — a window over that tiny aggregate, NOT
    * the corpus — is each bucket's offset, broadcast back as a dim join.
    * No driver collect anywhere, and no cross-subplan hazard: the bucket
    * id is a pure hash projection, so the totals subplan and the prefix
    * subplan can never disagree (the failure mode that bit the
    * checkpointed range-partitioning form of [[shardByTokenBudget]]).
    *
    * @param budgets        token budget per group value; groups absent
    *                       from the map get `defaultBudget`
    * @param defaultBudget  budget for unlisted groups (0 drops them)
    * @param buckets        hash-space buckets per group (power of two);
    *                       parallelism of the window phase
    */
  def takeByTokenBudget(df: DataFrame, groupCol: String, idCol: String,
                        tokensCol: String, budgets: Map[String, Long],
                        defaultBudget: Long = 0L, buckets: Int = 32): DataFrame = {
    require(budgets.values.forall(_ >= 0L) && defaultBudget >= 0L,
      "token budgets must be non-negative")
    require(buckets > 0 && (buckets & (buckets - 1)) == 0, "buckets must be a power of two")
    val budgetCol = budgets.foldLeft(lit(defaultBudget)) {
      case (acc, (g, b)) => when(col(groupCol) === lit(g), lit(b)).otherwise(acc)
    }
    // bucket = top log2(buckets) bits of the hash. XOR the sign bit (never
    // overflows — an ADD would throw under ANSI) so ascending bucket id
    // aligns with ascending SIGNED hash, the window's sort order.
    // NB: a 64-bit shift is mod-64 in the JVM — shift-by-64 is a no-op,
    // so the single-bucket case must short-circuit to literal 0
    val shift = 64 - Integer.numberOfTrailingZeros(buckets)
    val bucketCol =
      if (buckets == 1) lit(0)
      else shiftrightunsigned(col("_mix_h").bitwiseXOR(lit(Long.MinValue)), shift).cast("int")
    val marked = df
      .withColumn("_mix_h", xxhash64(col(idCol)))
      .withColumn("_mix_b", bucketCol)
    val w = Window.partitionBy(col(groupCol), col("_mix_b"))
      .orderBy(col("_mix_h"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val prefixed = marked.withColumn("_mix_prefix",
      coalesce(sum(col(tokensCol).cast("long")).over(w), lit(0L)))
    // phase 2: per-(group, bucket) totals are ≤ groups × buckets rows —
    // window them per group (trivially small) for the exclusive bucket
    // offsets, then broadcast back
    val ow = Window.partitionBy(col("_mix_g")).orderBy(col("_mix_b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsetDf = broadcast(
      marked.groupBy(col(groupCol).as("_mix_g"), col("_mix_b").as("_mix_ob"))
        .agg(coalesce(sum(col(tokensCol).cast("long")), lit(0L)).as("_tot"))
        .withColumnRenamed("_mix_ob", "_mix_b")
        .withColumn("_mix_off", coalesce(sum(col("_tot")).over(ow), lit(0L)))
        .select(col("_mix_g"), col("_mix_b").as("_mix_ob"), col("_mix_off")))
    prefixed
      .join(offsetDf, col(groupCol) <=> col("_mix_g") && col("_mix_b") === col("_mix_ob"))
      .filter(col("_mix_off") + col("_mix_prefix") < budgetCol)
      .drop("_mix_h", "_mix_b", "_mix_prefix", "_mix_g", "_mix_ob", "_mix_off")
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

  /** CCNet-style per-group percentile bucketing — the head/middle/tail
    * split the published pipeline applies per LANGUAGE on a model score
    * (there: wiki-LM perplexity, lower = better; compose with
    * [[TextAnalysis.lmScore]] or any score column). EXACT rank form:
    * `rank` = row_number ordered by (score asc, id asc) within the
    * group, bucket cuts as integer arithmetic (`rank·den ≤ n·num`), so
    * assignment is bit-reproducible and oracle-checkable (Q-L47). Emits
    * the input plus (rank_in_group, n_group, bucket).
    *
    * Scale boundary, stated plainly: the exact form is one sort shuffle
    * PARTITIONED BY GROUP — at 100 TB the dominant language lands on one
    * task's sort (per-group global order is inherently serial). That is
    * fine for evaluation slices and mid-size corpora; for the full-crawl
    * pass use [[percentileBucketsApprox]], which replaces the sort with
    * one aggregation of t-digest cuts per group broadcast back over the
    * scan — skew-free, at the cost of approximate boundaries.
    */
  def percentileBuckets(df: DataFrame, groupCol: String, scoreCol: String,
                        idCol: String, lowNum: Int = 1, highNum: Int = 2,
                        den: Int = 3): DataFrame = {
    require(0 < lowNum && lowNum <= highNum && highNum <= den, "need 0 < low ≤ high ≤ den")
    // nulls LAST: a score-less document (lmScore of an empty doc is
    // NULL) must land in 'tail', not rank 1 = 'head' (Spark's bare asc
    // is nulls-first; DuckDB's ASC default is nulls-last — this also
    // keeps the Q-L47 oracle order rule aligned if scores go null)
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col(scoreCol).asc_nulls_last, col(idCol).asc)
    val wn = Window.partitionBy(col(groupCol))
    df.withColumn("rank_in_group", row_number().over(w).cast("long"))
      .withColumn("n_group", count(lit(1)).over(wn))
      .withColumn("bucket",
        when(col("rank_in_group") * den <= col("n_group") * lowNum, "head")
          .when(col("rank_in_group") * den <= col("n_group") * highNum, "middle")
          .otherwise("tail"))
  }

  /** The corpus-scale form of [[percentileBuckets]]: per-group
    * `approx_percentile` cut points (ONE aggregation riding the scan, no
    * per-group sort, immune to language skew) broadcast back and compared
    * against the score. Boundary rows may land one bucket off versus the
    * exact form — the documented trade every approximate-quantile
    * pipeline makes; `accuracy` is the t-digest knob. TIES diverge by
    * definition, not by approximation: a value cut sweeps a whole tied
    * band into one bucket where the exact form's rank order splits it —
    * on heavily banded scores (e.g. [[TextAnalysis.qualityScore]]) the
    * two disagree wholesale (spec-pinned); on continuous model scores
    * (perplexity, the CCNet case — which itself cuts by VALUE, this
    * form's semantics) they agree to t-digest wobble.
    */
  def percentileBucketsApprox(df: DataFrame, groupCol: String, scoreCol: String,
                              lowFrac: Double = 1.0 / 3, highFrac: Double = 2.0 / 3,
                              accuracy: Int = 10000): DataFrame = {
    val cuts = df.groupBy(col(groupCol).as("_pb_g"))
      .agg(approx_percentile(col(scoreCol), array(lit(lowFrac), lit(highFrac)),
        lit(accuracy)).as("_pb_cuts"))
    // null-safe join: a NULL group still has cut points (groupBy keeps
    // the null group) — a plain === would drop its rows to the bare
    // otherwise-branch ('tail') instead of bucketing them
    df.join(broadcast(cuts), col(groupCol) <=> col("_pb_g"), "left")
      .withColumn("bucket",
        when(col(scoreCol) <= element_at(col("_pb_cuts"), 1), "head")
          .when(col(scoreCol) <= element_at(col("_pb_cuts"), 2), "middle")
          .otherwise("tail"))
      .drop("_pb_g", "_pb_cuts")
  }
}
