package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Named end-to-end compositions of the library's measured pieces — the
  * same pattern as [[Dedup.semanticDedup]] (IVF → clusters → keep-best),
  * one level up: the whole published pre-training corpus recipe in one
  * call. Every stage is individually oracle-checked or spec-pinned
  * elsewhere; these entry points pin that they COMPOSE (`PipelinesSpec`)
  * and give a user the one-call baseline a reference user expects.
  */
object Pipelines {

  /** The baseline pre-training corpus pass, in the published order
    * (C4 → Gopher quality + repetition → PII scrub → MinHash fuzzy
    * dedup keep-best → CCNet per-language percentile buckets):
    *
    *  1. `normalizeText` (NFC, control strip, whitespace collapse).
    *  2. Page gates on the RAW normalized page: ALL of
    *     `gopherQualityFlags`, `gopherRepetitionFlags` and `c4DocFlags`
    *     must hold (a brace or "lorem ipsum" on a line the line rules
    *     would drop still condemns the page). The batteries ride the
    *     scan (the repetition n-gram half is the fused native
    *     expression); one narrow broadcast join brings the
    *     line/paragraph stats back. Survivors then optionally pass the
    *     C4 line rules (`c4CleanLines` — off for corpora that are not
    *     sentence-shaped).
    *  3. `redactPii` on survivors (URLs → emails → IPv4 → phones).
    *  4. Fuzzy dedup: `minHashLshCandidates` at `minJaccard`, clusters
    *     resolved by pointer jumping, one survivor per cluster by
    *     highest `qualityScore` (ties → min id).
    *  5. `percentileBuckets` per `langCol` on the quality score
    *     (head = best third); `dropTail = true` applies the CCNet cut.
    *
    * Emits (id, lang, redacted text, n_tokens, score, bucket) — feed
    * the survivors to [[Sampling.packTokenSequences]] /
    * [[TextAnalysis.tokenIdsBpe]] for the id-shard emission step.
    *
    * Scale posture is inherited, not re-invented: every stage here is
    * the measured operator (scan-riding batteries, banded LSH — never
    * all-pairs, O(log n) pointer jumping, and the percentile stage's
    * per-language sort boundary is documented on
    * [[Sampling.percentileBuckets]] with the approx form as the
    * full-crawl alternative).
    *
    * `hashedTokenIds` switches the MinHash stage onto md5-derived 60-bit
    * token ids ([[Dedup.tokenIds64]]) instead of raw token strings —
    * identical dedup semantics (a 2^-60 collision only ever MERGES two
    * tokens) on the closed-form hash basis that makes the whole pipeline
    * replayable by an external SQL oracle (the Q-L6 technique, applied
    * here so Q-L50 hash-checks end to end), and cheaper at scale: each
    * of the 64 slot hashes drops from multi-block string hashing to one
    * 8-byte block.
    */
  def pretrainCorpus(docs: DataFrame, idCol: String = "doc_id",
                     textCol: String = "text", langCol: String = "lang",
                     useC4Lines: Boolean = true,
                     minJaccard: Double = 0.7,
                     dropTail: Boolean = false,
                     materialize: Boolean = true,
                     hashedTokenIds: Boolean = false): DataFrame = {
    // 1. normalize. The C4 LINE rules apply to survivors AFTER the page
    // gates — the gates must see the RAW page (a brace or "lorem ipsum"
    // on a line the line rules would drop still condemns the page, per
    // the paper and c4DocFlags' contract; ok_sentences already counts
    // sentences post-clean internally).
    val normed = docs.withColumn(textCol, TextAnalysis.normalizeText(col(textCol)))

    // 2. page gates — flag columns ride the scan; repetition stats join
    // back narrow
    val q = TextAnalysis.gopherQualityFlags(col(textCol))
    val c4 = TextAnalysis.c4DocFlags(col(textCol))
    // PERSISTED: the gates close the pipeline's expensive prefix (NFC +
    // two flag batteries over the FULL corpus) and shrink it; everything
    // downstream re-reads the survivors several times — the repetition
    // branch + its semi-join, both sides of the banded signature
    // self-join, the cluster joins, the bucket window. Without the cut
    // each re-derivation re-ran the whole prefix: measured 66 s → 6 s at
    // sf0.1. MEMORY_AND_DISK so a large survivor set spills, not OOMs;
    // released deterministically below when `materialize` is on.
    val qualityOk = normed
      .withColumn("_q", q).withColumn("_c4", c4)
      .filter(col("_q.ok_length") && col("_q.ok_word_len") && col("_q.ok_symbols") &&
        col("_q.ok_bullets") && col("_q.ok_ellipsis") && col("_q.ok_alpha") &&
        col("_c4.ok_sentences") && col("_c4.ok_no_braces") && col("_c4.ok_no_lorem"))
      .drop("_q", "_c4")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val repFlags = TextAnalysis.gopherRepetitionFlags(
      TextAnalysis.gopherRepetitionStats(qualityOk, idCol, textCol))
    val repOkIds = repFlags.filter(
      repFlags.columns.filter(_.startsWith("ok_")).map(col).reduce(_ && _))
      .select(col("doc_id").as(idCol))
    val gated = qualityOk.join(repOkIds, Seq(idCol), "left_semi")
    val lined =
      if (useC4Lines) gated.withColumn(textCol, TextAnalysis.c4CleanLines(col(textCol)))
      else gated

    // 3. PII scrub + score — cheap projections over the cached survivors
    val scrubbed = lined
      .withColumn(textCol, TextAnalysis.redactPii(col(textCol)))
      .withColumn("score", TextAnalysis.qualityScore(col(textCol)))

    // 4. fuzzy dedup, keep the best-scored copy
    val pairs = Dedup.minHashLshCandidates(scrubbed, idCol, textCol,
      minJaccard = minJaccard, hashedTokenIds = hashedTokenIds)
    val deduped = Dedup.dedupKeepBest(scrubbed, idCol, pairs, "score")

    // 5. per-language buckets. percentileBuckets is ascending (CCNet's
    // convention: LOW perplexity = head); qualityScore is high = good,
    // so rank its negation to keep head = best third
    val bucketed = Sampling.percentileBuckets(
      deduped.withColumn("_badness", -col("score")), langCol, "_badness", idCol)
      .drop("_badness")
      .withColumn("n_tokens", TextAnalysis.tokenCountWs(col(textCol)).cast("long"))
    val result = if (dropTail) bucketed.filter(col("bucket") =!= "tail") else bucketed
    // `materialize` (default): compute the survivors eagerly
    // (localCheckpoint) and RELEASE the hidden intermediate cache —
    // disk-resident persisted blocks are NOT LRU-evicted, so a lazy
    // return would leak one survivor-set copy per call for the life of
    // the app. Pass materialize = false to keep the pipeline lazy and
    // own the `qualityOk` cache lifecycle yourself (the 100 TB calling
    // convention: write the result to parquet, then clear the cache).
    if (materialize) {
      val out = result.localCheckpoint(true)
      qualityOk.unpersist(blocking = false)
      out
    } else result
  }

  /** The CCNet language-model filter, end to end (Wenzek et al., LREC
    * 2020): train one bigram LM PER LANGUAGE on a clean reference corpus
    * ([[TextAnalysis.lmEstimate]] grouped by `langCol` — the paper's
    * per-language Wikipedia models), score every document against its
    * own language's model ([[TextAnalysis.lmScore]], stupid backoff),
    * and split each language into head/middle/tail perplexity thirds
    * ([[Sampling.percentileBuckets]] — head = lowest perplexity, the
    * paper's keep set). `dropTail` applies the cut.
    *
    * The ranking score is mean negative log-prob (`-sum_logp/n_tokens` —
    * perplexity's log, monotone-identical ordering without the pow);
    * token-less documents score 0 by convention and rank with the
    * nulls-last discipline documented on percentileBuckets.
    *
    * Scale posture is inherited: vocabulary-sized model Exchanges
    * (lmEstimate), the model as a broadcast dim probed by scan-exploded
    * position pairs (lmScore — text never shuffles), and the bucket
    * stage's per-language sort boundary documented on percentileBuckets
    * with the approx form as the full-crawl alternative. Every stage is
    * oracle-checked alone; the composition itself is driver-replayable
    * end to end (Q-L57) because all three stages are closed-form.
    */
  def ccnetPerplexityBuckets(docs: DataFrame, reference: DataFrame,
                             idCol: String = "doc_id", textCol: String = "text",
                             langCol: String = "lang", minCount: Long = 1L,
                             backoff: Double = -0.4, oov: Double = -6.0,
                             dropTail: Boolean = false,
                             approxCuts: Boolean = false): DataFrame = {
    val model = TextAnalysis.lmEstimate(
      reference.select(col(langCol), col(textCol)), textCol, minCount,
      groupCols = Seq(langCol))
    val scored = TextAnalysis.lmScore(docs, idCol, textCol, model, backoff, oov,
      groupCols = Seq(langCol))
      .withColumn("score",
        when(col("n_tokens") > 0, -col("sum_logp") / col("n_tokens"))
          .otherwise(lit(0.0)))
    // `approxCuts` is the full-crawl path: per-language approx-percentile
    // cut VALUES as a broadcast dim — no per-language sort Exchange (the
    // boundary documented on Sampling.percentileBuckets); CCNet itself
    // cuts by value, so this is the paper's own semantics. The exact rank
    // form stays the oracle-checkable default.
    val bucketed =
      if (approxCuts)
        Sampling.percentileBucketsApprox(scored, langCol, "score")
          .select(col(idCol), col(langCol), col("n_tokens"), col("score"),
            col("bucket"))
      else
        Sampling.percentileBuckets(scored, langCol, "score", idCol)
          .select(col(idCol), col(langCol), col("n_tokens"), col("score"),
            col("rank_in_group"), col("n_group"), col("bucket"))
    if (dropTail) bucketed.filter(col("bucket") =!= "tail") else bucketed
  }
}
