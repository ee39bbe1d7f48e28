package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Model-based document classification — the quality/domain classifier
  * loop of a training-data pipeline (train a cheap classifier on a labeled
  * reference set, score the crawl, keep the predicted-good slice). The
  * engine's trainable form is multinomial Naive Bayes: like
  * [[TextAnalysis.lmEstimate]] it is pure counting, so training is ONE
  * distributed aggregation pass whose evidence is exact integers (fully
  * oracle-checkable), and scoring is the [[TextAnalysis.langIdLinear]]
  * shape — explode + broadcast model dim + DECIMAL-exact argmax.
  */
object Classify {

  /** Multinomial Naive Bayes TRAINING: token counts per label over the
    * lowercased whitespace vocabulary (the [[TextAnalysis.langIdLinear]]
    * token basis). The model is PURE COUNTS — (label, token, cnt) rows
    * denormalized with the label metadata scoring needs: `label_total`
    * (token occurrences in the label), `vocab` (distinct tokens across
    * ALL labels — the shared smoothing denominator), `n_docs` /
    * `n_docs_total` (the prior's evidence). Smoothing strength is a
    * SCORING-time knob ([[nbScore]]'s `alpha`), so one trained model
    * serves any α and every model column hash-checks exactly (Q-L60).
    *
    * Scale shape (the ql54 discipline): one token-explode scan into a
    * map-side-combinable (label, token) count agg — the only corpus-sized
    * input; label totals and the vocabulary size are vocabulary-sized
    * re-aggregations of it; doc counts are a second count-only pass that
    * prunes to the label column. Label dims broadcast.
    */
  def nbTrain(docs: DataFrame, labelCol: String, textCol: String): DataFrame = {
    // loud-error discipline (ADVICE r11): groupBy retains the null group,
    // so an unlabeled row would silently train a real NULL class (and
    // nbClassify could then emit pred_label = NULL). Guard the label in
    // the scan projection — raise_error rides the existing passes, no
    // extra validation job (the nprobe-bounds / meanEmbedding convention).
    val lbl = when(col(labelCol).isNull,
      raise_error(lit(s"nbTrain: NULL $labelCol — every training row must " +
        "be labeled (filter unlabeled rows first)")))
      .otherwise(col(labelCol))
    val toks = docs.select(lbl.as("label"),
      explode(Dedup.tokens(lower(col(textCol)))).as("token"))
    val cnt = toks.groupBy(col("label"), col("token")).agg(count(lit(1)).as("cnt"))
    val labelTot = cnt.groupBy(col("label")).agg(sum(col("cnt")).as("label_total"))
    val vocab = cnt.select(col("token")).distinct()
      .agg(count(lit(1)).as("vocab"))
    val docsPerLabel = docs.groupBy(lbl.as("label"))
      .agg(count(lit(1)).as("n_docs"))
    val docsTotal = docs.agg(count(lit(1)).as("n_docs_total"))
    cnt.join(broadcast(labelTot), "label")
      .crossJoin(broadcast(vocab))
      .join(broadcast(docsPerLabel), "label")
      .crossJoin(broadcast(docsTotal))
  }

  private def dec(c: Column): Column = c.cast("decimal(18,6)")

  /** Per-(doc, label) Naive Bayes log-scores: prior + Σ per-token
    * log-likelihood with add-α smoothing —
    * `log10((cnt + α) / (label_total + α·vocab))`, unseen tokens at
    * `cnt = 0`. Each log is one float computed from exact integer
    * evidence and immediately cast to DECIMAL(18,6) (the Q-L57 bridge:
    * engines' log10 agree to an ulp, the cast pins the value), so the
    * distributed sum is exact and order-independent — scores hash-match
    * an external oracle. Token-less docs score the bare prior.
    *
    * Scale: label dim and token-likelihood dim both BROADCAST (model
    * tables, never corpus); tokens explode off the scan; the per-label
    * fan-out is |labels| (a handful); only narrow (id, label, decimal)
    * rows reach the one keyed Exchange.
    */
  def nbScoreAll(docs: DataFrame, idCol: String, textCol: String,
                 model: DataFrame, alpha: Double = 1.0): DataFrame = {
    require(alpha > 0, s"alpha must be positive, got $alpha")
    val lab = broadcast(model
      .select(col("label"), col("label_total"), col("vocab"),
        col("n_docs"), col("n_docs_total")).distinct()
      .withColumn("_prior",
        dec(log10(col("n_docs").cast("double") / col("n_docs_total"))))
      .withColumn("_oov", dec(log10(
        lit(alpha) / (col("label_total") + lit(alpha) * col("vocab")))))
      .select(col("label"), col("_prior"), col("_oov")))
    val tokenLp = broadcast(model.select(col("label").as("_m_label"),
      col("token").as("_m_tok"),
      dec(log10((col("cnt") + lit(alpha)) /
        (col("label_total") + lit(alpha) * col("vocab")))).as("_lp")))
    docs.select(col(idCol),
        explode_outer(Dedup.tokens(lower(col(textCol)))).as("_tok"))
      .crossJoin(lab)
      .join(tokenLp,
        col("label") === col("_m_label") && col("_tok") === col("_m_tok"), "left")
      .withColumn("_wlp", when(col("_tok").isNull, dec(lit(0)))
        .otherwise(coalesce(col("_lp"), col("_oov"))))
      .groupBy(col(idCol), col("label"), col("_prior"))
      .agg(sum(col("_wlp")).as("_sum"))
      .select(col(idCol), col("label"),
        (col("_prior") + coalesce(col("_sum"), dec(lit(0)))).as("score"))
  }

  /** INCREMENTAL model maintenance (the lmMerge convention): counts are
    * additive per (label, token), label totals and doc counts add per
    * label, and the shared `vocab` is recomputed as the DISTINCT token
    * count of the merged rows (token sets can overlap, so it is NOT a
    * sum — the one non-additive column, recomputed at model-sized cost).
    * Spec-pinned: `nbMerge(nbTrain(A), nbTrain(B)) == nbTrain(A ∪ B)`.
    * Every agg/join here is model-sized, never corpus-sized.
    */
  def nbMerge(a: DataFrame, b: DataFrame): DataFrame = {
    def slim(m: DataFrame) = m.select(col("label"), col("token"), col("cnt"))
    val cnt = slim(a).unionByName(slim(b))
      .groupBy(col("label"), col("token")).agg(sum(col("cnt")).as("cnt"))
    val labelTot = cnt.groupBy(col("label")).agg(sum(col("cnt")).as("label_total"))
    val vocab = cnt.select(col("token")).distinct().agg(count(lit(1)).as("vocab"))
    def docsDim(m: DataFrame) = m
      .select(col("label"), col("n_docs"), col("n_docs_total")).distinct()
    val perLabel = docsDim(a).unionByName(docsDim(b))
      .groupBy(col("label")).agg(sum(col("n_docs")).as("n_docs"))
    // n_docs_total: one total per source model, summed once — distinct on
    // the total alone would collapse two models that happen to share it
    def total(m: DataFrame) = m.select(col("n_docs_total")).distinct()
    val docsTotal = total(a).unionByName(total(b))
      .agg(sum(col("n_docs_total")).as("n_docs_total"))
    cnt.join(broadcast(labelTot), "label")
      .crossJoin(broadcast(vocab))
      .join(broadcast(perLabel), "label")
      .crossJoin(broadcast(docsTotal))
  }

  /** INCREMENTAL model maintenance, the delete half (the
    * [[TextAnalysis.lmSubtract]] mirror): NB counts are additive over
    * documents, so the model of a removed sub-corpus subtracts exactly.
    * Contract (spec-pinned): `nbSubtract(nbTrain(A ∪ B), nbTrain(B)) ==
    * nbTrain(A)` for disjoint doc sets. Token rows reaching zero drop;
    * labels whose doc count reaches zero disappear entirely (nbTrain(A)
    * never saw them); `label_total` is recomputed as the per-label sum
    * of surviving counts and `vocab` as their distinct token count (the
    * two non-carryable columns, recomputed at model-sized cost exactly
    * like [[nbMerge]]). A subtrahend count exceeding the minuend's
    * raises loudly — it means `b` was never trained into `a`. DETECTION
    * IS PARTIAL (the [[TextAnalysis.lmSubtract]] caveat): only
    * over-subtraction is catchable from counts — a `b` that was never
    * trained into `a` but whose per-key counts all fit under the
    * minuend's subtracts cleanly and yields a silently corrupted model;
    * full membership verification is impossible from count tables.
    *
    * Scale: every agg/join is model-sized, never corpus-sized.
    */
  def nbSubtract(a: DataFrame, b: DataFrame): DataFrame = {
    def slim(m: DataFrame, sign: Int) =
      m.select(col("label"), col("token"), (col("cnt") * lit(sign)).as("cnt"))
    val cnt = slim(a, 1).unionByName(slim(b, -1))
      .groupBy(col("label"), col("token")).agg(sum(col("cnt")).as("cnt"))
      .withColumn("cnt",
        when(col("cnt") < 0, raise_error(concat(
          lit("nbSubtract: negative count for ("), col("label"), lit(", "),
          col("token"),
          lit(") — the subtrahend model was never trained into the minuend"))))
          .otherwise(col("cnt")))
      .filter(col("cnt") > 0)
    val labelTot = cnt.groupBy(col("label")).agg(sum(col("cnt")).as("label_total"))
    val vocab = cnt.select(col("token")).distinct().agg(count(lit(1)).as("vocab"))
    def docsDim(m: DataFrame, sign: Int) = m
      .select(col("label"), col("n_docs"), col("n_docs_total")).distinct()
      .select(col("label"), (col("n_docs") * lit(sign)).as("n_docs"),
        (col("n_docs_total") * lit(sign)).as("n_docs_total"))
    // the doc-count dimensions get the SAME loud-guard as token counts:
    // a subtrahend claiming more docs than the minuend (possible with
    // ZERO token evidence — all-empty-text docs produce no cnt rows, so
    // the cnt raise alone cannot catch it) must raise, never silently
    // drop a label or let a negative total corrupt every prior downstream
    val perLabel = docsDim(a, 1).unionByName(docsDim(b, -1))
      .groupBy(col("label")).agg(sum(col("n_docs")).as("n_docs"))
      .withColumn("n_docs",
        when(col("n_docs") < 0, raise_error(concat(
          lit("nbSubtract: negative doc count for label "), col("label"),
          lit(" — the subtrahend model was never trained into the minuend"))))
          .otherwise(col("n_docs")))
      .filter(col("n_docs") > 0)
    def total(m: DataFrame, sign: Int) = m
      .select(col("n_docs_total")).distinct()
      .select((col("n_docs_total") * lit(sign)).as("n_docs_total"))
    val docsTotal = total(a, 1).unionByName(total(b, -1))
      .agg(sum(col("n_docs_total")).as("n_docs_total"))
      .withColumn("n_docs_total",
        when(col("n_docs_total") < 0, raise_error(
          lit("nbSubtract: negative total doc count — the subtrahend model " +
            "was never trained into the minuend")))
          .otherwise(col("n_docs_total")))
    cnt.join(broadcast(labelTot), "label")
      .crossJoin(broadcast(vocab))
      .join(broadcast(perLabel), "label")
      .crossJoin(broadcast(docsTotal))
  }

  /** Argmax classification over [[nbScoreAll]]: per doc the best label
    * (DECIMAL-exact compare; ties → lexicographically GREATER label, the
    * [[TextAnalysis.langIdLinear]] convention) and its score as DOUBLE.
    */
  def nbClassify(docs: DataFrame, idCol: String, textCol: String,
                 model: DataFrame, alpha: Double = 1.0): DataFrame =
    nbScoreAll(docs, idCol, textCol, model, alpha)
      .groupBy(col(idCol))
      .agg(max(struct(col("score"), col("label"))).as("_best"))
      .select(col(idCol), col("_best.label").as("pred_label"),
        col("_best.score").cast("double").as("score"))
}
