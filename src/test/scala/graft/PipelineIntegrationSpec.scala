package graft

import graft.combinators.Sequence
import graft.core.{Stage, StageId}
import graft.llm.{Dedup, Sampling, TextAnalysis}
import graft.runtime.Pipeline
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** End-to-end training-data pipeline: the reference is a pipeline
  * LIBRARY, so the capstone check is that the engine's operators COMPOSE
  * — quality filter → language ID → exact dedup → decontamination →
  * deterministic split, chained through the Stage/Pipeline machinery into
  * lazy plans, then verified against independently computed expectations.
  */
class PipelineIntegrationSpec extends SparkSpec {

  private lazy val docs = Tables.load(spark, sf, "documents")

  test("the full LLM pre-processing pipeline composes and flows") {
    val benchmark = docs.filter(col("doc_id") < 10)

    val prep = Sequence("prep")(
      // 1. attach quality + language signals (pure projections)
      Stage(StageId("signals")) { d =>
        d.withColumn("quality", TextAnalysis.qualityScore(col("text")))
          .withColumn("pred_lang", TextAnalysis.langId(col("text")))
      },
      // 2. drop low-quality docs
      graft.stages.Where("quality_gate", col("quality") >= 0.5),
      // 3. exact dedup on text
      Stage(StageId("exact_dedup"))(_.dropDuplicates("text")),
      // 4. quarantine docs overlapping the benchmark (decontamination)
      Stage(StageId("decontaminate")) { d =>
        val dirty = Dedup.decontaminate(d, benchmark, "doc_id", "text", n = 3)
        d.join(dirty.select("doc_id"), Seq("doc_id"), "left_anti")
      },
      // 5. deterministic train/val/test assignment
      Stage(StageId("split")) { d =>
        Sampling.hashSplit(d, "doc_id",
          Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      }
    )

    val pipeline = Pipeline("llm-prep", prep)
    val out = pipeline.run(spark)(pipeline.plan(docs.filter(col("doc_id") >= 10)).cache())
    try {
      val total = out.count()
      assert(total > 0, "pipeline must keep some documents")

      // every stage's effect is independently checkable on the output
      assert(out.filter(col("quality") < 0.5).count() == 0)
      assert(out.select("text").distinct().count() == total) // deduped
      // nothing that overlaps the benchmark survived
      val leaked = Dedup.decontaminate(
        out.select(col("doc_id"), col("text")), benchmark, "doc_id", "text", n = 3)
      assert(leaked.count() == 0, "decontamination left benchmark-overlapping docs")
      // split is total and deterministic
      assert(out.filter(!col("split").isin("train", "val", "test")).count() == 0)
      val splits = out.groupBy("split").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(splits.getOrElse("train", 0L) > splits.getOrElse("val", 0L))

      // and the whole thing was ONE lazy composition: the plan tree
      // exported for observability names every stage
      val plan = pipeline.planJson
      for (s <- Seq("signals", "quality_gate", "exact_dedup", "decontaminate", "split"))
        assert(plan.contains(s"""\"name\":\"$s\""""), s"missing stage $s in $plan")
    } finally out.unpersist()
  }

  test("the round-6 prep pipeline composes: normalize -> boilerplate -> cap -> chunk") {
    // a corpus with every round-6 pathology at once: decomposed unicode,
    // control chars, shared per-source boilerplate, one over-represented
    // source — flowing normalize -> boilerplate strip -> per-source cap ->
    // token-window chunking as ONE lazy composition
    val raw = docs.select(col("doc_id"), col("source"), col("text"))
      .unionByName(spark.range(1, 31).select(
        (-col("id")).as("doc_id"),
        concat(lit("hot"), (col("id") % 2).cast("string")).as("source"),
        concat(lit("PROMO BANNER\nCafé body "), col("id").cast("string"),
          lit("  tail\nPROMO BANNER")).as("text")))

    val prep = Sequence("prep6")(
      Stage(StageId("normalize")) { d =>
        d.withColumn("text", TextAnalysis.normalizeText(col("text")))
      },
      Stage(StageId("boilerplate")) { d =>
        Dedup.stripBoilerplate(d, "doc_id", "text", "source", maxLineDf = 5)
          .join(d.select("doc_id", "source"), Seq("doc_id"))
          .withColumnRenamed("text_clean", "text")
      },
      Stage(StageId("source_cap")) { d =>
        Sampling.perGroup(d, Seq(col("source")), "doc_id", 10)
      },
      Stage(StageId("chunk")) { d =>
        TextAnalysis.chunkTokenWindows(d, "doc_id", "text", chunkSize = 8, stride = 6)
      }
    )
    val pipeline = Pipeline("prep6", prep)
    val out = pipeline.run(spark)(pipeline.plan(raw)).cache()
    try {
      // normalize ran BEFORE the boilerplate cut: the PROMO line carried a
      // BEL upstream, yet both copies were identified (df=15 > 5) and cut —
      // so no surviving chunk contains it, while the unique body survives
      assert(out.filter(col("chunk_text").contains("PROMO")).count() == 0)
      val planted = out.filter(col("doc_id") < 0)
      assert(planted.count() > 0, "planted docs must survive to chunking")
      // NFC applied: the composed form is what reaches chunks
      assert(planted.filter(col("chunk_text").contains("Café body")).count() > 0)
      // the cap held per source: at most 10 docs per planted source
      val capped = planted.select("doc_id").distinct().count()
      assert(capped <= 20, s"per-source cap of 10 over 2 sources, got $capped docs")
    } finally out.unpersist()
  }

  test("the round-7 crawl pipeline composes: canonical-url dedup -> gopher gate -> span dedup") {
    // every round-7 crawl pathology at once: URL variants of one page,
    // a bullet-spam page, and a repeated span shared across docs — flowing
    // URL canonicalization + dedup -> Gopher quality gate -> repeated-span
    // removal as one composition
    val sharedSpan = (1 to 25).map(i => s"shared$i").mkString(" ")
    val body = (1 to 60).map(i => s"body$i").mkString(" ")
    val raw = spark.range(1, 21).select(
      col("id").as("doc_id"),
      // ids 1/2 are the SAME page behind url variants; the rest unique
      when(col("id") === 1, lit("HTTPS://WWW.Page.com/a/?utm_source=x"))
        .when(col("id") === 2, lit("https://page.com/a"))
        .otherwise(concat(lit("https://site"), col("id").cast("string"),
          lit(".com/p"))).as("url"),
      when(col("id") === 3, lit("- spam\n- spam\n- spam"))
        .when(col("id") <= 5, lit(s"$sharedSpan $body"))
        .otherwise(concat(lit(body + " unique"), col("id").cast("string"))).as("text"))

    val prep = Sequence("prep7")(
      Stage(StageId("canonical_url")) { d =>
        d.withColumn("curl", TextAnalysis.canonicalizeUrl(col("url")))
          .dropDuplicates("curl")
      },
      Stage(StageId("gopher_gate")) { d =>
        val q = TextAnalysis.gopherQualityFlags(col("text"))
        d.filter(q.getField("ok_length") && q.getField("ok_bullets"))
      },
      Stage(StageId("span_dedup")) { d =>
        Dedup.removeRepeatedSpans(d, "doc_id", "text", spanTokens = 20, minCount = 2)
          .join(d.drop("text"), Seq("doc_id"))
      }
    )
    val pipeline = Pipeline("prep7", prep)
    val out = pipeline.run(spark)(pipeline.plan(raw)).cache()
    try {
      val ids = out.select("doc_id").collect().map(_.getLong(0)).toSet
      assert(!(ids.contains(1L) && ids.contains(2L)),
        "url variants of one page must collapse to a single survivor")
      assert(!ids.contains(3L), "the bullet-spam page must fail the gopher gate")
      // ALL cross-doc-repeated mass is gone (the shared span AND the
      // common body — both repeat across docs), per-doc unique markers
      // survive: exactly the ExactSubstr contract
      assert(out.filter(col("text_clean").contains("shared1")).count() == 0)
      assert(out.filter(col("text_clean").contains("body1")).count() == 0)
      assert(out.filter(col("text_clean").contains("unique7")).count() > 0)
    } finally out.unpersist()
  }

  test("the embedding dedup pipeline composes: near-dup pairs -> clusters -> survivors") {
    import graft.llm.Similarity
    // corpus with planted exact clones of the first 10 vectors: the
    // survivor set must keep exactly one member per clone cluster (the
    // minimum id — i.e. every original survives, every clone drops) and
    // leave the organic corpus untouched (fixture max organic cosine ~0.5)
    val emb = Tables.load(spark, sf, "embeddings").select(col("vec_id"), col("embedding"))
    val clones = emb.filter(col("vec_id") < 10)
      .select((col("vec_id") + 1000000L).as("vec_id"), col("embedding"))
    val corpus = emb.unionByName(clones)

    val pairs = Similarity.cosineNearDupPairs(corpus, "vec_id",
      threshold = 0.9, planes = 4, dim = 64)
    val survivors = Dedup.dedupKeepFirst(corpus, "vec_id", pairs)

    assert(pairs.count() == 10, "each planted clone pairs with its original only")
    assert(survivors.count() == emb.count(), "one survivor per cluster + organics")
    assert(survivors.filter(col("vec_id") >= 1000000L).count() == 0,
      "survivor selection must keep the minimum id (the original)")
  }
}
