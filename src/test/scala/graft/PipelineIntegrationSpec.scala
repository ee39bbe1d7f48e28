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
