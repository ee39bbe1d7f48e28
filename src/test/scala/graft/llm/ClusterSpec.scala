package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ClusterSpec extends SparkSpec {
  import spark.implicits._

  test("duplicateClusters labels chains and stars with the component minimum") {
    // components: {1,2,3,4} (chain), {10,11} (pair), {20,21,22} (star on 21)
    val pairs = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L),
      (10L, 11L),
      (21L, 20L), (21L, 22L)
    ).toDF("doc_a", "doc_b")
    val got = Dedup.duplicateClusters(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L,
      20L -> 20L, 21L -> 20L, 22L -> 20L))
  }

  test("dedupKeepFirst keeps the min doc per cluster and all unpaired docs") {
    val docs = (1L to 8L).map(i => (i, s"d$i")).toDF("doc_id", "text")
    val pairs = Seq((2L, 5L), (5L, 7L)).toDF("doc_a", "doc_b")
    val kept = Dedup.dedupKeepFirst(docs, "doc_id", pairs)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 2L, 3L, 4L, 6L, 8L)) // 5 and 7 lose to 2
  }

  test("long chains converge via pointer jumping (beyond O(iters) hops)") {
    // a 60-node path graph: one-hop label propagation would need ~60
    // iterations; pointer jumping must close it within the default 16
    val pairs = (1L until 60L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val got = Dedup.duplicateClusters(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size == 60)
    assert(got.values.forall(_ == 1L))
  }

  test("unconverged graphs throw instead of silently splitting clusters") {
    val pairs = (1L until 40L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    intercept[IllegalStateException] {
      Dedup.duplicateClusters(pairs, maxIters = 2)
    }
  }

  test("end-to-end: token-set dups collapse to one survivor per group") {
    val docs = Seq(
      (1L, "a b c"), (2L, "c b a"), (3L, "a b c a"), // same token set
      (4L, "x y z")
    ).toDF("doc_id", "text")
    val pairs = Dedup.exactTokenSetPairs(docs, "doc_id", "text")
    val kept = Dedup.dedupKeepFirst(docs, "doc_id", pairs)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 4L))
  }

  test("dedupKeepBest keeps the highest-score row per cluster, ties to min id") {
    val docs = Seq(
      // cluster {1,2,3}: best score is doc 2
      (1L, 0.3), (2L, 0.9), (3L, 0.5),
      // cluster {4,5}: tied scores -> min id 4 survives
      (4L, 0.7), (5L, 0.7),
      // singleton (in no pair) survives regardless of score
      (6L, 0.0)
    ).toDF("doc_id", "quality")
    val pairs = Seq((1L, 2L), (2L, 3L), (4L, 5L)).toDF("doc_a", "doc_b")
    val kept = Dedup.dedupKeepBest(docs, "doc_id", pairs, "quality")
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(2L, 4L, 6L))
  }

  test("dedupKeepBest: all-null-score clusters still keep a survivor; nulls lose to scores") {
    val docs = Seq(
      (1L, Option.empty[Double]), (2L, Option.empty[Double]), // all-null cluster → min id 1
      (3L, Option(0.2)), (4L, Option.empty[Double])           // null loses to a real score
    ).toDF("doc_id", "quality")
    val pairs = Seq((1L, 2L), (3L, 4L)).toDF("doc_a", "doc_b")
    val kept = Dedup.dedupKeepBest(docs, "doc_id", pairs, "quality")
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 3L))
  }

  test("semanticDecontaminate drops clones of benchmark vectors, keeps organics") {
    val emb = graft.sources.Tables.load(spark, sf, "embeddings")
      .select($"vec_id", $"embedding")
    val benchmark = emb.filter($"vec_id" < 3)
    // corpus: the originals, exact clones of them (paraphrase stand-ins),
    // and the organic remainder (max cosine to benchmark ~0.51)
    val corpus = emb.unionByName(
      benchmark.select(($"vec_id" + 1000000L).as("vec_id"), $"embedding"))
    val index = Similarity.IvfIndex.train(corpus, "vec_id", k = 32)
    val kept = Dedup.semanticDecontaminate(corpus, benchmark, "vec_id", index,
      threshold = 0.8, nprobe = 2)
      .select("vec_id").as[Long].collect().toSet
    (0L until 3L).foreach { i =>
      assert(!kept.contains(i), s"benchmark original $i must be dropped")
      assert(!kept.contains(i + 1000000L), s"clone of $i must be dropped")
    }
    assert(kept == (3L until emb.count()).toSet)
    // schema passes through: the anti-join keeps corpus columns untouched
    val out = Dedup.semanticDecontaminate(corpus, benchmark, "vec_id", index, 0.8)
    assert(out.columns.toSeq == corpus.columns.toSeq)
    // nprobe beyond the cell count is a loud error, not silent recall loss
    intercept[IllegalArgumentException] {
      Dedup.semanticDecontaminate(corpus, benchmark, "vec_id", index, 0.8,
        nprobe = 1000)
    }
  }

  test("semanticDedup: IVF candidates -> clusters -> best survivor, end to end") {
    // three exact-clone families (embedding-identical, token-disjoint ids)
    // plus organic vectors; the highest-quality clone survives per family
    val emb = graft.sources.Tables.load(spark, sf, "embeddings")
      .select($"vec_id", $"embedding")
    val corpus = emb
      .unionByName(emb.filter($"vec_id" < 3)
        .select(($"vec_id" + 1000000L).as("vec_id"), $"embedding"))
      .withColumn("quality",
        when($"vec_id" >= 1000000L, 0.9).otherwise(0.1)) // clones outrank originals
    val index = Similarity.IvfIndex.train(corpus, "vec_id", k = 32)
    val kept = Dedup.semanticDedup(corpus, "vec_id", "quality", index,
      threshold = 0.8, nprobe = 2)
      .select("vec_id").as[Long].collect().toSet
    // each family {i, i+1M} keeps ONLY the high-quality clone
    (0L until 3L).foreach { i =>
      assert(kept.contains(i + 1000000L), s"clone of $i must survive")
      assert(!kept.contains(i), s"original $i must be deduped away")
    }
    // organic vectors (no >=0.8 neighbor) all survive
    assert(kept.count(_ < 1000000L) == emb.count() - 3)
  }
}
