package graft.llm

import graft.SparkSpec
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** k-NN graph construction: the exact baseline and the NN-Descent
  * approximate build (the HNSW-family graph step in relational form).
  */
class KnnGraphSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = Tables.load(spark, sf, "embeddings")
    .select($"vec_id", $"embedding")

  private def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("knnGraphExact matches bruteForceTopKAgg with the corpus as its own query set") {
    val viaGraph = pairs(knn(3))
    val viaBrute = pairs(Similarity.bruteForceTopKAgg(
      emb.select($"vec_id".as("query_id"), $"embedding"), emb
        .select($"vec_id".as("neighbor_id"), $"embedding")
        , k = 3))
    assert(viaGraph == viaBrute)
  }

  private def knn(k: Int) = Similarity.knnGraphExact(emb, k)

  test("NN-Descent reaches high recall vs the exact graph and improves with iterations") {
    val exact = pairs(knn(3))
    val r0 = pairs(Similarity.knnGraphDescent(emb, k = 3, dim = 64, iters = 0))
    val r2 = pairs(Similarity.knnGraphDescent(emb, k = 3, dim = 64, iters = 2))
    val recall0 = (exact & r0).size.toDouble / exact.size
    val recall2 = (exact & r2).size.toDouble / exact.size
    assert(recall2 >= recall0,
      s"iterating must not lose recall: iters0=$recall0 iters2=$recall2")
    assert(recall2 >= 0.80, s"descent recall@3 after 2 iterations = $recall2")
  }

  test("planted clones are each other's top-1 at iteration 0 (init certainty)") {
    // identical vectors share every init bucket: the clone pair is a
    // candidate before any descent step and sim≈1.0 is never evicted
    val corpus = emb.unionByName(emb.filter($"vec_id" < 10)
      .select(($"vec_id" + 1000000L).as("vec_id"), $"embedding"))
    val g = Similarity.knnGraphDescent(corpus, k = 3, dim = 64, iters = 0)
    val top1 = g.filter($"query_id" >= 1000000L && $"rank" === 1)
      .select($"query_id", $"neighbor_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(top1 == (0L until 10L).map(i => (i + 1000000L) -> i).toMap)
  }

  test("descent is deterministic: two builds produce the identical graph") {
    val a = pairs(Similarity.knnGraphDescent(emb, k = 3, dim = 64, iters = 1))
    val b = pairs(Similarity.knnGraphDescent(emb, k = 3, dim = 64, iters = 1))
    assert(a == b)
  }
}
