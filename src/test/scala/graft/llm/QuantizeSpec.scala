package graft.llm

import graft.SparkSpec
import graft.functions.Native
import graft.sources.Tables
import org.apache.spark.sql.functions._

class QuantizeSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = Tables.load(spark, sf, "embeddings")

  test("int8 cosine tracks exact float cosine within 0.05 on organic pairs") {
    val sample = emb.limit(50)
    val a = sample.select($"vec_id".as("a_id"), $"embedding".as("a"),
      Similarity.quantizeInt8($"embedding").as("qa"))
    val b = sample.select($"vec_id".as("b_id"), $"embedding".as("b"),
      Similarity.quantizeInt8($"embedding").as("qb"))
    val worst = a.crossJoin(b).filter($"a_id" < $"b_id")
      .select(abs(Native.cosineSimilarity($"a", $"b") -
        Native.cosineSimilarityInt8($"qa", $"qb")).as("err"))
      .agg(max($"err")).head().getDouble(0)
    assert(worst < 0.05, s"max |int8 - float| cosine error $worst")
  }

  test("int8 cosine of an all-zero code is 0.0, not NaN (zero-norm guard)") {
    // quantizeInt8 maps zero-norm embeddings to all-zero codes; 0/0 NaN
    // would poison TopKBySim ranking — the guard mirrors NearestCentroids
    val rows = Seq(
      (Seq[Byte](0, 0, 0), Seq[Byte](1, 2, 3)),
      (Seq[Byte](1, 2, 3), Seq[Byte](0, 0, 0)),
      (Seq[Byte](0, 0, 0), Seq[Byte](0, 0, 0))).toDF("a", "b")
    val sims = rows.select(Native.cosineSimilarityInt8($"a", $"b")).collect()
      .map(_.getDouble(0))
    assert(sims.forall(_ == 0.0), s"expected all 0.0, got ${sims.toSeq}")
  }

  test("identical vectors quantize identically; zero and null vectors are safe") {
    val rows = Seq(
      (1L, Array(0.5f, -1.0f, 0.25f)),
      (2L, Array(0.5f, -1.0f, 0.25f)),
      (3L, Array(0.0f, 0.0f, 0.0f))).toDF("id", "e")
    val q = rows.select($"id", Similarity.quantizeInt8($"e").as("q")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Byte](1)).toMap
    assert(q(1L) == q(2L))
    assert(q(1L) == Seq[Byte](64, -127, 32)) // round(x*127/maxabs), maxabs=1.0
    assert(q(3L) == Seq[Byte](0, 0, 0))
    val nullRow = Seq((4L, null.asInstanceOf[Array[Float]])).toDF("id", "e")
      .select(Similarity.quantizeInt8($"e")).head()
    assert(nullRow.isNullAt(0))
  }

  test("int8TopKAgg finds planted exact clones as the full top-k") {
    val queries = emb.filter($"vec_id" < 5)
      .select($"vec_id".as("query_id"), $"embedding")
    val corpus = emb.select($"vec_id".as("neighbor_id"), $"embedding")
      .unionByName(emb.filter($"vec_id" < 5)
        .select(($"vec_id" + 1000000L).as("neighbor_id"), $"embedding"))
    val out = Similarity.int8TopKAgg(queries, corpus, k = 1)
    val top = out.collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(top == (0L until 5L).map(i => i -> (i + 1000000L)).toMap)
    // the 100 TB contract holds for the quantized path too: no float OR
    // int8 array column may ride any shuffle of the ranking tail
    assertNoEmbeddingInExchange(Similarity.int8TopKAgg(queries, corpus, k = 3))
  }

  test("dequantize reconstructs within half a quantization step per component") {
    val pairs = emb.limit(100).select($"embedding".as("e"),
      Similarity.dequantizeInt8(Similarity.quantizeInt8WithScale($"embedding")).as("r"),
      Similarity.quantizeInt8WithScale($"embedding").getField("inv_scale").as("s"))
    val bad = pairs.filter(
      exists(zip_with($"e", $"r", (a, b) => abs(a.cast("double") - b.cast("double"))),
        err => err > $"s" * 0.5 + 1e-6)) // +1e-6: float32 re-rounding of the product
    assert(bad.count() == 0, "component error exceeded inv_scale/2")
    // zero vector round-trips to zero, not NaN
    val z = Seq(Tuple1(Array(0.0f, 0.0f))).toDF("e")
      .select(Similarity.dequantizeInt8(Similarity.quantizeInt8WithScale($"e")))
      .head().getSeq[Float](0)
    assert(z == Seq(0.0f, 0.0f))
  }

  test("SQL registration exposes cosine_similarity_int8") {
    Native.register(spark)
    val r = spark.sql(
      "SELECT cosine_similarity_int8(array(cast(1 as tinyint), cast(2 as tinyint)), " +
      "array(cast(1 as tinyint), cast(2 as tinyint))) c").head()
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
  }
}
