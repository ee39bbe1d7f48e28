package graft.runtime

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** SQL facade: pipeline outputs as temp views + native function vocabulary
  * reachable from plain `spark.sql`.
  */
class SqlSpec extends SparkSpec {
  import spark.implicits._

  test("SQL users query a registered pipeline view with native functions") {
    val emb = Seq((1L, Array(1f, 0f, 1f)), (2L, Array(0f, 1f, 0f)))
      .toDF("vec_id", "embedding")
    val stage = graft.stages.Where("nonempty", size(col("embedding")) > 0)
    GraftSql.view("emb_v", stage, emb)
    val rows = GraftSql.sql(spark,
      "SELECT vec_id, cosine_similarity(embedding, embedding) AS s FROM emb_v ORDER BY vec_id")
      .collect()
    assert(rows.length == 2)
    assert(rows.forall(r => math.abs(r.getDouble(1) - 1.0) < 1e-12))
  }

  test("explode_ngrams generator agrees between SQL and DataFrame forms") {
    GraftSql.install(spark)
    val docs = Seq((1L, "a b c"), (2L, "x  y"), (3L, "solo")).toDF("doc_id", "text")
    GraftSql.view("docs_v", docs)
    val viaSql = GraftSql.sql(spark,
      "SELECT explode_ngrams(text, 2) AS ngram FROM docs_v")
      .as[String].collect().sorted.toSeq
    assert(viaSql == Seq("a b", "b c", "x y")) // blank tokens dropped; short docs skip
    val viaDf = docs.select(graft.functions.Generators.ngrams(col("text"), 2).as("ngram"))
      .as[String].collect().sorted.toSeq
    assert(viaDf == viaSql)
  }

  test("generator handles nulls and n larger than the doc") {
    val docs = Seq((1L, null.asInstanceOf[String]), (2L, "a b")).toDF("doc_id", "text")
    val out = docs.select(graft.functions.Generators.ngrams(col("text"), 3))
    assert(out.count() == 0)
  }

  test("registerTables exposes the canonical parquet tables to SQL") {
    GraftSql.registerTables(spark, sf)
    val n = GraftSql.sql(spark, "SELECT COUNT(*) FROM documents").head().getLong(0)
    assert(n > 0)
    // nanos-safe events load: the raw parquet would throw PARQUET_TYPE_ILLEGAL
    val e = GraftSql.sql(spark, "SELECT COUNT(*) FROM events").head().getLong(0)
    assert(e > 0)
  }
}
