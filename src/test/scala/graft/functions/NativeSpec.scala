package graft.functions

import graft.SparkSpec
import graft.llm.Similarity
import graft.sources.Tables
import org.apache.spark.sql.functions._

class NativeSpec extends SparkSpec {
  import spark.implicits._

  test("native cosine matches the HOF reference bit-for-bit on real embeddings") {
    val emb = Tables.load(spark, sf, "embeddings").limit(50)
    val pairs = emb.select(col("vec_id").as("a_id"), col("embedding").as("a"))
      .crossJoin(emb.select(col("vec_id").as("b_id"), col("embedding").as("b")))
      .filter(col("a_id") < col("b_id"))
    val diff = pairs.select(
      Native.cosineSimilarity(col("a"), col("b")).as("native"),
      Similarity.cosineHof(col("a"), col("b")).as("hof"))
      .filter(col("native") =!= col("hof")) // bit-exact: same fold order
      .count()
    assert(diff == 0)
  }

  test("native dot matches HOF dot") {
    val df = Seq((Array(1.5f, -2.0f, 3.0f), Array(0.5f, 4.0f, -1.0f))).toDF("a", "b")
    val r = df.select(
      Native.dotProduct(col("a"), col("b")).as("n"),
      Similarity.dot(col("a"), col("b")).as("h")).head()
    assert(r.getDouble(0) == r.getDouble(1))
  }

  test("SQL registration exposes cosine_similarity and dot_product") {
    Native.register(spark)
    val r = spark.sql(
      "SELECT cosine_similarity(array(cast(1.0 as float), cast(0.0 as float)), array(cast(1.0 as float), cast(0.0 as float))) c, " +
      "dot_product(array(cast(2.0 as float)), array(cast(3.0 as float))) d").head()
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
    assert(r.getDouble(1) == 6.0)
  }

  test("type check rejects non-float-array input") {
    val df = Seq((Array(1.0, 2.0), Array(1.0, 2.0))).toDF("a", "b") // double arrays
    val e = intercept[Exception] {
      df.select(Native.cosineSimilarity(col("a"), col("b"))).collect()
    }
    assert(e.getMessage.toLowerCase.contains("array<float>")
      || e.getMessage.contains("DATATYPE_MISMATCH"))
  }
}
