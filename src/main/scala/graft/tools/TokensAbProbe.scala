package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B probe: native tokens_ws vs the HOF split+filter form, isolated
  * over the documents corpus (optimization round 21 — the ql67 bench
  * regression attribution). Times three consumers: size() only, a full
  * explode+count, and the bm25 postings projection shape.
  */
object TokensAbProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))

    def time(name: String, f: => Unit): Unit = {
      f // warm
      val t0 = System.nanoTime()
      var i = 0
      while (i < 5) { f; i += 1 }
      println(f"$name%-28s ${(System.nanoTime() - t0) / 5e9}%.3f s/iter")
    }

    val hof = graft.llm.Dedup.tokensHof(col("text"))
    val nat = graft.llm.Dedup.tokens(col("text"))
    time("size hof", docs.select(sum(size(hof))).collect())
    time("size native", docs.select(sum(size(nat))).collect())
    time("explode hof", docs.select(explode(hof)).selectExpr("count(col)").collect())
    time("explode native", docs.select(explode(nat)).selectExpr("count(col)").collect())
    time("termcounts+dl hof", docs.select(col("doc_id"), size(hof).as("dl"),
      graft.functions.Generators.termCounts(col("text")).as(Seq("term", "tf")))
      .selectExpr("count(*)", "sum(tf)", "sum(dl)").collect())
    time("termcounts+dl native", docs.select(col("doc_id"), size(nat).as("dl"),
      graft.functions.Generators.termCounts(col("text")).as(Seq("term", "tf")))
      .selectExpr("count(*)", "sum(tf)", "sum(dl)").collect())
    spark.stop()
  }
}
