package graft.tools

import graft.llm.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object MinhashProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    println(s"docs=${docs.count()} avgTokens=" +
      docs.select(avg(size(split(col("text"), " ")))).head().getDouble(0))
    var t0 = System.nanoTime()
    val mh = docs.select(col("doc_id"), Dedup.minHash(Dedup.tokens(col("text")), 64).as("mh"))
    mh.write.format("noop").mode("overwrite").save()
    println(f"minhash compute: ${(System.nanoTime()-t0)/1e9}%.1f s")
    t0 = System.nanoTime()
    val cands = Dedup.minHashLshCandidates(docs, "doc_id", "text", numHashes = 64, bands = 4)
    println(s"candidate pairs: ${cands.count()}")
    println(f"full candidates: ${(System.nanoTime()-t0)/1e9}%.1f s")
    spark.stop()
  }
}
