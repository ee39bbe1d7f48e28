package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-7 ql6 cost breakdown: the oracle promotion switched ql6 to
  * md5-token-id minhash AND added the t2 total ORDER BY. This probe
  * separates the three costs at sf0.1 — string-hash unordered (the old
  * shape), hashed-id unordered (the new hash basis alone), hashed-id
  * ordered (the full new shape) — so BASELINE.md can attribute the bench
  * delta to harness sort vs hash basis.
  */
object Ql6Probe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.sources.Tables.load(spark, dir, "documents")

    def time(label: String)(f: => org.apache.spark.sql.DataFrame): Unit = {
      val secs = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        f.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$label%-28s min=${secs.min}%.2f runs=${secs.map(s => f"$s%.2f").mkString(",")}")
    }

    val base = graft.llm.Dedup.minHashLshCandidates(docs, "doc_id", "text",
      numHashes = 64, bands = 4).select(col("doc_a"), col("doc_b"))
    val hashed = graft.llm.Dedup.minHashLshCandidates(docs, "doc_id", "text",
      numHashes = 64, bands = 4, hashedTokenIds = true).select(col("doc_a"), col("doc_b"))
    println(s"pairs string=${base.count()} hashed=${hashed.count()}")
    time("string unordered")(base)
    time("hashed unordered")(hashed)
    time("hashed ordered")(hashed.orderBy(col("doc_a").asc_nulls_first, col("doc_b").asc_nulls_first))
    spark.stop()
  }
}
