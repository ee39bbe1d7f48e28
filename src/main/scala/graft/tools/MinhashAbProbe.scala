package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Interleaved A/B of the ql6 candidate tail: fused-score-then-dedup (new)
  * vs dedup-then-HOF-score (the pre-round-5 shape, reconstructed) — same
  * JVM, alternating runs, min-of-N, so machine load hits both arms.
  */
object MinhashAbProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    import graft.llm.Dedup

    def banded(df: DataFrame): DataFrame = {
      val numHashes = 64; val bands = 4; val r = numHashes / bands
      df.select(col("doc_id").as("id"), Dedup.tokens(col("text")).as("toks"))
        .filter(size(col("toks")) > 0)
        .withColumn("mh", Dedup.minHash(col("toks"), numHashes))
        .select(col("id"), col("mh"),
          posexplode(transform(sequence(lit(0), lit(bands - 1)),
            b => xxhash64(slice(col("mh"), b * lit(r) + 1, lit(r))))))
        .withColumnRenamed("pos", "band").withColumnRenamed("col", "bh")
    }
    def joinPairs(bd: DataFrame): DataFrame = {
      val a = bd.as("a"); val b = bd.as("b")
      a.join(b, col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
        col("a.id") < col("b.id"))
    }
    // OLD shape: dedup pairs carrying both signatures, then HOF-score
    def oldForm(docs: DataFrame): DataFrame =
      joinPairs(banded(docs))
        .select(col("a.id").as("doc_a"), col("b.id").as("doc_b"),
          col("a.mh").as("mh_a"), col("b.mh").as("mh_b"))
        .dropDuplicates("doc_a", "doc_b")
        .select(col("doc_a"), col("doc_b"),
          Dedup.minHashSimilarityHof(col("mh_a"), col("mh_b"), 64).as("est_jaccard"))
    // NEW shape: the shipped operator (bands=4 to match ql6's query config)
    def newForm(docs: DataFrame): DataFrame =
      Dedup.minHashLshCandidates(docs, "doc_id", "text", numHashes = 64, bands = 4)

    val docs = graft.sources.Tables.load(spark, dir, "documents")
    // warm both shapes
    oldForm(docs.limit(50)).write.format("noop").mode("overwrite").save()
    newForm(docs.limit(50)).write.format("noop").mode("overwrite").save()
    def time(f: => DataFrame): Double = {
      val t0 = System.nanoTime()
      f.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    val olds = collection.mutable.ArrayBuffer[Double]()
    val news = collection.mutable.ArrayBuffer[Double]()
    for (_ <- 1 to 4) { olds += time(oldForm(docs)); news += time(newForm(docs)) }
    println(f"AB old(dedup-then-hof)  min=${olds.min}%.3f all=${olds.map(t => f"$t%.2f").mkString(",")}")
    println(f"AB new(fused-then-dedup) min=${news.min}%.3f all=${news.map(t => f"$t%.2f").mkString(",")}")
    spark.stop()
  }
}
