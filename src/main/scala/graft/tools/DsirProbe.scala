package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures the two architecture claims the round-15 scaladocs argue
  * (the "argued, not measured" debit class):
  *
  * 1. `lmScoreRatio` (ONE corpus pass, four broadcast dims) vs the
  *    naive composition (`lmScore` twice + an (id)-keyed join of two
  *    corpus-sized score frames) — same output, different plan.
  * 2. `bm25TopK`'s df as a partial-combining agg + broadcast-back vs
  *    the ql25-style COUNT-window-over-term — measured on a SKEWED
  *    query (one term present in every document), where the window
  *    form must co-locate the full posting list in one task.
  *
  * min-of-3 per variant, noop writes, warmed shapes — the Ql47b/Ql27
  * probe conventions.
  *
  * Usage: SPARK_GRAFT_CPUS=32 sbt -error "runMain graft.tools.DsirProbe [sfDir]"
  */
object DsirProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def docs(dir: String) = graft.sources.Tables.load(spark, dir, "documents")

    // -- claim 1 variants ---------------------------------------------
    def ratioOnePass(dir: String) = {
      val d = docs(dir)
      val lmT = graft.llm.TextAnalysis.lmEstimate(
        d.filter(col("lang") === "en").select(col("text")), "text")
      val lmR = graft.llm.TextAnalysis.lmEstimate(d.select(col("text")), "text")
      graft.llm.TextAnalysis.lmScoreRatio(d, "doc_id", "text", lmT, lmR)
    }
    def ratioTwoPass(dir: String) = {
      val d = docs(dir)
      val lmT = graft.llm.TextAnalysis.lmEstimate(
        d.filter(col("lang") === "en").select(col("text")), "text")
      val lmR = graft.llm.TextAnalysis.lmEstimate(d.select(col("text")), "text")
      val st = graft.llm.TextAnalysis.lmScore(d, "doc_id", "text", lmT)
        .select(col("doc_id"), col("n_tokens"), col("sum_logp").as("logp_target"))
      val sr = graft.llm.TextAnalysis.lmScore(d, "doc_id", "text", lmR)
        .select(col("doc_id"), col("sum_logp").as("logp_raw"))
      st.join(sr, Seq("doc_id"))
        .withColumn("log_w", col("logp_target") - col("logp_raw"))
    }

    // -- claim 2 variants: a query whose one term hits EVERY document --
    // (the corpus is synthetic prose; pick the highest-df term at the
    // probe's own runtime so the skew is real on any fixture)
    lazy val hotTerm: String = docs(sfDir)
      .select(explode(graft.llm.Dedup.tokens(col("text"))).as("t"))
      .groupBy("t").count().orderBy(col("count").desc).head().getString(0)
    def hotQueries(s: SparkSession) = {
      import s.implicits._
      Seq((1L, hotTerm)).toDF("query_id", "text")
    }
    def bm25Agg(dir: String) =
      graft.llm.TextAnalysis.bm25TopK(docs(dir), hotQueries(spark),
        "doc_id", "text", "query_id", "text", k = 10)
    def bm25Window(dir: String) = {
      // the rejected form, inlined: COUNT window over the term partition
      val d = docs(dir)
      val q = hotQueries(spark)
      val postings = d.select(col("doc_id").as("_did"),
        size(graft.llm.Dedup.tokens(col("text"))).as("_dl"),
        graft.functions.Generators.termCounts(col("text")).as(Seq("term", "tf")))
      val qterms = q.select(col("query_id").as("_qid"),
        explode(array_distinct(graft.llm.Dedup.tokens(col("text")))).as("term"))
      val stats = d.agg(count(lit(1)).as("n_docs"),
        sum(size(graft.llm.Dedup.tokens(col("text")))).as("sum_dl"))
      val wTerm = org.apache.spark.sql.expressions.Window.partitionBy(col("term"))
      val wQ = org.apache.spark.sql.expressions.Window
        .partitionBy(col("_qid")).orderBy(col("score_d").desc, col("_did"))
      postings
        .join(broadcast(qterms.select(col("term")).distinct()), Seq("term"))
        .withColumn("df", count(lit(1)).over(wTerm))
        .join(broadcast(qterms), Seq("term"))
        .crossJoin(broadcast(stats))
        .withColumn("idf", log10(lit(1.0) +
          ((col("n_docs").cast("double") - col("df").cast("double")) + lit(0.5)) /
            (col("df").cast("double") + lit(0.5))))
        .withColumn("tfn",
          (col("tf").cast("double") * lit(2.2)) /
            (col("tf").cast("double") + lit(1.2) *
              (lit(0.25) + (lit(0.75) * col("_dl").cast("double")) /
                (col("sum_dl").cast("double") / col("n_docs").cast("double")))))
        .withColumn("contrib", (col("idf") * col("tfn")).cast("decimal(18,6)"))
        .groupBy(col("_qid"), col("_did"))
        .agg(sum(col("contrib")).as("score_d"))
        .withColumn("rank", row_number().over(wQ))
        .filter(col("rank") <= 10)
    }

    val variants: Seq[(String, String => org.apache.spark.sql.DataFrame)] = Seq(
      "ratio_one_pass" -> ratioOnePass,
      "ratio_two_pass" -> ratioTwoPass,
      "bm25_df_agg_hotquery" -> bm25Agg,
      "bm25_df_window_hotquery" -> bm25Window)

    variants.foreach { case (_, f) =>
      f("/root/testdata/sf0.001").write.format("noop").mode("overwrite").save() }
    val results = variants.map { case (name, f) =>
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        f(sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      name -> ts.min
    }
    def loadavg(): String =
      try new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get("/proc/loadavg"))).trim.split(" ").take(1).mkString
      catch { case _: Throwable => "" }
    println(results.map { case (n, t) => f""""$n":$t%.3f""" }
      .mkString("{", ",", s""","hot_term":"$hotTerm","loadavg":"${loadavg()}"}"""))
    spark.stop()
  }
}
