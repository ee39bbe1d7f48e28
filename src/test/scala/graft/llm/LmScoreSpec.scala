package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[TextAnalysis.lmScore]] — the CCNet-style stupid-backoff bigram LM:
  * every scoring path hand-checked, plus the perplexity identity and the
  * TSV loader round trip.
  */
class LmScoreSpec extends SparkSpec {
  import spark.implicits._

  private lazy val lm = Seq(
    ("", "the", -1.0), ("", "cat", -2.0),
    ("<s>", "the", -0.5), ("the", "cat", -0.25))
    .toDF("context", "token", "logp")

  test("lmScore walks BOS-bigram, interior-bigram, backoff and OOV paths") {
    val docs = Seq(
      // <s>,the hit (-0.5); the,cat hit (-0.25); cat,zzz OOV (-0.4-6.0)
      (1L, "the cat zzz"),
      // <s>,cat miss -> backoff+uni(cat) = -2.4; cat,the miss ->
      // backoff+uni(the) = -1.4
      (2L, "cat the"),
      // all misses, no unigrams: 2 x (-6.4)
      (3L, "zzz qqq"),
      (4L, "")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.lmScore(docs, "doc_id", "text", lm).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(out(1L) == ((3L, -0.5 - 0.25 - 6.4)))
    assert(out(2L) == ((2L, -2.4 - 1.4)))
    assert(out(3L) == ((2L, -12.8)))
    assert(out(4L) == ((0L, 0.0)))
  }

  test("perplexity is 10^(-mean logp) and null on empty docs") {
    val docs = Seq((1L, "the cat"), (2L, " ")).toDF("doc_id", "text")
    val rows = TextAnalysis.lmScore(docs, "doc_id", "text", lm)
      .select(col("doc_id"), col("sum_logp"), col("n_tokens"), col("perplexity"))
      .collect().map(r => r.getLong(0) -> r).toMap
    val r1 = rows(1L)
    assert(math.abs(r1.getDouble(3)
      - math.pow(10.0, -r1.getDouble(1) / r1.getLong(2))) < 1e-12)
    assert(rows(2L).isNullAt(3))
  }

  test("lmFromTsv loads unigram (empty-context) and bigram rows") {
    val dir = java.nio.file.Files.createTempDirectory("lm").toFile
    val f = new java.io.File(dir, "lm.tsv")
    val w = new java.io.PrintWriter(f)
    w.println("\tthe\t-1.0")
    w.println("the\tcat\t-0.25")
    w.close()
    val loaded = TextAnalysis.lmFromTsv(spark, f.getPath)
    val rows = loaded.collect().map(r =>
      (r.getString(0), r.getString(1), r.getDouble(2))).toSet
    assert(rows == Set(("", "the", -1.0), ("the", "cat", -0.25)))
    // loaded model scores the doc: BOS bigram missing from the TSV model
    // -> backoff+uni(the) = -1.4; (the,cat) hit = -0.25
    val docs = Seq((1L, "the cat")).toDF("doc_id", "text")
    val viaTsv = TextAnalysis.lmScore(docs, "doc_id", "text", loaded)
      .select("sum_logp").as[Double].head()
    assert(viaTsv == -1.4 - 0.25)
  }
}
