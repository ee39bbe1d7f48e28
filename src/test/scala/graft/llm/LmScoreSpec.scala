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

  test("lmEstimate counts MLE bigrams/unigrams over BOS-marked positions") {
    // doc1 pairs: (<s>,a) (a,b) (b,a); doc2 pairs: (<s>,a) (a,b)
    val docs = Seq("a b a", "a b", "").toDF("text")
    val rows = TextAnalysis.lmEstimate(docs, "text").collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(rows(("<s>", "a")) == ((2L, 2L, 0.0)))
    assert(rows(("a", "b")) == ((2L, 2L, 0.0)))
    assert(rows(("b", "a"))._1 == 1L && rows(("b", "a"))._2 == 1L)
    // unigrams: a x3, b x2 over 5 corpus tokens (logp within an ulp —
    // the engine's log10 codegen need not bit-match scala.math.log10)
    assert(rows(("", "a"))._1 == 3L && rows(("", "a"))._2 == 5L)
    assert(math.abs(rows(("", "a"))._3 - math.log10(3.0 / 5.0)) < 1e-12)
    assert(rows(("", "b"))._1 == 2L && rows(("", "b"))._2 == 5L)
    assert(math.abs(rows(("", "b"))._3 - math.log10(2.0 / 5.0)) < 1e-12)
    assert(rows.size == 5)
  }

  test("lmEstimate denominators are exhaustive: sum(cnt) per context == ctx_total") {
    val docs = Seq("x y z x y", "y z z", "x", "").toDF("text")
    val est = TextAnalysis.lmEstimate(docs, "text")
    val bad = est.groupBy("context", "ctx_total")
      .agg(sum("cnt").as("s"))
      .filter(col("s") =!= col("ctx_total")).count()
    assert(bad == 0L)
  }

  test("lmEstimate(minCount) prunes rare rows but keeps exact MLE denominators") {
    val docs = Seq("a b a b", "a b c").toDF("text")
    val est = TextAnalysis.lmEstimate(docs, "text", minCount = 2)
    val keys = est.select("context", "token").as[(String, String)].collect().toSet
    // (b,c) cnt 1, (b,a) cnt 1, unigram c cnt 1 all pruned; denominators
    // keep the full position counts (ctx b has 3 positions)
    assert(!keys.contains(("b", "c")) && !keys.contains(("", "c")))
    val ab = est.filter(col("context") === "a" && col("token") === "b")
      .select("cnt", "ctx_total").as[(Long, Long)].head()
    assert(ab == ((3L, 3L)))
    val bTot = est.filter(col("context") === "b").select("ctx_total")
      .as[Long].collect()
    assert(bTot.forall(_ == 3L))
  }

  test("an estimated model plugs straight into lmScore (train->score loop)") {
    val corpus = Seq("the cat sat", "the cat ran").toDF("text")
    val model = TextAnalysis.lmEstimate(corpus, "text")
    val docs = Seq((1L, "the cat sat")).toDF("doc_id", "text")
    val got = TextAnalysis.lmScore(docs, "doc_id", "text", model)
      .select("sum_logp").as[Double].head()
    // every bigram of the scored doc is in the model: logp(<s>,the)=log10(2/2),
    // logp(the,cat)=log10(2/2), logp(cat,sat)=log10(1/2); lmScore sums at
    // DECIMAL(18,6), so compare at that granularity
    assert(math.abs(got - math.log10(0.5)) < 1e-5)
  }

  test("grouped lmEstimate builds independent per-language models") {
    val docs = Seq(("en", "a b"), ("en", "a c"), ("de", "a a")).toDF("lang", "text")
    val rows = TextAnalysis.lmEstimate(docs, "text", groupCols = Seq("lang"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)) ->
        ((r.getLong(3), r.getLong(4)))).toMap
    // en: pairs (<s>,a)x2 (a,b) (a,c); de: (<s>,a) (a,a)
    assert(rows(("en", "<s>", "a")) == ((2L, 2L)))
    assert(rows(("en", "a", "b")) == ((1L, 2L)))
    assert(rows(("de", "a", "a")) == ((1L, 1L)))
    // unigram totals are per language: en 4 tokens, de 2
    assert(rows(("en", "", "a")) == ((2L, 4L)))
    assert(rows(("de", "", "a")) == ((2L, 2L)))
    // no cross-language rows
    assert(!rows.contains(("de", "a", "b")))
  }

  test("grouped lmScore only probes the document's own language model") {
    val lmg = Seq(
      ("en", "", "the", -1.0), ("en", "<s>", "the", -0.5),
      ("de", "", "the", -3.0), ("de", "<s>", "the", -2.5))
      .toDF("lang", "context", "token", "logp")
    val docs = Seq((1L, "en", "the"), (2L, "de", "the"), (3L, "fr", "the"))
      .toDF("doc_id", "lang", "text")
    val out = TextAnalysis.lmScore(docs, "doc_id", "text", lmg,
      groupCols = Seq("lang")).collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(out(1L) == -0.5)
    assert(out(2L) == -2.5)
    // fr has no model: bigram miss AND unigram miss -> backoff + oov
    assert(out(3L) == -6.4)
  }

  test("lmMerge(estimate(A), estimate(B)) == estimate(A union B) at minCount 1") {
    val a = Seq("the cat sat", "a cat").toDF("text")
    val b = Seq("the cat ran", "the end").toDF("text")
    val merged = TextAnalysis.lmMerge(
      TextAnalysis.lmEstimate(a, "text"), TextAnalysis.lmEstimate(b, "text"))
    val direct = TextAnalysis.lmEstimate(a.unionByName(b), "text")
    def key(df: org.apache.spark.sql.DataFrame) =
      df.select("context", "token", "cnt", "ctx_total")
        .as[(String, String, Long, Long)].collect().toSet
    assert(key(merged) == key(direct))
    // grouped form merges per language independently
    val ga = Seq(("en", "x y"), ("de", "u v")).toDF("lang", "text")
    val gb = Seq(("en", "x z")).toDF("lang", "text")
    val gm = TextAnalysis.lmMerge(
      TextAnalysis.lmEstimate(ga, "text", groupCols = Seq("lang")),
      TextAnalysis.lmEstimate(gb, "text", groupCols = Seq("lang")),
      groupCols = Seq("lang"))
    val gd = TextAnalysis.lmEstimate(ga.unionByName(gb), "text",
      groupCols = Seq("lang"))
    def gkey(df: org.apache.spark.sql.DataFrame) =
      df.select("lang", "context", "token", "cnt", "ctx_total")
        .as[(String, String, String, Long, Long)].collect().toSet
    assert(gkey(gm) == gkey(gd))
  }

  test("lmSubtract(estimate(A ∪ B), estimate(B)) == estimate(A) at minCount 1 (the lmMerge inverse)") {
    val a = Seq("the cat sat", "a cat").toDF("text")
    val b = Seq("the cat ran", "the end").toDF("text")
    val sub = TextAnalysis.lmSubtract(
      TextAnalysis.lmEstimate(a.unionByName(b), "text"),
      TextAnalysis.lmEstimate(b, "text"))
    def key(df: org.apache.spark.sql.DataFrame) =
      df.select("context", "token", "cnt", "ctx_total")
        .as[(String, String, Long, Long)].collect().toSet
    assert(key(sub) == key(TextAnalysis.lmEstimate(a, "text")))
    // logp recomputes from the exact subtracted integers — bit-identical
    val lp = sub.select("context", "token", "logp")
      .as[(String, String, Double)].collect().map(r => (r._1, r._2) -> r._3).toMap
    val want = TextAnalysis.lmEstimate(a, "text").select("context", "token", "logp")
      .as[(String, String, Double)].collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(lp == want)
    // grouped form subtracts per language independently — a language
    // entirely removed disappears from the model
    val ga = Seq(("en", "x y"), ("de", "u v")).toDF("lang", "text")
    val gb = Seq(("de", "u v")).toDF("lang", "text")
    val gs = TextAnalysis.lmSubtract(
      TextAnalysis.lmEstimate(ga, "text", groupCols = Seq("lang")),
      TextAnalysis.lmEstimate(gb, "text", groupCols = Seq("lang")),
      groupCols = Seq("lang"))
    def gkey(df: org.apache.spark.sql.DataFrame) =
      df.select("lang", "context", "token", "cnt", "ctx_total")
        .as[(String, String, String, Long, Long)].collect().toSet
    assert(gkey(gs) == gkey(TextAnalysis.lmEstimate(
      Seq(("en", "x y")).toDF("lang", "text"), "text", groupCols = Seq("lang"))))
    // subtracting a model never merged in raises loudly, not a clamp
    val e = intercept[Exception] {
      TextAnalysis.lmSubtract(
        TextAnalysis.lmEstimate(a, "text"),
        TextAnalysis.lmEstimate(Seq("zz zz zz zz").toDF("text"), "text")).collect()
    }
    assert(e.getMessage.contains("lmSubtract") ||
      Option(e.getCause).exists(_.getMessage.contains("lmSubtract")))
  }

  test("lmSaveTsv -> lmFromTsv round-trips a model; scores are identical") {
    val corpus = Seq("the cat sat", "the cat ran").toDF("text")
    val model = TextAnalysis.lmEstimate(corpus, "text")
    val dir = java.nio.file.Files.createTempDirectory("lmrt").toString + "/m"
    TextAnalysis.lmSaveTsv(model, dir)
    val loaded = TextAnalysis.lmFromTsv(spark, dir)
    val docs = Seq((1L, "the cat sat"), (2L, "zz the")).toDF("doc_id", "text")
    def scores(lm: org.apache.spark.sql.DataFrame) =
      TextAnalysis.lmScore(docs, "doc_id", "text", lm)
        .select("doc_id", "n_tokens", "sum_logp")
        .as[(Long, Long, Double)].collect().toSet
    assert(scores(loaded) == scores(model))
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
