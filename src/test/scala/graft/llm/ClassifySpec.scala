package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[Classify]] — multinomial Naive Bayes train/score: hand-computed
  * probabilities, the argmax tiebreak, smoothing behavior, and
  * partitioning-independence of the DECIMAL score sums.
  */
class ClassifySpec extends SparkSpec {
  import spark.implicits._

  private lazy val labeled = Seq(
    ("good", "Fresh clean"), ("good", "clean"), ("bad", "spam spam"))
    .toDF("label", "text")
  private lazy val model = Classify.nbTrain(labeled, "label", "text")

  test("nbTrain counts the lowercased vocabulary with exact label metadata") {
    val rows = model.collect().map(r => (r.getString(0), r.getString(1)) ->
      ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    // (cnt, label_total, vocab, n_docs, n_docs_total)
    assert(rows(("good", "fresh")) == ((1L, 3L, 3L, 2L, 3L)))
    assert(rows(("good", "clean")) == ((2L, 3L, 3L, 2L, 3L)))
    assert(rows(("bad", "spam")) == ((2L, 2L, 3L, 1L, 3L)))
    assert(rows.size == 3)
  }

  test("nbScoreAll matches hand-computed add-1 log-probabilities") {
    val docs = Seq((1L, "clean fresh"), (2L, "spam"), (3L, "")).toDF("doc_id", "text")
    val got = Classify.nbScoreAll(docs, "doc_id", "text", model)
      .collect().map(r => (r.getLong(0), r.getString(1)) ->
        r.getDecimal(2).doubleValue()).toMap
    def l10(x: Double) = math.log10(x)
    // doc 1 good: prior log10(2/3) + log10(3/6) + log10(2/6)
    assert(math.abs(got((1L, "good")) - (l10(2.0/3) + l10(3.0/6) + l10(2.0/6))) < 1e-4)
    // doc 1 bad: prior log10(1/3) + 2 oov log10(1/5)
    assert(math.abs(got((1L, "bad")) - (l10(1.0/3) + 2 * l10(1.0/5))) < 1e-4)
    // doc 2: good = prior + oov(good); bad = prior + log10(3/5)
    assert(math.abs(got((2L, "good")) - (l10(2.0/3) + l10(1.0/6))) < 1e-4)
    assert(math.abs(got((2L, "bad")) - (l10(1.0/3) + l10(3.0/5))) < 1e-4)
    // token-less doc scores the bare priors
    assert(math.abs(got((3L, "good")) - l10(2.0/3)) < 1e-4)
    assert(math.abs(got((3L, "bad")) - l10(1.0/3)) < 1e-4)
  }

  test("nbClassify picks the argmax label; empty doc falls to the prior-max") {
    val docs = Seq((1L, "clean fresh"), (2L, "spam"), (3L, "")).toDF("doc_id", "text")
    val pred = Classify.nbClassify(docs, "doc_id", "text", model)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(pred == Map(1L -> "good", 2L -> "bad", 3L -> "good"))
  }

  test("alpha shrinks the seen/unseen gap; scores stay finite at heavy smoothing") {
    val docs = Seq((1L, "spam")).toDF("doc_id", "text")
    def gap(alpha: Double): Double = {
      val s = Classify.nbScoreAll(docs, "doc_id", "text", model, alpha)
        .collect().map(r => r.getString(1) -> r.getDecimal(2).doubleValue()).toMap
      s("bad") - s("good")
    }
    assert(gap(100.0) < gap(1.0)) // heavier smoothing flattens the evidence
    intercept[IllegalArgumentException] {
      Classify.nbScoreAll(docs, "doc_id", "text", model, alpha = 0.0)
    }
  }

  test("nbMerge(nbTrain(A), nbTrain(B)) == nbTrain(A union B)") {
    val a = Seq(("good", "fresh clean"), ("bad", "spam")).toDF("label", "text")
    val b = Seq(("good", "clean bright"), ("meh", "plain")).toDF("label", "text")
    val merged = Classify.nbMerge(
      Classify.nbTrain(a, "label", "text"), Classify.nbTrain(b, "label", "text"))
    val direct = Classify.nbTrain(a.unionByName(b), "label", "text")
    def key(df: org.apache.spark.sql.DataFrame) = df
      .select("label", "token", "cnt", "label_total", "vocab", "n_docs", "n_docs_total")
      .as[(String, String, Long, Long, Long, Long, Long)].collect().toSet
    assert(key(merged) == key(direct))
    // and the merged model CLASSIFIES identically to the direct one
    val docs = Seq((1L, "clean"), (2L, "spam"), (3L, "plain")).toDF("doc_id", "text")
    assert(rowsOf(Classify.nbClassify(docs, "doc_id", "text", merged)) ==
      rowsOf(Classify.nbClassify(docs, "doc_id", "text", direct)))
  }

  test("nbSubtract(nbTrain(A ∪ B), nbTrain(B)) == nbTrain(A) (the nbMerge inverse)") {
    val a = Seq(("good", "fresh clean"), ("bad", "spam")).toDF("label", "text")
    // b carries a label absent from a ("meh") — after subtraction the
    // label must disappear entirely, as nbTrain(a) never saw it
    val b = Seq(("good", "clean bright"), ("meh", "plain")).toDF("label", "text")
    val sub = Classify.nbSubtract(
      Classify.nbTrain(a.unionByName(b), "label", "text"),
      Classify.nbTrain(b, "label", "text"))
    def key(df: org.apache.spark.sql.DataFrame) = df
      .select("label", "token", "cnt", "label_total", "vocab", "n_docs", "n_docs_total")
      .as[(String, String, Long, Long, Long, Long, Long)].collect().toSet
    assert(key(sub) == key(Classify.nbTrain(a, "label", "text")))
    // and the subtracted model CLASSIFIES identically to a direct train
    val docs = Seq((1L, "clean"), (2L, "spam")).toDF("doc_id", "text")
    assert(rowsOf(Classify.nbClassify(docs, "doc_id", "text", sub)) ==
      rowsOf(Classify.nbClassify(docs, "doc_id", "text",
        Classify.nbTrain(a, "label", "text"))))
    // subtracting a model never trained in raises loudly, not a clamp
    val e = intercept[Exception] {
      Classify.nbSubtract(
        Classify.nbTrain(a, "label", "text"),
        Classify.nbTrain(Seq(("good", "zz zz")).toDF("label", "text"),
          "label", "text")).collect()
    }
    assert(e.getMessage.contains("nbSubtract") ||
      Option(e.getCause).exists(_.getMessage.contains("nbSubtract")))
  }

  test("nbSubtract doc-count guards fire even with ZERO token evidence") {
    // empty-text docs produce no cnt rows, so the token-count raise alone
    // cannot see them: a subtrahend whose token counts all fit inside the
    // minuend's (zz: 1 ≤ 1 — differences 0 or positive, no cnt raise) but
    // which claims MORE docs must still raise on the doc-count dimension
    // (silently filtering the negative n_docs would delete a surviving
    // label; a negative total would sign-flip every downstream prior)
    val a = Seq(("good", "fresh zz"), ("good", ""), ("good", ""))
      .toDF("label", "text")
    val b = Seq(("good", "zz"), ("good", ""), ("good", ""), ("good", ""))
      .toDF("label", "text")
    val e = intercept[Exception] {
      Classify.nbSubtract(
        Classify.nbTrain(a, "label", "text"),
        Classify.nbTrain(b, "label", "text")).collect()
    }
    def msg(t: Throwable): String =
      t.getMessage + Option(t.getCause).map(_.getMessage).getOrElse("")
    assert(msg(e).contains("doc count"),
      s"expected the doc-count guard, got: ${msg(e)}")
  }

  test("scores are partitioning-independent (DECIMAL sums)") {
    val docs = graft.sources.Tables.load(spark, sf, "documents")
      .select(col("doc_id"), col("text"))
    val m = Classify.nbTrain(
      graft.sources.Tables.load(spark, sf, "documents")
        .select(col("lang").as("label"), col("text")), "label", "text")
    val a = rowsOf(Classify.nbClassify(docs, "doc_id", "text", m))
    val b = rowsOf(Classify.nbClassify(docs.repartition(13), "doc_id", "text", m))
    assert(a == b)
  }
  test("nbTrain fails loudly on NULL labels instead of training a NULL class") {
    val bad = Seq((Option("good"), "clean"), (Option.empty[String], "stray"))
      .toDF("label", "text")
    val e = intercept[Exception] {
      Classify.nbTrain(bad, "label", "text").collect()
    }
    assert(e.getMessage.contains("NULL label") ||
      Option(e.getCause).exists(_.getMessage.contains("NULL label")),
      s"unexpected error: ${e.getMessage}")
  }

}
