package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DsirSpec extends SparkSpec {
  import spark.implicits._

  // two disjoint-vocabulary populations: "target-like" docs repeat the
  // a-pattern, "other" docs the b-pattern — the likelihood ratio under
  // (target LM, raw LM) separates them by construction
  private def aDoc(i: Int): String = s"alpha beta gamma delta alpha beta tag$i"
  private def bDoc(i: Int): String = s"omega psi chi phi omega psi tag$i"
  private lazy val raw = (
    (1 to 30).map(i => (i.toLong, aDoc(i))) ++
      (31 to 60).map(i => (i.toLong, bDoc(i)))).toDF("doc_id", "text")
  private lazy val target = (101 to 120).map(i => (i.toLong, aDoc(i)))
    .toDF("doc_id", "text")

  test("lmScoreRatio equals the two-pass lmScore composition, DECIMAL-exact") {
    val lmT = TextAnalysis.lmEstimate(target.select(col("text")), "text")
    val lmR = TextAnalysis.lmEstimate(raw.select(col("text")), "text")
    val ratio = TextAnalysis.lmScoreRatio(raw, "doc_id", "text", lmT, lmR)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    val st = TextAnalysis.lmScore(raw, "doc_id", "text", lmT)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val sr = TextAnalysis.lmScore(raw, "doc_id", "text", lmR)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(ratio.keySet == st.keySet)
    ratio.foreach { case (id, (n, lt, lr, lw)) =>
      assert((n, lt) == st(id), s"doc $id target leg diverged")
      assert(lr == sr(id), s"doc $id raw leg diverged")
      // the difference is computed in DECIMAL: both legs are exact
      // decimal(28,6) values, so the expected log_w is their exact
      // decimal difference rounded once to double
      val expected = (BigDecimal(lt.toString) - BigDecimal(lr.toString)).toDouble
      assert(lw == expected, s"doc $id log_w not the DECIMAL difference")
    }
  }

  test("the log10 Gumbel key is an affine map of the true ln-scale Gumbel key") {
    // -log10(-log10 u) = (G + ln ln 10) / ln 10 with G = -ln(-ln u):
    // the scaladoc's exactness claim for Gumbel-top-k, pinned numerically
    val c = math.log(math.log(10.0))
    Seq(1e-6, 0.01, 0.25, 0.5, 0.73, 0.99, 0.999999).foreach { u =>
      val g10 = -math.log10(-math.log10(u))
      val g = -math.log(-math.log(u))
      assert(math.abs(g10 - (g + c) / math.log(10.0)) < 1e-12, s"u=$u")
    }
  }

  test("dsirSelect prefers target-like documents and respects n") {
    val out = Pipelines.dsirSelect(raw, target, n = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(2)))
    assert(out.length == 10)
    // disjoint vocab makes |log_w| >> the Gumbel range, so the noise
    // can never flip a cross-population comparison: all 10 are a-docs
    assert(out.forall(_._1 <= 30L),
      s"selected a b-population doc: ${out.map(_._1).toSeq}")
    // and every a-doc outweighs every b-doc
    val allW = Pipelines.dsirSelect(raw, target, n = 60)
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toMap
    val minA = (1 to 30).map(i => allW(i.toLong)).min
    val maxB = (31 to 60).map(i => allW(i.toLong)).max
    assert(minA > maxB, s"population separation lost: minA=$minA maxB=$maxB")
  }

  test("dsirSelect is partition-layout independent") {
    val base = Pipelines.dsirSelect(raw, target, n = 15)
    val rows = rowsOf(base)
    val repart = Pipelines.dsirSelect(raw.repartition(13), target.repartition(7), n = 15)
    assert(rowsOf(repart) == rows)
  }
}
