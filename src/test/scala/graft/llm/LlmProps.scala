package graft.llm

import graft.TestSession
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties, Test}

/** Invariant properties for the round-3 text operators: bounds and
  * structural laws that must hold for ANY corpus, generated randomly —
  * the complement to the fixture-pinned oracle rows.
  */
object LlmProps extends Properties("LlmOps") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  private lazy val spark = TestSession.spark
  import spark.implicits._

  private val word: Gen[String] = Gen.oneOf(
    "alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta", "theta")

  private val docGen: Gen[String] = for {
    nLines <- Gen.choose(0, 5)
    lines <- Gen.listOfN(nLines, for {
      nWords <- Gen.choose(0, 8)
      ws <- Gen.listOfN(nWords, word)
    } yield ws.mkString(" "))
  } yield lines.mkString("\n")

  private val corpusGen: Gen[List[(Long, String)]] = for {
    n <- Gen.choose(1, 12)
    docs <- Gen.listOfN(n, docGen)
  } yield docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }

  property("dupLineFrac stays in [0, 1) and is 0 for distinct-line docs") =
    Prop.forAll(corpusGen) { rows =>
      val fracs = rows.toDF("doc_id", "text")
        .select(TextAnalysis.dupLineFrac(col("text"))).as[Double].collect()
      fracs.forall(f => f >= 0.0 && f < 1.0)
    }

  property("topTokenFrac is in (0, 1] and 1 iff the doc repeats one token") =
    Prop.forAll(corpusGen) { rows =>
      val df = rows.toDF("doc_id", "text")
      val got = TextAnalysis.topTokenFrac(df, "doc_id", "text")
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      // reference tokenizer must match Dedup.tokens: SPACE-split only
      // (a newline inside a token stays in the token)
      val toks = rows.map { case (id, t) =>
        id -> t.split(" ").filter(_.nonEmpty).toSeq
      }.toMap
      got.forall { case (id, f) =>
        val ts = toks(id)
        f > 0.0 && f <= 1.0 &&
          ((f == 1.0) == (ts.distinct.size == 1)) &&
          math.abs(f - ts.groupBy(identity).values.map(_.size).max.toDouble / ts.size) < 1e-12
      } && got.keySet == toks.filter(_._2.nonEmpty).keySet // zero-token docs absent
    }

  property("decontaminate flags a subset at longer n (sharing a 3-gram implies sharing its 2-grams)") =
    Prop.forAll(corpusGen) { rows =>
      val df = rows.toDF("doc_id", "text")
      val bench = df.filter(col("doc_id") < 3)
      val corpus = df.filter(col("doc_id") >= 3)
      def flagged(n: Int): Set[Long] =
        Dedup.decontaminate(corpus, bench, "doc_id", "text", n = n)
          .select("doc_id").as[Long].collect().toSet
      flagged(3).subsetOf(flagged(2))
    }

  property("paragraph dedup: surviving paragraphs = distinct input paragraphs, each once") =
    Prop.forAll(corpusGen) { rows =>
      val df = rows.toDF("doc_id", "text")
      val out = Dedup.dropDuplicateParagraphs(df, "doc_id", "text")
      val survivors = out.select(explode(split(col("text_dedup"), "\n")))
        .as[String].collect().toSeq
      val inputParas = rows.flatMap(_._2.split("\n")).map(_.trim).filter(_.nonEmpty)
      survivors.sorted == inputParas.distinct.sorted &&
        survivors.size == survivors.distinct.size
    }
}
