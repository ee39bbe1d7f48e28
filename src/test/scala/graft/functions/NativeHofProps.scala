package graft.functions

import graft.TestSession
import graft.llm.{Dedup, TextAnalysis}
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties, Test}

/** Property-based bit-exactness of the fused native expressions against
  * their HOF references over RANDOM inputs — the fixed-document specs in
  * `MinHashSpec` pin real-corpus behavior; these pin arbitrary token
  * shapes (unicode, repeats, singletons, long runs).
  */
object NativeHofProps extends Properties("NativeVsHof") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  private lazy val spark = TestSession.spark
  import spark.implicits._

  private val token: Gen[String] =
    Gen.oneOf(
      Gen.alphaNumStr.map(_.take(8)).suchThat(_.nonEmpty),
      Gen.oneOf("aa", "bb", "Ω", "héllo", "x"))

  private val docsGen: Gen[List[Seq[String]]] =
    Gen.listOfN(6, Gen.choose(1, 30).flatMap(n => Gen.listOfN(n, token).map(_.toSeq)))

  property("minhash signature: native == hof") = Prop.forAll(docsGen) { docs =>
    val df = docs.toDF("toks")
    df.select(
      Dedup.minHash(col("toks"), 16).as("n"),
      Dedup.minHashHof(col("toks"), 16).as("h"))
      .filter(col("n") =!= col("h")).count() == 0
  }

  property("simhash bits: native == hof") = Prop.forAll(docsGen) { docs =>
    val df = docs.toDF("toks")
    df.select(
      Dedup.simHashBits(col("toks")).as("n"),
      Dedup.simHashBitsHof(col("toks")).as("h"))
      .filter(col("n") =!= col("h")).count() == 0
  }

  property("winnowing fingerprints: native == hof") = Prop.forAll(docsGen) { docs =>
    val df = docs.map(_.mkString(" ")).toDF("text")
    df.select(
      TextAnalysis.winnowingFingerprints(col("text"), 3, 4).as("n"),
      TextAnalysis.winnowingFingerprintsHof(col("text"), 3, 4).as("h"))
      .filter(col("n") =!= col("h")).count() == 0
  }
}
