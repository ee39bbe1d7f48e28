package graft.combinators

import graft.TestSession
import graft.core._
import graft.stages.{Transform, Where}
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties, Test}

/** Property-based combinator laws (`SURVEY.md §5.2`): Sequence
  * associativity, Filter/Switch identity laws, wrapper transparency.
  */
object LawsProps extends Properties("CombinatorLaws") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  private lazy val spark = TestSession.spark
  import spark.implicits._

  private val rowsGen: Gen[List[(Int, String, Double)]] =
    Gen.listOfN(12, for {
      id <- Gen.choose(0, 50)
      tag <- Gen.oneOf("a", "b", "c", "")
      x <- Gen.choose(-100.0, 100.0)
    } yield (id, tag, x))

  private def df(rows: List[(Int, String, Double)]) =
    rows.toDF("id", "tag", "x")

  private def contentOf(d: org.apache.spark.sql.DataFrame): Set[Seq[Any]] =
    d.collect().map(_.toSeq).toSet

  private val sA = Where("wA", col("x") > -50)
  private val sB = Transform("tB")("x2" -> (col("x") * 2))
  private val sC = Transform("tC")("tag" -> upper(col("tag")))

  property("sequence associativity") = Prop.forAll(rowsGen) { rows =>
    val base = df(rows)
    val left = Sequence("l")(Sequence("ab")(sA, sB), sC)(base)
    val right = Sequence("r")(sA, Sequence("bc")(sB, sC))(base)
    val flat = Sequence("f")(sA, sB, sC)(base)
    contentOf(left) == contentOf(flat) && contentOf(right) == contentOf(flat)
  }

  property("filter(false) is identity") = Prop.forAll(rowsGen) { rows =>
    val base = df(rows)
    contentOf(Filter("f", lit(false), sB)(base).select("id", "tag", "x")) ==
      contentOf(base)
  }

  property("filter(true) equals applying the stage to everything") = Prop.forAll(rowsGen) { rows =>
    val base = df(rows)
    contentOf(Filter("f", lit(true), sB)(base)) == contentOf(sB(base))
  }

  property("switch with no routes is identity") = Prop.forAll(rowsGen) { rows =>
    val base = df(rows)
    contentOf(Switch(StageId("sw"), col("tag"), Nil)(base)) == contentOf(base)
  }

  property("switch partitions rows: branch + passthrough cover everything once") =
    Prop.forAll(rowsGen) { rows =>
      val base = df(rows)
      val sw = Switch("sw", col("tag"))("a" -> Stage.identity("ra"), "b" -> Stage.identity("rb"))
      sw(base).count() == base.count()
    }

  property("filter fast path ≡ split-union, even when outs overwrite cond columns") =
    Prop.forAll(rowsGen) { rows =>
      val base = df(rows)
      // x is both read by cond and overwritten by the first out; y reads
      // the sequentially-updated x — the exact shape that diverged before
      // gate pinning
      val tr = Transform("t")("x" -> (col("x") * -1), "y" -> (col("x") + 1))
      val cond = col("x") > 0
      val fast = Filter("f", cond, tr)(base)
      val opaque = Stage(StageId("t"))(d => tr(d)) // forces the split-union path
      val split = Filter("f2", cond, opaque)(base)
      contentOf(fast.select("id", "tag", "x", "y")) ==
        contentOf(split.select("id", "tag", "x", "y"))
    }

  property("switch single-pass ≡ split-union when a route overwrites the key") =
    Prop.forAll(rowsGen) { rows =>
      val base = df(rows)
      val tr = Transform("ra")("tag" -> lit("z"), "r" -> concat(col("tag"), lit("!")))
      val single = Switch("sw", col("tag"))("a" -> tr)(base)
      val opaque = Stage(StageId("ra"))(d => tr(d))
      val split = Switch("sw2", col("tag"))("a" -> opaque)(base)
      contentOf(single.select("id", "tag", "x", "r")) ==
        contentOf(split.select("id", "tag", "x", "r"))
    }

  property("retry(1) on success is transparent") = Prop.forAll(rowsGen) { rows =>
    val base = df(rows)
    val direct = contentOf(sB(base))
    val retried = contentOf(Retry("r", 1).run(sB(base)))
    direct == retried
  }

  property("fallback picks the first non-null alternative") = Prop.forAll(rowsGen) { rows =>
    val base = df(rows)
    val fb = Fallback("fb", "out")(
      when(col("tag") =!= "", col("tag")), lit("dflt"))
    val out = ErrorChannel.good(fb(base))
    out.filter(
      (col("tag") =!= "" && col("out") =!= col("tag")) ||
      (col("tag") === "" && col("out") =!= "dflt")).count() == 0
  }
}
