package graft.functions

import graft.TestSession
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties, Test}

/** Distributed-equivalence properties for the bounded top-k aggregate:
  * over RANDOM (sim, id) multisets — duplicates, ties, and NaN included —
  * and random partitionings, `TopKBySim` must equal the sequential
  * reference (sort NaN-first/sim-desc/id-asc, first occurrence per id,
  * take k). This is the algebraic guarantee behind dropping the
  * pre-aggregate `dropDuplicates` Exchange from the ANN tails: the
  * buffer's cap+dedup must commute with partial/final splits.
  */
object AggregatorProps extends Properties("TopKBySim") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  private lazy val spark = TestSession.spark
  import spark.implicits._

  // small sim/id domains force duplicates and sim ties
  private val simGen: Gen[Double] =
    Gen.frequency(
      8 -> Gen.choose(0, 8).map(_ / 8.0),
      1 -> Gen.const(Double.NaN))
  private val rowGen: Gen[(Double, Long)] =
    for { s <- simGen; id <- Gen.choose(1L, 12L) } yield (s, id)
  private val input: Gen[(List[(Double, Long)], Int, Int)] = for {
    n <- Gen.choose(1, 40)
    rows <- Gen.listOfN(n, rowGen)
    k <- Gen.choose(1, 6)
    parts <- Gen.choose(1, 6)
  } yield (rows, k, parts)

  private def reference(rows: List[(Double, Long)], k: Int): Seq[(Double, Long)] =
    rows.sortBy { case (sim, id) =>
      (if (sim.isNaN) Double.NegativeInfinity else -sim, id)
    }.distinctBy(_._2).take(k)

  property("distributed cap+dedup == sequential reference, any partitioning") =
    Prop.forAll(input) { case (rows, k, parts) =>
      val topk = udaf(Aggregators.TopKBySim.ofLong(k))
      val got = rows.toDF("sim", "id").repartition(parts)
        .agg(topk(col("sim"), col("id")))
        .head().getSeq[org.apache.spark.sql.Row](0)
        .map(r => (r.getDouble(0), r.getLong(1)))
      val want = reference(rows, k)
      // NaN != NaN under ==; compare on a NaN-safe key
      def key(s: Seq[(Double, Long)]) = s.map { case (d, i) =>
        (if (d.isNaN) "nan" else d.toString, i)
      }
      key(got) == key(want)
    }

  property("string-id variant agrees with the long variant on stringified ids") =
    Prop.forAll(input) { case (rows, k, parts) =>
      // zero-pad so lexicographic string order == numeric order
      val topkS = udaf(Aggregators.TopKBySim.ofString(k))
      val gotS = rows.map { case (s, id) => (s, f"$id%03d") }
        .toDF("sim", "id").repartition(parts)
        .agg(topkS(col("sim"), col("id")))
        .head().getSeq[org.apache.spark.sql.Row](0)
        .map(r => (r.getDouble(0), r.getString(1).toLong))
      val want = reference(rows, k)
      def key(s: Seq[(Double, Long)]) = s.map { case (d, i) =>
        (if (d.isNaN) "nan" else d.toString, i)
      }
      key(gotS) == key(want)
    }
}
