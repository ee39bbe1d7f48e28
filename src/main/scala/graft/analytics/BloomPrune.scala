package graft.analytics

import graft.core._
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.BinaryType
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bloom-filter join pruning — the pre-shuffle fact-side filter that makes
  * selective joins survive 100 TB.
  *
  * A shuffle join moves EVERY fact row, including the (often vast) majority
  * that match no dimension key. Building a Bloom filter over the dimension
  * keys (one small agg job, the filter itself is KBs–MBs) and applying
  * `might_contain` to the fact side BEFORE the join lets the filter ride
  * down to the scan, so non-matching rows never enter the exchange. This is
  * the manual form of Spark's runtime row-group filtering, usable when the
  * dimension side is a computed frame the optimizer can't see through.
  *
  * False positives only (fpp-bounded) — the join's own condition removes
  * them, so results are exactly equal to the unpruned join.
  */
object BloomPrune {

  /** Serialized Bloom filter over `key` of `dim` (driver holds only the
    * filter bytes, never the keys). Returns None when `dim` is empty.
    */
  def buildFilter(dim: DataFrame, key: Column,
                  expectedItems: Long = 1000000L, fpp: Double = 0.03): Option[Array[Byte]] = {
    // optimal bits for (n, p): -n·ln(p)/ln(2)²
    val numBits = math.max(64L,
      math.ceil(-expectedItems * math.log(fpp) / (math.log(2) * math.log(2))).toLong)
    val agg = new BloomFilterAggregate(
      Bridge.expression(xxhash64(key)), Literal(expectedItems), Literal(numBits))
      .toAggregateExpression()
    Option(dim.select(Bridge.column(agg)).head().getAs[Array[Byte]](0))
  }

  /** Fact rows whose `key` might appear in the filter. */
  def mightContain(filterBytes: Array[Byte], key: Column): Column =
    Bridge.column(BloomFilterMightContain(
      Literal(filterBytes, BinaryType), Bridge.expression(xxhash64(key))))

  /** Prune `fact` to rows whose `factKey` might match a `dimKey` — the
    * filter is an ordinary predicate, so Catalyst pushes it into the scan.
    */
  def prune(fact: DataFrame, factKey: Column, dim: DataFrame, dimKey: Column,
            expectedItems: Long = 1000000L, fpp: Double = 0.03): DataFrame =
    buildFilter(dim, dimKey, expectedItems, fpp) match {
      case Some(bytes) => fact.filter(mightContain(bytes, factKey))
      case None        => fact.filter(lit(false)) // empty dim: nothing joins
    }

  /** Join types for which dropping unmatched FACT (left) rows cannot
    * change the result. Left/full outer and left_anti NEED unmatched fact
    * rows, so pruning would silently corrupt them.
    */
  private val SafeJoinTypes = Set("inner", "leftsemi", "semi", "rightouter", "right")

  /** Stage face: Bloom-pruned equi join (prune fact pre-shuffle, then
    * join). Restricted to join types where unmatched fact rows are dropped
    * anyway (inner / left_semi / right_outer) — for outer-preserving
    * types use a plain join.
    *
    * The filter bytes are memoized per stage INSTANCE: the engine's
    * "no action at plan-composition time" invariant is relaxed to
    * at-most-one dimension job for the stage's lifetime — re-applying the
    * stage re-uses the bytes (spec-asserted), it does not re-scan `dim`.
    */
  def prunedJoin(name: String, dim: DataFrame, factKey: Column, dimKey: Column,
                 cond: Column, how: String = "inner",
                 expectedItems: Long = 1000000L, fpp: Double = 0.03): Stage = {
    require(SafeJoinTypes.contains(how.toLowerCase.replace("_", "")),
      s"prunedJoin: join type '$how' preserves unmatched fact rows; Bloom pruning " +
        "would drop them. Use inner/left_semi/right_outer or a plain join.")
    new Stage {
      val id: StageId = StageId(name)
      private lazy val filterBytes: Option[Array[Byte]] =
        buildFilter(dim, dimKey, expectedItems, fpp)
      def apply(df: DataFrame): DataFrame = {
        val pruned = filterBytes match {
          case Some(bytes) => df.filter(mightContain(bytes, factKey))
          case None        => df.filter(lit(false)) // empty dim: inner/semi join is empty
        }
        pruned.join(dim, cond, how)
      }
      override protected def kind: String = "BloomPrunedJoin"
    }
  }
}
