package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** User-registrable typed aggregators — the Concurrent-reducer extension
  * point (`SURVEY.md §7.3`: custom `Aggregator[IN,BUF,OUT]` for exotic
  * reducers users hand to C2). Spark plans partial (map-side) + final
  * automatically for Aggregators, so these distribute like built-ins.
  */
object Aggregators {

  /** Weighted mean with exact Kahan-free double accumulation. */
  class WeightedMean extends Aggregator[(Double, Double), (Double, Double), Double] {
    def zero: (Double, Double) = (0.0, 0.0) // (sum(w*x), sum(w))
    def reduce(b: (Double, Double), in: (Double, Double)): (Double, Double) =
      (b._1 + in._1 * in._2, b._2 + in._2)
    def merge(a: (Double, Double), b: (Double, Double)): (Double, Double) =
      (a._1 + b._1, a._2 + b._2)
    def finish(b: (Double, Double)): Double = if (b._2 == 0) 0.0 else b._1 / b._2
    def bufferEncoder: Encoder[(Double, Double)] = Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble)
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Bounded top-k smallest (by Long key) kept distributed: the buffer is a
    * size-capped sorted vector, merge is a k-way cap — O(k) state per
    * partition regardless of input size.
    */
  class TopKMin(k: Int) extends Aggregator[Long, Seq[Long], Seq[Long]] {
    def zero: Seq[Long] = Vector.empty
    def reduce(b: Seq[Long], in: Long): Seq[Long] = cap(b :+ in)
    def merge(a: Seq[Long], b: Seq[Long]): Seq[Long] = cap(a ++ b)
    def finish(b: Seq[Long]): Seq[Long] = b
    private def cap(v: Seq[Long]): Seq[Long] = v.sorted.take(k)
    def bufferEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
    def outputEncoder: Encoder[Seq[Long]] = bufferEncoder
  }

  /** Bounded top-k by similarity (desc, ties → lower id): the similarity-
    * search reducer. Because Aggregators plan partial + final, each map
    * task forwards AT MOST k candidates per query into the shuffle — the
    * window-function form shuffles every scored row, which at 100 TB is
    * the whole |corpus|×|queries| cross product.
    */
  class TopKBySim(k: Int)
      extends Aggregator[(Double, Long), Seq[(Double, Long)], Seq[(Double, Long)]] {
    def zero: Seq[(Double, Long)] = Vector.empty
    def reduce(b: Seq[(Double, Long)], in: (Double, Long)): Seq[(Double, Long)] = cap(b :+ in)
    def merge(a: Seq[(Double, Long)], b: Seq[(Double, Long)]): Seq[(Double, Long)] = cap(a ++ b)
    def finish(b: Seq[(Double, Long)]): Seq[(Double, Long)] = b
    // NaN ranks FIRST under `sim DESC` in both Spark SQL and the DuckDB
    // oracle (NaN > every real value); Scala's TotalOrdering would rank it
    // last — map NaN below every real negation so the aggregate agrees
    // with the window form even on degenerate (zero-norm) vectors.
    private def cap(v: Seq[(Double, Long)]): Seq[(Double, Long)] =
      v.sortBy { case (sim, id) =>
        (if (sim.isNaN) Double.NegativeInfinity else -sim, id)
      }.take(k)
    def bufferEncoder: Encoder[Seq[(Double, Long)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
    def outputEncoder: Encoder[Seq[(Double, Long)]] = bufferEncoder
  }
}
