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
    // amortized pruning: sort-and-take per ROW is O(k log k) per input on
    // the hot reducer; appending and pruning at 2k is O(log k) amortized
    // with the same results (the buffer stays ≤ 2k−1, capped at finish)
    def reduce(b: Seq[Long], in: Long): Seq[Long] = {
      val a = b :+ in
      if (a.size >= 2 * k) cap(a) else a
    }
    def merge(a: Seq[Long], b: Seq[Long]): Seq[Long] = cap(a ++ b)
    def finish(b: Seq[Long]): Seq[Long] = cap(b)
    private def cap(v: Seq[Long]): Seq[Long] = v.sorted.take(k)
    def bufferEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
    def outputEncoder: Encoder[Seq[Long]] = bufferEncoder
  }

  /** Bounded top-k by similarity (desc, ties → lower id): the similarity-
    * search reducer. Because Aggregators plan partial + final, each map
    * task forwards at most 2k−1 candidates per query into the shuffle
    * (the amortized prune bound) — the window-function form shuffles
    * every scored row, which at 100 TB is the whole |corpus|×|queries|
    * cross product.
    *
    * Generic in the id type `I` so non-numeric doc ids (string/UUID)
    * survive the aggregate unchanged — an earlier Long-only form silently
    * cast string ids to NULL. Instantiate via [[TopKBySim.ofLong]] /
    * [[TopKBySim.ofString]]; id ties break by `ord` (must match the
    * engine-side `ORDER BY id ASC` semantics of the window form).
    *
    * The buffer also DEDUPLICATES candidate ids (first occurrence after
    * the sort — i.e. max-sim — wins): multi-probe LSH and multi-table
    * banding re-encounter the same (query, candidate) pair once per
    * colliding probe/table with an identical recomputed sim, so folding
    * the dedup into the aggregate removes the dedicated
    * `dropDuplicates(query, candidate)` Exchange the tail used to pay
    * BEFORE ranking — the last unbounded shuffle in the ANN paths.
    */
  class TopKBySim[I](k: Int, ord: Ordering[I], enc: Encoder[Seq[(Double, I)]])
      extends Aggregator[(Double, I), Seq[(Double, I)], Seq[(Double, I)]] {
    def zero: Seq[(Double, I)] = Vector.empty
    // A null candidate id cannot identify a corpus row (the window form
    // it mirrors ranks by `id` — a null id's rank there is a coin flip
    // between engines, and boxed-null would NPE inside `ord` during
    // cap()), so null-id candidates are ignored rather than ranked.
    // amortized pruning (same scheme as TopKMin): append per row, prune
    // at 2k, cap at merge/finish — identical results, O(log k) per row
    // instead of a full sort + distinctBy-hash per input. Map-side
    // partial buffers therefore carry at most 2k−1 (not k) candidates
    // into the shuffle — still O(k), never the corpus.
    def reduce(b: Seq[(Double, I)], in: (Double, I)): Seq[(Double, I)] =
      if (in._2 == null) b
      else {
        val a = b :+ in
        if (a.size >= 2 * k) cap(a) else a
      }
    def merge(a: Seq[(Double, I)], b: Seq[(Double, I)]): Seq[(Double, I)] = cap(a ++ b)
    def finish(b: Seq[(Double, I)]): Seq[(Double, I)] = cap(b)
    // Spark's `ORDER BY sim DESC, id ASC` semantics exactly: NaN ranks
    // FIRST (NaN > every real value, strictly above +Infinity — the
    // previous negate-into-TotalOrdering mapping collided the two), and
    // -0.0 == +0.0 (TotalOrdering distinguishes them, which would beat
    // the id tiebreak at a 0.0 boundary).
    private val rankOrd: Ordering[(Double, I)] = new Ordering[(Double, I)] {
      private def norm(d: Double): Double = if (d == 0.0) 0.0 else d
      def compare(x: (Double, I), y: (Double, I)): Int = {
        val c = java.lang.Double.compare(norm(y._1), norm(x._1)) // sim DESC, NaN first
        if (c != 0) c else ord.compare(x._2, y._2) // id ASC
      }
    }
    private def cap(v: Seq[(Double, I)]): Seq[(Double, I)] =
      v.sorted(rankOrd).distinctBy(_._2).take(k)
    def bufferEncoder: Encoder[Seq[(Double, I)]] = enc
    def outputEncoder: Encoder[Seq[(Double, I)]] = enc
  }

  object TopKBySim {
    import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
    def ofLong(k: Int): TopKBySim[Long] =
      new TopKBySim[Long](k, Ordering.Long, ExpressionEncoder[Seq[(Double, Long)]]())
    /** Ties break by UNSIGNED UTF-8 BYTE order — Spark's own UTF8String
      * comparison, i.e. exactly what the window form's `ORDER BY id ASC`
      * uses. Java's `Ordering.String` (UTF-16 code units) agrees with it
      * on the BMP but ranks supplementary-plane codepoints BELOW
      * U+E000–U+FFFF (surrogates sort low in UTF-16, high in UTF-8), so
      * the agg ≡ window equivalence would break on non-BMP doc ids.
      */
    val utf8ByteOrder: Ordering[String] = new Ordering[String] {
      def compare(a: String, b: String): Int =
        org.apache.spark.unsafe.types.UTF8String.fromString(a)
          .compareTo(org.apache.spark.unsafe.types.UTF8String.fromString(b))
    }
    def ofString(k: Int): TopKBySim[String] =
      new TopKBySim[String](k, utf8ByteOrder, ExpressionEncoder[Seq[(Double, String)]]())
  }

  /** Mergeable MinHash sketch over token CHUNKS: the aggregate of a
    * document's chunks (in any order, across any partitioning or — via the
    * streaming sketch state — any micro-batch split) is bit-identical to
    * the one-shot `MinHashSignature` of the concatenated tokens, because
    * per-slot min is associative and commutative. This is the
    * continuous-ingest entry to the near-dup pipeline: accumulate a doc's
    * signature as its parts arrive, band it when complete. O(numHashes)
    * state regardless of document size.
    */
  class MinHashSketch(numHashes: Int)
      extends Aggregator[Seq[String], Seq[Long], Seq[Long]] {
    @transient private lazy val seeds = MinHash.seeds(numHashes)
    def zero: Seq[Long] = Vector.fill(numHashes)(Long.MaxValue)
    def reduce(b: Seq[Long], toks: Seq[String]): Seq[Long] = {
      val a = b.toArray
      MinHash.updateMins(a, toks.iterator, seeds)
      a.toIndexedSeq
    }
    def merge(x: Seq[Long], y: Seq[Long]): Seq[Long] =
      x.lazyZip(y).map(math.min)
    // NULL for a doc whose chunks were all empty — parity with the batch
    // `MinHashSignature`, which returns NULL for an empty token array so
    // the LSH path can filter it out. Without this the untouched
    // [Long.MaxValue × k] sentinel would band like a real signature and
    // collide every empty doc with every other empty doc. (No real token
    // can produce the sentinel: it would need xxhash64 == Long.MaxValue
    // in EVERY slot simultaneously.)
    def finish(b: Seq[Long]): Seq[Long] =
      if (b.forall(_ == Long.MaxValue)) null else b
    def bufferEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
    def outputEncoder: Encoder[Seq[Long]] = bufferEncoder
  }
}
