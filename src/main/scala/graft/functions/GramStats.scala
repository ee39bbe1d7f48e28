package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

/** Fused per-document word-n-gram repetition statistics — the n-gram half
  * of the Gopher repetition battery
  * ([[graft.llm.TextAnalysis.gopherRepetitionStats]]).
  *
  * For each requested n it computes, over the document's word n-grams:
  * `top` = max over distinct grams of len(gram)·count (the
  * top-n-gram-character numerator) and `dup` = Σ over grams with
  * count ≥ 2 of len(gram)·count (the duplicated-n-gram-character
  * numerator), where len(gram) = Σ token chars + (n−1) separators —
  * exactly the character count of the `' '`-joined gram string, which is
  * never materialized. Output is a flat ARRAY<BIGINT>:
  * `[top(n) for topNs] ++ [dup(n) for dupNs]`.
  *
  * A gram's identity is a rotate-xor chain of per-token XXH64s; tokens
  * carry no spaces (they come from a whitespace split), so the joined
  * string decodes uniquely and hash-equality ⟺ gram-equality modulo
  * 64-bit collisions between same-doc same-n grams — vanishing odds, and
  * the DuckDB oracle (Q-L45) that groups by the gram STRING replays the
  * exact integers, so a collision would be caught, not absorbed.
  *
  * Why an expression and not HOFs/relational (both measured at sf0.1):
  * higher-order functions interpret their lambdas per element
  * (sort+fold form: 18.2 s), and a corpus-wide hash-agg exchanges one
  * narrow row PER GRAM to compute groups that never span documents
  * (7.9 s). This expression does the whole battery in primitive arrays
  * riding the scan — per document O(Σ_n G·n) chaining + an O(G log G)
  * tandem sort per n, no shuffle, no per-element boxing. Same argument
  * as [[MinHashSignature]]: hot per-row loops deserve fusion.
  *
  * Null tokens hash as empty strings with zero length (whitespace splits
  * never produce them; the rule exists so the expression totals, not
  * throws, on hand-built arrays).
  */
case class GopherGramStats(child: Expression, topNs: Seq[Int], dupNs: Seq[Int])
    extends UnaryExpression {

  private val allNs: Seq[Int] = (topNs ++ dupNs).distinct.sorted

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "gopher_gram_stats"
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if allNs.nonEmpty && allNs.forall(_ >= 2) =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"gopher_gram_stats expects ARRAY<STRING> and n-gram sizes >= 2, got " +
        s"${child.dataType.sql} with topNs=$topNs dupNs=$dupNs")
  }

  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[ArrayData])

  /** The whole battery for one document; public so codegen can call it. */
  def compute(arr: ArrayData): ArrayData = {
    val sz = arr.numElements()
    val th = new Array[Long](sz)
    val tl = new Array[Int](sz)
    var t = 0
    while (t < sz) {
      if (arr.isNullAt(t)) {
        // hash as an EMPTY STRING (not an int sentinel): a null and an
        // empty token join to the same ' '-separated gram string, so the
        // string-grouping oracle and this key must agree
        th(t) = XXH64.hashUTF8String(
          org.apache.spark.unsafe.types.UTF8String.EMPTY_UTF8, 42L)
        tl(t) = 0
      } else {
        val s = arr.getUTF8String(t)
        th(t) = XXH64.hashUTF8String(s, 42L); tl(t) = s.numChars()
      }
      t += 1
    }
    val out = new Array[Long](topNs.size + dupNs.size)
    allNs.foreach { n =>
      if (sz >= n) {
        val m = sz - n + 1
        val keys = new Array[Long](m)
        val lens = new Array[Int](m)
        var i = 0
        while (i < m) {
          var k = 0L
          var le = n - 1
          var j = 0
          while (j < n) {
            k = (k << 5 | k >>> 59) ^ th(i + j)
            le += tl(i + j)
            j += 1
          }
          keys(i) = k; lens(i) = le
          i += 1
        }
        sortPairs(keys, lens, 0, m - 1)
        // linear pass over equal-key runs
        var top = 0L
        var dup = 0L
        var runStart = 0
        i = 1
        while (i <= m) {
          if (i == m || keys(i) != keys(runStart)) {
            val run = (i - runStart).toLong
            val chars = lens(runStart).toLong * run
            if (chars > top) top = chars
            if (run >= 2L) dup += chars
            runStart = i
          }
          i += 1
        }
        // fill EVERY slot carrying this n (a duplicated n in topNs/dupNs
        // would otherwise leave later slots at a silent 0)
        var s = 0
        while (s < topNs.size) {
          if (topNs(s) == n) out(s) = top
          s += 1
        }
        s = 0
        while (s < dupNs.size) {
          if (dupNs(s) == n) out(topNs.size + s) = dup
          s += 1
        }
      }
    }
    new GenericArrayData(out)
  }

  // tandem THREE-WAY quicksort: keys drive the order, lens travel with
  // them. Three-way partitioning matters here: a maximally repetitive
  // document (the very thing this filter hunts) yields long runs of
  // EQUAL keys, which a two-way partition degrades to O(m²) time and
  // O(m) recursion depth on; the equal band collapses in one pass.
  // Recursing only into the smaller side bounds depth at O(log m).
  private def sortPairs(keys: Array[Long], lens: Array[Int], lo0: Int, hi0: Int): Unit = {
    var lo = lo0
    var hi = hi0
    while (lo < hi) {
      val pivot = keys(lo + (hi - lo) / 2)
      var lt = lo
      var gt = hi
      var i = lo
      while (i <= gt) {
        val c = java.lang.Long.compare(keys(i), pivot)
        if (c < 0) {
          val tk = keys(i); keys(i) = keys(lt); keys(lt) = tk
          val tl0 = lens(i); lens(i) = lens(lt); lens(lt) = tl0
          lt += 1; i += 1
        } else if (c > 0) {
          val tk = keys(i); keys(i) = keys(gt); keys(gt) = tk
          val tl0 = lens(i); lens(i) = lens(gt); lens(gt) = tl0
          gt -= 1
        } else i += 1
      }
      if (lt - lo < hi - gt) {
        sortPairs(keys, lens, lo, lt - 1); lo = gt + 1
      } else {
        sortPairs(keys, lens, gt + 1, hi); hi = lt - 1
      }
    }
  }

  // Real codegen: one call into [[compute]] on the already-evaluated
  // child — the heavy lifting is a single fused primitive-array pass per
  // ROW, so the generated stage stays whole-stage-compiled with no
  // row-boxing round trip (the CodegenFallback path would box the entire
  // InternalRow per document).
  override protected def doGenCode(ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
                                   ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val ref = ctx.addReferenceObj("gramStats", this, classOf[GopherGramStats].getName)
    nullSafeCodeGen(ctx, ev, arr => s"${ev.value} = $ref.compute($arr);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object GramStats {
  /** Column face. */
  def gopherGramStats(tokens: Column, topNs: Seq[Int], dupNs: Seq[Int]): Column =
    Bridge.column(GopherGramStats(Bridge.expression(tokens), topNs, dupNs))
}
