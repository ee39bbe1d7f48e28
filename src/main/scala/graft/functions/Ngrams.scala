package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused space-joined word n-grams from a token array — the feature
  * generator of the fasttext-shaped scoring paths (`linearTextScore`
  * bigrams, `lmScore` position pairs). One pass, one StringBuilder per
  * gram; replaces the interpreted HOF
  * `transform(sequence(...), i => concat_ws(" ", element_at...))`, which
  * profiled at ~80% of Q-L41's wall-clock (2.4 s of 3.0 s at sf0.1 —
  * `BASELINE.md` round 10: every element_at is an interpreted per-element
  * call, O(n·k) of them per document).
  *
  * Parity contract with the HOF form it replaces: every CONSECUTIVE
  * position emits (no distinct — the bag semantics), null tokens are
  * skipped inside a gram (`concat_ws` behavior), fewer than n tokens
  * yield an empty array. NULL input yields NULL (standard unary
  * expression discipline); the column wrapper coalesces to the HOF's
  * empty-array convention.
  */
case class WordNgramsJoin(child: Expression, n: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_ngrams"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if n >= 1 => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"word_ngrams expects ARRAY<STRING> with n >= 1, got ${child.dataType.sql} (n=$n)")
  }

  override def nullSafeEval(input: Any): Any =
    route(input.asInstanceOf[ArrayData])

  /** Reference-call body shared by interpreted eval and codegen (the
    * WinnowingFingerprint pattern — the loop is too stateful to inline,
    * but a direct call on the child value keeps the stage compiled).
    */
  def route(arr: ArrayData): ArrayData = {
    val len = arr.numElements()
    if (len < n) return new GenericArrayData(Array.empty[Any])
    val toks = new Array[UTF8String](len)
    var i = 0
    while (i < len) { toks(i) = if (arr.isNullAt(i)) null else arr.getUTF8String(i); i += 1 }
    val out = new Array[Any](len - n + 1)
    i = 0
    while (i <= len - n) {
      val sb = new java.lang.StringBuilder()
      var first = true
      var j = 0
      while (j < n) {
        val t = toks(i + j)
        if (t != null) { // concat_ws parity: nulls omitted, not rendered
          if (!first) sb.append(' ')
          sb.append(t.toString)
          first = false
        }
        j += 1
      }
      out(i) = UTF8String.fromString(sb.toString)
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
                                   ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val ref = ctx.addReferenceObj("wng", this, classOf[WordNgramsJoin].getName)
    nullSafeCodeGen(ctx, ev, arr => s"${ev.value} = $ref.route($arr);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Ngrams {
  /** Column face (token-array input; NULL in → NULL out). */
  def wordNgramsJoin(tokens: Column, n: Int): Column =
    Bridge.column(WordNgramsJoin(Bridge.expression(tokens), n))
}
