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
      // byte-level join: concatWs skips nulls (concat_ws parity) and never
      // charset-decodes — the remaining per-token cost after fusing
      out(i) = UTF8String.concatWs(Ngrams.Space,
        java.util.Arrays.copyOfRange(toks, i, i + n): _*)
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

/** Fused ordered-reassembly: sort an array of (position, segment) structs
  * by position and join the segments — the tail of every "explode → filter
  * → rebuild the document" operator (boilerplate strip, paragraph dedup,
  * repeated-span removal). Replaces
  * `array_join(transform(array_sort(collect_list(struct(...))), _.getField), sep)`,
  * whose interpreted per-element transform/getField dominated Q-L35's
  * materialization cost (count() 0.28 s vs full emit 2.81 s at sf0.1 —
  * the plan's only difference is this projection; `BASELINE.md` round 10).
  */
case class JoinOrderedStructs(child: Expression, sep: String) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "join_ordered"

  private lazy val posIsLong: Boolean = child.dataType match {
    case ArrayType(StructType(fields), _) => fields(0).dataType == LongType
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StructType(Array(p, s)), _)
      if (p.dataType == IntegerType || p.dataType == LongType) && s.dataType == StringType =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"join_ordered expects ARRAY<STRUCT<pos INT|BIGINT, seg STRING>>, got ${child.dataType.sql}")
  }

  override def nullSafeEval(input: Any): Any =
    route(input.asInstanceOf[ArrayData])

  @transient private lazy val sepUtf8: UTF8String = UTF8String.fromString(sep)

  def route(arr: ArrayData): UTF8String = {
    val n = arr.numElements()
    if (n == 0) return UTF8String.EMPTY_UTF8
    val pos = new Array[Long](n)
    val seg = new Array[UTF8String](n)
    val idx = new Array[Integer](n)
    var i = 0
    while (i < n) {
      // null ENTRIES are skipped (array_sort puts them last, the old
      // transform/getField extracted null, array_join dropped it); a null
      // pos with a live segment sorts last instead of silently unboxing
      // to 0 — callers' positions come from posexplode and are non-null,
      // but the Column face is public
      val row = if (arr.isNullAt(i)) null else arr.getStruct(i, 2)
      if (row == null) { pos(i) = Long.MaxValue; seg(i) = null }
      else {
        pos(i) =
          if (row.isNullAt(0)) Long.MaxValue
          else if (posIsLong) row.getLong(0) else row.getInt(0).toLong
        seg(i) = if (row.isNullAt(1)) null else row.getUTF8String(1)
      }
      idx(i) = i
      i += 1
    }
    java.util.Arrays.sort(idx, (a: Integer, b: Integer) =>
      java.lang.Long.compare(pos(a), pos(b)))
    val ordered = new Array[UTF8String](n)
    i = 0
    while (i < n) { ordered(i) = seg(idx(i)); i += 1 }
    UTF8String.concatWs(sepUtf8, ordered: _*) // skips nulls, byte-level
  }

  override protected def doGenCode(ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
                                   ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val ref = ctx.addReferenceObj("jos", this, classOf[JoinOrderedStructs].getName)
    nullSafeCodeGen(ctx, ev, arr => s"${ev.value} = $ref.route($arr);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Fused span-removal tail of `Dedup.removeRepeatedSpans`: given the
  * ORIGINAL token array and the (small) list of hot-span start positions,
  * compute the difference-array coverage and emit the surviving tokens
  * re-joined — one pass, per document, inside the scan projection.
  *
  * This replaces a shape that shuffled EVERY corpus token twice (the
  * per-doc coverage window's sort Exchange + the collect_list regroup);
  * only span starts — hot windows only — now ride any Exchange. NULL
  * `starts` (left-join miss: no repeated span touches this doc) keeps
  * every token; NULL tokens (null text) yields NULL.
  */
case class RemoveSpans(tokens: Expression, starts: Expression, spanTokens: Int)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def left: Expression = tokens
  override def right: Expression = starts
  override def dataType: DataType = StringType
  override def prettyName: String = "remove_spans"
  override def nullable: Boolean = tokens.nullable

  override def checkInputDataTypes(): TypeCheckResult =
    (tokens.dataType, starts.dataType) match {
      case (ArrayType(StringType, _), ArrayType(IntegerType, _)) if spanTokens >= 2 =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"remove_spans expects (ARRAY<STRING>, ARRAY<INT>) with spanTokens >= 2, got " +
          s"(${tokens.dataType.sql}, ${starts.dataType.sql}, spanTokens=$spanTokens)")
    }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val t = tokens.eval(input)
    if (t == null) return null
    val s = starts.eval(input)
    route(t.asInstanceOf[ArrayData],
      if (s == null) null else s.asInstanceOf[ArrayData])
  }

  def route(toks: ArrayData, sp: ArrayData): UTF8String = {
    val n = toks.numElements()
    val cov = new Array[Int](n + 1)
    if (sp != null) {
      var i = 0
      val m = sp.numElements()
      while (i < m) {
        if (!sp.isNullAt(i)) {
          val p = sp.getInt(i)
          if (p >= 0 && p < n) {
            cov(p) += 1
            val end = p + spanTokens
            if (end <= n) cov(end) -= 1
          }
        }
        i += 1
      }
    }
    val keep = new Array[UTF8String](n)
    var k = 0
    var c = 0
    var p = 0
    while (p < n) {
      c += cov(p)
      if (c <= 0 && !toks.isNullAt(p)) { // array_join parity on null tokens
        keep(k) = toks.getUTF8String(p)
        k += 1
      }
      p += 1
    }
    UTF8String.concatWs(Ngrams.Space, java.util.Arrays.copyOf(keep, k): _*)
  }

  override protected def doGenCode(ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
                                   ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val l = tokens.genCode(ctx)
    val r = starts.genCode(ctx)
    val ref = ctx.addReferenceObj("rsp", this, classOf[RemoveSpans].getName)
    val u = "org.apache.spark.unsafe.types.UTF8String"
    ev.copy(code = code"""
      ${l.code}
      boolean ${ev.isNull} = ${l.isNull};
      $u ${ev.value} = null;
      if (!${ev.isNull}) {
        ${r.code}
        ${ev.value} = $ref.route(${l.value}, ${r.isNull} ? null : ${r.value});
      }""")
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(tokens = newLeft, starts = newRight)
}

object Ngrams {
  /** Shared single-space separator for the byte-level concatWs joins. */
  private[functions] val Space: UTF8String = UTF8String.fromString(" ")

  /** Column face (token-array input; NULL in → NULL out). */
  def wordNgramsJoin(tokens: Column, n: Int): Column =
    Bridge.column(WordNgramsJoin(Bridge.expression(tokens), n))

  /** Column face: sort (pos, seg) structs by pos and join segs with `sep`. */
  def joinOrdered(pairs: Column, sep: String): Column =
    Bridge.column(JoinOrderedStructs(Bridge.expression(pairs), sep))

  /** Column face: drop every token covered by a span starting at one of
    * `starts` (NULL starts = keep all), re-join survivors with " ".
    */
  def removeSpans(tokens: Column, starts: Column, spanTokens: Int): Column =
    Bridge.column(RemoveSpans(Bridge.expression(tokens),
      Bridge.expression(starts), spanTokens))
}
