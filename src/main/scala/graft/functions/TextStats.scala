package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native single-pass text statistics (optimization round 21, guide §1.2
  * step 2): the Gopher/C4 page batteries were chains of CodegenFallback
  * higher-order functions — `aggregate(toks, ...)` for the word-length
  * sum, `filter(transform(split(...)))` for every line battery, and an
  * `rlike` java.util.regex Matcher per TOKEN for the alphabetic rule —
  * so every document paid dozens of interpreted lambda calls plus the
  * full tokenization materialized just to be counted. These expressions
  * compute the identical values in one or two passes over the UTF-8
  * bytes, inside whole-stage codegen (and, being codegen'd, they CSE:
  * the HOF battery re-evaluated per consuming flag column).
  *
  * Byte-scan correctness: every delimiter and marker tested here —
  * space 0x20, newline 0x0A, '#', '.', '-', '*', '!', '?', '"' — is a
  * single ASCII byte, and UTF-8 guarantees no continuation byte of a
  * multi-byte sequence falls in the ASCII range, so byte comparison is
  * exact; the two non-ASCII markers ('•' bullet E2 80 A2 and '…'
  * ellipsis E2 80 A6) are matched as their full 3-byte sequences.
  * Character counts replicate `length()` = UTF8String.numChars (count of
  * non-continuation bytes); the per-token letter test replicates
  * `rlike "\\p{L}"` (ASCII fast path, else the same String→codepoint
  * path the regex engine reads). Bit-equality with the HOF forms is
  * spec-pinned in `TextStatsSpec` (fixtures + real corpus text).
  */
object TextStats {
  /** Column face: the [[GopherTextFlags]] 6-flag struct. */
  def gopherFlags(text: Column): Column =
    Bridge.column(GopherTextFlags(Bridge.expression(text)))

  /** Column face: C4 line cleaning ([[C4CleanLinesExpr]]). */
  def c4CleanLines(text: Column, minWords: Int): Column =
    Bridge.column(C4CleanLinesExpr(Bridge.expression(text), minWords))

  /** Column face: trimmed non-empty lines ([[LinesNonEmpty]]). */
  def linesNonEmpty(text: Column): Column =
    Bridge.column(LinesNonEmpty(Bridge.expression(text)))

  /** Column face: trimmed non-empty paragraphs ([[ParasNonEmpty]]). */
  def parasNonEmpty(text: Column): Column =
    Bridge.column(ParasNonEmpty(Bridge.expression(text)))

  /** Shared: count of non-continuation bytes in [from, to) — exactly
    * UTF8String.numChars over that slice.
    */
  private[functions] def chars(b: Array[Byte], from: Int, to: Int): Long = {
    var c = 0L
    var j = from
    while (j < to) {
      if ((b(j) & 0xC0) != 0x80) c += 1
      j += 1
    }
    c
  }

  /** Shared: does the token slice contain a Unicode letter (`\p{L}`)?
    * ASCII letters resolve on the bytes; any non-ASCII byte falls back to
    * the same String→codepoint view the regex engine matches against.
    */
  private[functions] def hasLetter(b: Array[Byte], from: Int, to: Int): Boolean = {
    var nonAscii = false
    var j = from
    while (j < to) {
      val v = b(j) & 0xFF
      if ((v >= 'A' && v <= 'Z') || (v >= 'a' && v <= 'z')) return true
      if (v >= 0x80) nonAscii = true
      j += 1
    }
    if (!nonAscii) return false
    val s = UTF8String.fromBytes(b, from, to - from).toString
    var k = 0
    while (k < s.length) {
      val cp = s.codePointAt(k)
      if (Character.isLetter(cp)) return true
      k += Character.charCount(cp)
    }
    false
  }
}

/** The Gopher quality battery as ONE codegen'd expression: token count,
  * word-length sum, alphabetic-token count in a single token pass;
  * line/bullet/ellipsis counts in a single line pass; '#' and '...'
  * symbol counts (with '…' counted as three dot units, the
  * translate-then-count-triples rule) in a single symbol pass. Flags are
  * the same exact-integer comparisons as the HOF form.
  */
case class GopherTextFlags(child: Expression) extends UnaryExpression {

  // HOF parity: `struct(...)` is itself never null — NULL text yields a
  // struct whose six FIELDS are null (size(null)=null propagates through
  // every comparison), and that is what this expression returns too
  override def dataType: DataType = StructType(Seq(
    StructField("ok_length", BooleanType, nullable = true),
    StructField("ok_word_len", BooleanType, nullable = true),
    StructField("ok_symbols", BooleanType, nullable = true),
    StructField("ok_bullets", BooleanType, nullable = true),
    StructField("ok_ellipsis", BooleanType, nullable = true),
    StructField("ok_alpha", BooleanType, nullable = true)))
  override def prettyName: String = "gopher_text_flags"
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"gopher_text_flags expects STRING, got ${other.sql}")
  }

  /** All-null fields, the null-text battery (values never mutated, so one
    * shared instance is safe).
    */
  private val nullFlags = new GenericInternalRow(6)
  def nullRow(): InternalRow = nullFlags

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) nullFlags else route(v.asInstanceOf[UTF8String])
  }

  def route(s: UTF8String): InternalRow = {
    val b = s.getBytes
    val n = b.length

    // token pass: count, char-length sum, tokens containing a letter
    var nTok = 0L
    var sumLen = 0L
    var alphaToks = 0L
    var i = 0
    var tokStart = 0
    while (i <= n) {
      if (i == n || b(i) == 0x20) {
        if (i > tokStart) {
          nTok += 1
          sumLen += TextStats.chars(b, tokStart, i)
          if (TextStats.hasLetter(b, tokStart, i)) alphaToks += 1
        }
        tokStart = i + 1
      }
      i += 1
    }

    // line pass: non-empty (space-trimmed) lines, bullet starts, ellipsis ends
    var nLines = 0L
    var bullets = 0L
    var ellipsis = 0L
    i = 0
    var lineStart = 0
    while (i <= n) {
      if (i == n || b(i) == 0x0A) {
        var st = lineStart
        var en = i
        while (st < en && b(st) == 0x20) st += 1
        while (en > st && b(en - 1) == 0x20) en -= 1
        if (en > st) {
          nLines += 1
          val len = en - st
          if ((len >= 2 && (b(st) == '-' || b(st) == '*') && b(st + 1) == ' ') ||
              (len >= 3 && (b(st) & 0xFF) == 0xE2 && (b(st + 1) & 0xFF) == 0x80 &&
                (b(st + 2) & 0xFF) == 0xA2)) bullets += 1
          if (len >= 3 &&
              ((b(en - 3) == '.' && b(en - 2) == '.' && b(en - 1) == '.') ||
                ((b(en - 3) & 0xFF) == 0xE2 && (b(en - 2) & 0xFF) == 0x80 &&
                  (b(en - 1) & 0xFF) == 0xA6))) ellipsis += 1
        }
        lineStart = i + 1
      }
      i += 1
    }

    // symbol pass: '#' count; '...' triples over dot runs where '…'
    // contributes three dot units (the translate-first rule — runs merge
    // across mixed '.'/'…' exactly as the replaced string would)
    var hashes = 0L
    var dots = 0L
    var run = 0L
    i = 0
    while (i < n) {
      val v = b(i) & 0xFF
      if (v == 0x2E) { run += 1; i += 1 }
      else if (v == 0xE2 && i + 2 < n && (b(i + 1) & 0xFF) == 0x80 &&
          (b(i + 2) & 0xFF) == 0xA6) { run += 3; i += 3 }
      else {
        if (run > 0) { dots += run / 3; run = 0 }
        if (v == 0x23) hashes += 1
        i += 1
      }
    }
    dots += run / 3

    new GenericInternalRow(Array[Any](
      nTok >= 50L && nTok <= 100000L,
      nTok > 0L && sumLen >= nTok * 3L && sumLen <= nTok * 10L,
      (hashes + dots) * 10L < nTok,
      bullets * 10L <= nLines * 9L,
      ellipsis * 10L <= nLines * 3L,
      alphaToks * 5L >= nTok * 4L))
  }

  override protected def doGenCode(ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
                                   ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
    val ref = ctx.addReferenceObj("gf", this, classOf[GopherTextFlags].getName)
    val childGen = child.genCode(ctx)
    ev.copy(code = code"""
      ${childGen.code}
      org.apache.spark.sql.catalyst.InternalRow ${ev.value} =
        ${childGen.isNull} ? $ref.nullRow() : $ref.route(${childGen.value});
    """, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** C4 line cleaning as one codegen'd expression: keep lines (split '\n',
  * space-trimmed, non-empty) that end in `.` `!` `?` `"`, carry at least
  * `minWords` space-separated words, and do not contain "javascript"
  * after lowercasing (UTF8String.toLowerCase — the `lower()` path);
  * survivors re-join with '\n'. One pass, zero intermediate arrays.
  */
case class C4CleanLinesExpr(child: Expression, minWords: Int)
    extends UnaryExpression {
  require(minWords >= 0, s"minWords must be >= 0, got $minWords")

  override def dataType: DataType = StringType
  override def prettyName: String = "c4_clean_lines"
  // HOF parity: the tail is `concat_ws("\n", kept)`, which returns ""
  // (never null) even for NULL text — replicated here
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"c4_clean_lines expects STRING, got ${other.sql}")
  }

  @transient private lazy val js = UTF8String.fromString("javascript")

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) UTF8String.EMPTY_UTF8 else route(v.asInstanceOf[UTF8String])
  }

  def route(s: UTF8String): UTF8String = {
    val b = s.getBytes
    val n = b.length
    val out = new java.io.ByteArrayOutputStream(n)
    var first = true
    var i = 0
    var lineStart = 0
    while (i <= n) {
      if (i == n || b(i) == 0x0A) {
        var st = lineStart
        var en = i
        while (st < en && b(st) == 0x20) st += 1
        while (en > st && b(en - 1) == 0x20) en -= 1
        if (en > st) {
          val last = b(en - 1)
          if (last == '.' || last == '!' || last == '?' || last == '"') {
            // word count over [st, en)
            var words = 0
            var j = st
            var ts = st
            while (j <= en) {
              if (j == en || b(j) == 0x20) {
                if (j > ts) words += 1
                ts = j + 1
              }
              j += 1
            }
            if (words >= minWords &&
                !UTF8String.fromBytes(b, st, en - st).toLowerCase.contains(js)) {
              if (!first) out.write(0x0A)
              out.write(b, st, en - st)
              first = false
            }
          }
        }
        lineStart = i + 1
      }
      i += 1
    }
    UTF8String.fromBytes(out.toByteArray)
  }

  override protected def doGenCode(ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
                                   ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
    val ref = ctx.addReferenceObj("c4", this, classOf[C4CleanLinesExpr].getName)
    val childGen = child.genCode(ctx)
    ev.copy(code = code"""
      ${childGen.code}
      org.apache.spark.unsafe.types.UTF8String ${ev.value} =
        ${childGen.isNull}
          ? org.apache.spark.unsafe.types.UTF8String.EMPTY_UTF8
          : $ref.route(${childGen.value});
    """, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Trimmed non-empty lines (`split('\n')` → space-trim → drop empties)
  * as one codegen'd expression — the repetition battery's line axis.
  */
case class LinesNonEmpty(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def prettyName: String = "lines_nonempty"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"lines_nonempty expects STRING, got ${other.sql}")
  }

  override def nullSafeEval(input: Any): Any =
    route(input.asInstanceOf[UTF8String])

  def route(s: UTF8String): ArrayData = {
    val b = s.getBytes
    val n = b.length
    val out = new java.util.ArrayList[UTF8String](8)
    var i = 0
    var lineStart = 0
    while (i <= n) {
      if (i == n || b(i) == 0x0A) {
        var st = lineStart
        var en = i
        while (st < en && b(st) == 0x20) st += 1
        while (en > st && b(en - 1) == 0x20) en -= 1
        if (en > st) out.add(UTF8String.fromBytes(b, st, en - st))
        lineStart = i + 1
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  override protected def doGenCode(ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
                                   ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val ref = ctx.addReferenceObj("ln", this, classOf[LinesNonEmpty].getName)
    nullSafeCodeGen(ctx, ev, s => s"${ev.value} = $ref.route($s);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Trimmed non-empty paragraphs (`split('\n\n+')` — maximal runs of TWO
  * or more newlines separate; a single newline stays inside its
  * paragraph — then space-trim, drop empties) as one codegen'd
  * expression — the repetition battery's paragraph axis.
  */
case class ParasNonEmpty(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def prettyName: String = "paras_nonempty"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"paras_nonempty expects STRING, got ${other.sql}")
  }

  override def nullSafeEval(input: Any): Any =
    route(input.asInstanceOf[UTF8String])

  def route(s: UTF8String): ArrayData = {
    val b = s.getBytes
    val n = b.length
    val out = new java.util.ArrayList[UTF8String](4)
    def emit(from: Int, to: Int): Unit = {
      var st = from
      var en = to
      while (st < en && b(st) == 0x20) st += 1
      while (en > st && b(en - 1) == 0x20) en -= 1
      if (en > st) out.add(UTF8String.fromBytes(b, st, en - st))
    }
    var i = 0
    var segStart = 0
    while (i < n) {
      if (b(i) == 0x0A && i + 1 < n && b(i + 1) == 0x0A) {
        // maximal newline run of length >= 2 = one separator
        emit(segStart, i)
        i += 2
        while (i < n && b(i) == 0x0A) i += 1
        segStart = i
      } else i += 1
    }
    emit(segStart, n)
    new GenericArrayData(out.toArray)
  }

  override protected def doGenCode(ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
                                   ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val ref = ctx.addReferenceObj("pn", this, classOf[ParasNonEmpty].getName)
    nullSafeCodeGen(ctx, ev, s => s"${ev.value} = $ref.route($s);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
