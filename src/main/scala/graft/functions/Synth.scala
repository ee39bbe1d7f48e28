package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, XXH64}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

/** Native closed-form fixture synthesis (optimization round 21, guide
  * §1.2 step 2 / §4.1: eliminate interpreted expressions in the hot
  * path). Every media-family query builds its fixture bytes IN-PLAN from
  * the parquet `doc_id` via the closed forms the DuckDB oracle replays —
  * `1 + pmod(xxhash64(seed + idx(p)), 100)` per grid byte and
  * `pmod(xxhash64(seed + g), 16384) - 8192` per LE16 PCM sample. The
  * round-20 form spelled those as higher-order functions
  * (`unhex(array_join(transform(sequence(0, n-1), p -> lpad(hex(...),
  * 2, '0')), ''))`): HOFs are CodegenFallback, so every byte paid an
  * interpreted lambda, an UTF8String `hex`/`lpad` pair, and an
  * `array_join` copy — the measured majority of the media rows'
  * wall-clock (BENCH r20: qm10 7.4 s, qm13 7.9 s, qm12 5.9 s… all
  * "synthesis-dominated" per the round-20 plan audit).
  *
  * These two expressions produce the IDENTICAL bytes in one tight
  * Java loop per row (the [[ResizeGray]]/[[ResamplePcm]] expression
  * class): same XXH64 primitive Spark's `xxhash64` uses
  * (`XXH64.hashLong(v, 42)` for a LONG input — the [[MinHashLongs]]
  * replication), same `pmod` floor-mod semantics, same LE16
  * two's-complement packing. Bit-equality against the SQL closed form
  * is spec-pinned in `SynthSpec` across every (w, sx, sy, y0, base,
  * offset, down) shape the queries use, and every oracle hash replays
  * the same closed form end to end — a drift anywhere breaks 13 rows.
  *
  * Byte p of [[SynthGrayBytes]] is
  * `valueBase + floorMod(xxhash64(seed + ((p % w) / sx) * mulX +
  * ((p / w) / sy) + y0), 100)` — `w = 1` degenerates to the LINEAR
  * form `idx = p` (p % 1 = 0, p / 1 = p) that the container payloads
  * use. Sample g of [[SynthPcm16]] is
  * `floorMod(xxhash64(seed + g + offset), 16384) - 8192` packed LE16;
  * `down = true` emits the exact 2:1 box-filter re-render
  * `floorDiv(s(2g) + s(2g+1) + 1, 2)` (qm14's independent-arithmetic
  * copy).
  */
case class SynthGrayBytes(left: Expression, right: Expression,
                          w: Int, sx: Int, sy: Int, mulX: Int, y0: Int,
                          valueBase: Int) extends BinaryExpression {
  require(w >= 1, s"synth_gray_bytes w must be >= 1, got $w")
  require(sx >= 1 && sy >= 1, s"synth_gray_bytes scales must be >= 1, got $sx/$sy")

  override def dataType: DataType = BinaryType
  override def prettyName: String = "synth_gray_bytes"
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, IntegerType) => TypeCheckResult.TypeCheckSuccess
      case (a, b) => TypeCheckResult.TypeCheckFailure(
        s"synth_gray_bytes expects (BIGINT, INT), got (${a.sql}, ${b.sql})")
    }

  override def nullSafeEval(seed: Any, n: Any): Any =
    route(seed.asInstanceOf[Long], n.asInstanceOf[Int])

  /** Nullable so codegen assigns null through the same path. */
  def route(seed: Long, n: Int): Array[Byte] = {
    if (n < 0) return null
    val out = new Array[Byte](n)
    var p = 0
    while (p < n) {
      val idx = ((p % w) / sx).toLong * mulX + ((p / w) / sy).toLong + y0
      val h = XXH64.hashLong(seed + idx, 42L)
      var m = (h % 100L).toInt
      if (m < 0) m += 100
      out(p) = (valueBase + m).toByte
      p += 1
    }
    out
  }

  override protected def doGenCode(ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
                                   ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val ref = ctx.addReferenceObj("sg", this, classOf[SynthGrayBytes].getName)
    nullSafeCodeGen(ctx, ev, (s, n) => s"""
      byte[] ${ev.value}Out = $ref.route($s, $n);
      if (${ev.value}Out == null) { ${ev.isNull} = true; }
      else { ${ev.value} = ${ev.value}Out; }
    """)
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** LE16 mono PCM synthesis — see [[SynthGrayBytes]]'s class doc. */
case class SynthPcm16(left: Expression, right: Expression,
                      offset: Int, down: Boolean) extends BinaryExpression {
  require(offset >= 0, s"synth_pcm16 offset must be >= 0, got $offset")

  override def dataType: DataType = BinaryType
  override def prettyName: String = "synth_pcm16"
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, IntegerType) => TypeCheckResult.TypeCheckSuccess
      case (a, b) => TypeCheckResult.TypeCheckFailure(
        s"synth_pcm16 expects (BIGINT, INT), got (${a.sql}, ${b.sql})")
    }

  override def nullSafeEval(seed: Any, n: Any): Any =
    route(seed.asInstanceOf[Long], n.asInstanceOf[Int])

  private def samp(seed: Long, i: Long): Int = {
    val h = XXH64.hashLong(seed + i, 42L)
    var m = (h % 16384L).toInt
    if (m < 0) m += 16384
    m - 8192
  }

  /** Nullable so codegen assigns null through the same path. */
  def route(seed: Long, n: Int): Array[Byte] = {
    if (n < 0 || n.toLong * 2 > Int.MaxValue - 8) return null
    val out = new Array[Byte](n * 2)
    var g = 0
    while (g < n) {
      val v =
        if (!down) samp(seed, g.toLong + offset)
        else Math.floorDiv(
          samp(seed, 2L * g + offset) + samp(seed, 2L * g + 1 + offset) + 1, 2)
      out(2 * g) = (v & 0xff).toByte
      out(2 * g + 1) = ((v >> 8) & 0xff).toByte
      g += 1
    }
    out
  }

  override protected def doGenCode(ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
                                   ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val ref = ctx.addReferenceObj("sp", this, classOf[SynthPcm16].getName)
    nullSafeCodeGen(ctx, ev, (s, n) => s"""
      byte[] ${ev.value}Out = $ref.route($s, $n);
      if (${ev.value}Out == null) { ${ev.isNull} = true; }
      else { ${ev.value} = ${ev.value}Out; }
    """)
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object Synth {
  /** Column face: grid bytes. `w = 1` (default) is the linear form
    * `idx = p`; the grid form passes the pixel row width. `seed` is the
    * per-row closed-form key (e.g. `doc_id * 4096`); `count` the byte
    * length (may vary per row).
    */
  def grayBytes(seed: Column, count: Column, w: Int = 1, sx: Int = 1,
                sy: Int = 1, mulX: Int = 64, y0: Int = 0,
                valueBase: Int = 1): Column =
    Bridge.column(SynthGrayBytes(Bridge.expression(seed.cast("long")),
      Bridge.expression(count.cast("int")), w, sx, sy, mulX, y0, valueBase))

  /** Column face: LE16 PCM samples (`count` samples → `2·count` bytes);
    * `down = true` is the exact 2:1 box-filter re-render.
    */
  def pcm16(seed: Column, count: Column, offset: Int = 0,
            down: Boolean = false): Column =
    Bridge.column(SynthPcm16(Bridge.expression(seed.cast("long")),
      Bridge.expression(count.cast("int")), offset, down))
}
