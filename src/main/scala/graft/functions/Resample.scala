package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

/** EXACT integer sample-rate conversion of canonical mono 16-bit LE PCM
  * — [[ResizeGray]]'s box filter transplanted from the pixel axis to the
  * sample axis (round 20, VERDICT r19 #1): a re-render of the same
  * soundtrack at a different sample rate (44.1 kHz vs 48 kHz — the most
  * common render difference after volume) shifts every fixed-SAMPLE
  * window the audio axes hash, so without a normalize-before-hash step
  * it provably defeats the whole-clip, segment, and soundtrack axes at
  * once. Resampling every clip to ONE pipeline rate before windowing is
  * the audio twin of resizing every image to one grid before hashing —
  * and like the resize it must be bit-identical across engines, or a
  * Spark backfill and any other runtime silently disagree on which
  * clips are duplicates.
  *
  * Construction (the 1-D box filter, exact): output sample `o` covers
  * the source span [o·srcRate, (o+1)·srcRate) in target-scaled units
  * where source sample `s` covers [s·targetRate, (s+1)·targetRate); its
  * value is the span-weighted mean of the overlapped source samples,
  * computed entirely in integers — the total weight per output sample
  * is exactly `srcRate`, and the mean rounds half-up via FLOOR division
  * (`floorDiv(acc + srcRate/2, srcRate)` — floor, not truncation, so
  * negative samples round by the same rule; the Q-M14 oracle replays
  * the identical `//` arithmetic in DuckDB). Downsample, upsample, and
  * identity are all the same formula: at equal rates every output span
  * covers exactly one source sample with full weight, so
  * `resample(pcm, r, r)` is provably byte-identical to its input
  * (spec-pinned), and a 2:1 downsample is exactly
  * `floorDiv(a + b + 1, 2)` per pair — the closed form the oracle pins.
  *
  * `targetRate` is a CONSTRUCTOR constant, not a child expression — a
  * pipeline normalizes a corpus to ONE rate (loud `require` on a
  * malformed target), while malformed per-row INPUT (srcRate < 1, an
  * odd byte length — mono 16-bit PCM is 2 bytes/sample — or an output
  * that would overflow a JVM array) returns NULL: the [[DHash64]]
  * filterable-NULL contract, one corrupt clip never kills the job.
  *
  * Overflow: |sample| ≤ 2¹⁵ and Σ weights = srcRate < 2³¹, so the
  * accumulator is bounded by 2⁴⁶ — Long-safe at any legal rate; span
  * coordinates are ≤ nSamples·targetRate < 2⁶² as Longs.
  */
case class ResamplePcm(left: Expression, right: Expression, targetRate: Int)
    extends BinaryExpression {
  require(targetRate >= 1, s"resample_pcm target rate must be >= 1, got $targetRate")

  override def dataType: DataType = BinaryType
  override def prettyName: String = "resample_pcm"
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, IntegerType) => TypeCheckResult.TypeCheckSuccess
      case (a, b) => TypeCheckResult.TypeCheckFailure(
        s"resample_pcm expects (BINARY, INT), got (${a.sql}, ${b.sql})")
    }

  override def nullSafeEval(pcm: Any, rate: Any): Any =
    route(pcm.asInstanceOf[Array[Byte]], rate.asInstanceOf[Int])

  /** Nullable so codegen assigns null through the same path. */
  def route(pcm: Array[Byte], srcRate: Int): Array[Byte] = {
    if (srcRate < 1 || (pcm.length & 1) != 0) return null
    if (srcRate == targetRate) return pcm // arithmetic identity, proven above
    val n = pcm.length / 2
    val nOut = n.toLong * targetRate / srcRate
    if (nOut * 2 > Int.MaxValue - 8) return null
    val out = new Array[Byte](nOut.toInt * 2)
    val sr = srcRate.toLong
    val dr = targetRate.toLong
    var o = 0L
    while (o < nOut) {
      val spanLo = o * sr
      val spanHi = spanLo + sr
      var s = spanLo / dr
      var acc = 0L
      while (s * dr < spanHi) {
        val w = math.min(spanHi, (s + 1) * dr) - math.max(spanLo, s * dr)
        val si = 2 * s.toInt
        val sample = (((pcm(si + 1) & 0xff) << 8) | (pcm(si) & 0xff)).toShort.toInt
        acc += sample * w
        s += 1
      }
      val v = Math.floorDiv(acc + sr / 2, sr).toInt
      val oi = 2 * o.toInt
      out(oi) = (v & 0xff).toByte
      out(oi + 1) = ((v >> 8) & 0xff).toByte
      o += 1
    }
    out
  }

  override protected def doGenCode(ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
                                   ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val ref = ctx.addReferenceObj("rs", this, classOf[ResamplePcm].getName)
    nullSafeCodeGen(ctx, ev, (p, r) => s"""
      byte[] ${ev.value}Out = $ref.route($p, $r);
      if (${ev.value}Out == null) { ${ev.isNull} = true; }
      else { ${ev.value} = ${ev.value}Out; }
    """)
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object Resample {
  /** Column face: `resamplePcm(pcm, srcRate, targetRate)` — the source
    * rate varies per row (decoders emit it alongside the PCM); the
    * target is the pipeline constant.
    */
  def resamplePcm(pcm: Column, srcRate: Column, targetRate: Int): Column =
    Bridge.column(ResamplePcm(Bridge.expression(pcm),
      Bridge.expression(srcRate.cast("int")), targetRate))
}
