package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

/** 64-bit energy-envelope hash over decoded mono 16-bit PCM — the audio
  * analog of [[DHash64]]: a volume-scaled or re-encoded copy of the same
  * recording has completely different BYTES (the exact md5 fingerprint of
  * Q-M2 misses it) but the same loud/quiet STRUCTURE over time, which is
  * what this signature fingerprints. The construction is dHash's,
  * transplanted from space to time (the public-domain difference-hash
  * family): split the sample stream into 65 frames at integer boundaries
  * `floor(k·n/65)`, sum each frame's squared samples (the energy
  * envelope), and set bit k (0–63) iff frame k+1 carries more energy than
  * frame k.
  *
  * All arithmetic is INTEGER (16-bit samples, 64-bit energy sums — a
  * frame overflows long only past ~8.6e9 samples, far beyond the 2 GB
  * binary-column bound), so the signature is bit-identical on any
  * engine — the closed-form property the Q-M6 oracle replays. Energies
  * compare RAW (not mean-normalized): boundaries differ by at most one
  * sample between frames, and a hash needs determinism, not unbiasedness;
  * when 65 | n the frames are uniform and the comparison is exactly the
  * mean. Integer volume scaling (samples ×c without clipping) scales
  * every energy by c² and preserves every comparison — the invariance
  * that lets the banded near-dup machinery find re-leveled copies
  * (spec-pinned in `AudioSpec`).
  *
  * Input contract: `pcm` is little-endian signed 16-bit mono — the
  * output of [[graft.sources.Multimodal.decodeWavPcm]]. Returns NULL for
  * undecodable input (odd byte length, or fewer than 65 samples — no
  * meaningful envelope exists): the [[DHash64]] filterable-NULL
  * convention, so one corrupt clip can never kill a 100 TB ingest.
  */
case class AudioHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "audiohash64"
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"audiohash64 expects BINARY, got ${other.sql}")
  }

  override def nullSafeEval(pcm: Any): Any =
    route(pcm.asInstanceOf[Array[Byte]])

  /** Boxed so codegen can assign null through the same path. */
  def route(pcm: Array[Byte]): java.lang.Long = {
    if (pcm.length % 2 != 0) return null
    val n = pcm.length / 2
    if (n < 65) return null
    val energy = new Array[Long](65)
    var k = 0
    while (k < 65) {
      // integer frame boundaries, the dHash floor(k*dim/blocks) rule
      val i0 = (k.toLong * n / 65).toInt
      val i1 = ((k + 1).toLong * n / 65).toInt
      var e = 0L
      var i = i0
      while (i < i1) {
        val s = ((pcm(2 * i + 1) << 8) | (pcm(2 * i) & 0xff)).toShort.toLong
        e += s * s
        i += 1
      }
      energy(k) = e
      k += 1
    }
    var hash = 0L
    k = 0
    while (k < 64) {
      if (energy(k + 1) > energy(k)) hash |= 1L << k
      k += 1
    }
    java.lang.Long.valueOf(hash)
  }

  override protected def doGenCode(ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
                                   ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val ref = ctx.addReferenceObj("ah", this, classOf[AudioHash64].getName)
    nullSafeCodeGen(ctx, ev, b => s"""
      java.lang.Long ${ev.value}Boxed = $ref.route($b);
      if (${ev.value}Boxed == null) { ${ev.isNull} = true; }
      else { ${ev.value} = ${ev.value}Boxed.longValue(); }
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object AudioHash {
  /** Column face: `audioHash64(pcm)` over decoded mono 16-bit LE PCM. */
  def audioHash64(pcm: Column): Column =
    Bridge.column(AudioHash64(Bridge.expression(pcm)))
}
