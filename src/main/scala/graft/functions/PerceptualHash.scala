package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

/** 64-bit difference hash (dHash) over a decoded grayscale image — the
  * perceptual signature that makes the multimodal column's near-dup
  * pipeline see through re-encodings: a resized, brightness-shifted or
  * re-compressed copy of the same picture has completely different BYTES
  * (so the exact md5 fingerprint of Q-M2 misses it) but the same light/
  * dark STRUCTURE, which is what dHash fingerprints.
  *
  * Input contract: `bytes` is the row-major 8-bit grayscale pixel grid of
  * a `width` × `height` image — the output of the decode stage
  * ([[graft.sources.Multimodal]]: the codec itself is stubbed in this
  * environment; a real decoder hands this expression exactly this grid).
  * The standard dHash construction (public domain, widely published —
  * e.g. the "Kind of Like That" dHash note and every OSS imagehash
  * library): average the grid down to 9 columns × 8 rows of blocks, then
  * bit `r*8 + j` = 1 iff block (r, j) is brighter than its right
  * neighbor (r, j+1) — 8 comparisons per row × 8 rows = 64 bits.
  *
  * All arithmetic is INTEGER (block sums compared cross-multiplied by
  * the opposing pixel counts, never averaged through floats), so the
  * signature is bit-identical on any engine — the closed-form property
  * the Q-M3 oracle replays. Block boundaries are `floor(k·dim/blocks)`;
  * when `width` is a multiple of 9 and `height` of 8 the blocks are
  * uniform and the hash is EXACTLY invariant under integer upscaling and
  * global brightness shifts (spec-pinned), the two re-encode transforms
  * the planted-copy fixture exercises.
  *
  * Returns NULL when the image is undecodable under the contract
  * (width < 9, height < 8, or fewer than width·height bytes) — the
  * [[CosineSimilarity]] malformed-input convention: a filterable NULL
  * instead of a plausible-looking hash, without killing a 100 TB job on
  * one truncated blob.
  */
case class DHash64(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "dhash64"
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (BinaryType, IntegerType, IntegerType) => TypeCheckResult.TypeCheckSuccess
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        s"dhash64 expects (BINARY, INT, INT), got (${a.sql}, ${b.sql}, ${c.sql})")
    }

  override def nullSafeEval(bytes: Any, w: Any, h: Any): Any =
    route(bytes.asInstanceOf[Array[Byte]],
      w.asInstanceOf[Int], h.asInstanceOf[Int])

  /** Boxed so codegen can assign null through the same path. */
  def route(bytes: Array[Byte], width: Int, height: Int): java.lang.Long = {
    if (width < 9 || height < 8 || bytes.length < width.toLong * height) return null
    // block sums: 8 rows x 9 cols, boundaries floor(k*dim/blocks); one
    // pass over the pixels, block loops so membership needs no division
    val sums = new Array[Long](72)
    val cnts = new Array[Long](72)
    var r = 0
    while (r < 8) {
      val y0 = r * height / 8
      val y1 = (r + 1) * height / 8
      var c = 0
      while (c < 9) {
        val x0 = c * width / 9
        val x1 = (c + 1) * width / 9
        var s = 0L
        var y = y0
        while (y < y1) {
          val base = y * width
          var x = x0
          while (x < x1) { s += (bytes(base + x) & 0xff); x += 1 }
          y += 1
        }
        sums(r * 9 + c) = s
        cnts(r * 9 + c) = (y1 - y0).toLong * (x1 - x0)
        c += 1
      }
      r += 1
    }
    var hash = 0L
    r = 0
    while (r < 8) {
      var j = 0
      while (j < 8) {
        val l = r * 9 + j
        // cross-multiplied mean compare: sumL/cntL > sumR/cntR without
        // floats (exact; sums <= 255*pixels so products fit a long for
        // any image under ~60 gigapixels)
        if (sums(l) * cnts(l + 1) > sums(l + 1) * cnts(l))
          hash |= 1L << (r * 8 + j)
        j += 1
      }
      r += 1
    }
    java.lang.Long.valueOf(hash)
  }

  override protected def doGenCode(ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
                                   ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val ref = ctx.addReferenceObj("dh", this, classOf[DHash64].getName)
    nullSafeCodeGen(ctx, ev, (b, w, h) => s"""
      java.lang.Long ${ev.value}Boxed = $ref.route($b, $w, $h);
      if (${ev.value}Boxed == null) { ${ev.isNull} = true; }
      else { ${ev.value} = ${ev.value}Boxed.longValue(); }
    """)
  }

  override protected def withNewChildrenInternal(newFirst: Expression,
                                                 newSecond: Expression,
                                                 newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object PerceptualHash {
  /** Column face: `dHash64(bytes, width, height)` — dims may vary per
    * row (media tables carry them in metadata).
    */
  def dHash64(bytes: Column, width: Column, height: Column): Column =
    Bridge.column(DHash64(Bridge.expression(bytes),
      Bridge.expression(width.cast("int")), Bridge.expression(height.cast("int"))))
}
