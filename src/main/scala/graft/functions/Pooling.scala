package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

/** Native strided-mean pooling over a normalized RGB grid (optimization
  * round 21 — VERDICT r20 watch item #2 / "Next round" #2): the round-20
  * form computed feature j as an interpreted higher-order `aggregate`
  * over `conv(substr(hex(grid)))` hex arithmetic — per row that is
  * dim interpreted stripe lambdas, each walking its stripe through
  * UTF8String substring + base-16 conv, ~n string ops per row (the
  * engine's costliest per-row projection, and at a real 224x224x3
  * encoder grid ~150k string ops/row). This expression computes all
  * `dim` strided sums in ONE pass over the byte array inside whole-stage
  * codegen.
  *
  * Semantics are the round-20 form's EXACTLY (spec-pinned bit-equal in
  * `PoolingSpec`, and the Q-M17 oracle hash replays them): feature j =
  * (Σ bytes at positions ≡ j mod dim, as unsigned) / stripeLen(j) in
  * IEEE double, rounded once to float32; NULL or wrong-length grid →
  * ONE NULL embedding, never an array of NULL features (the filterable
  * contract). `n`/`dim` are constructor constants (the [[ResizeGray]]
  * convention — the pooled geometry is the pipeline constant).
  */
case class PooledFeaturesRgb(child: Expression, n: Int, dim: Int)
    extends UnaryExpression {
  require(n >= 1, s"pooled_features n must be >= 1, got $n")
  require(dim >= 1 && dim <= n, s"pooled_features dim must be in [1, $n], got $dim")

  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def prettyName: String = "pooled_features_rgb"
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pooled_features_rgb expects BINARY, got ${other.sql}")
  }

  override def nullSafeEval(bytes: Any): Any =
    route(bytes.asInstanceOf[Array[Byte]])

  /** Nullable so codegen assigns null through the same path. */
  def route(bytes: Array[Byte]): GenericArrayData = {
    if (bytes.length != n) return null
    val sums = new Array[Long](dim)
    var p = 0
    while (p < n) {
      sums(p % dim) += (bytes(p) & 0xff).toLong
      p += 1
    }
    val out = new Array[Float](dim)
    var j = 0
    while (j < dim) {
      val cnt = (n - 1 - j) / dim + 1 // stripe length
      out(j) = (sums(j).toDouble / cnt.toDouble).toFloat
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
                                   ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val ref = ctx.addReferenceObj("pf", this, classOf[PooledFeaturesRgb].getName)
    nullSafeCodeGen(ctx, ev, b => s"""
      org.apache.spark.sql.catalyst.util.GenericArrayData ${ev.value}Out = $ref.route($b);
      if (${ev.value}Out == null) { ${ev.isNull} = true; }
      else { ${ev.value} = ${ev.value}Out; }
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Pooling {
  /** Column face: `pooledFeaturesRgb(rgb, n, dim)` over the normalized
    * grid `resizeRgb` emits (`n` = outW·outH·3 bytes).
    */
  def pooledFeaturesRgb(rgb: Column, n: Int, dim: Int): Column =
    Bridge.column(PooledFeaturesRgb(Bridge.expression(rgb), n, dim))
}
