package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, ByteType, DataType, DoubleType, FloatType}

/** Product-quantization expressions (Jégou/Douze/Schmid 2011, the PQ
  * every large-scale ANN system builds on): an embedding splits into `m`
  * contiguous subvectors, each quantized to its own `ksub`-centroid
  * codebook, so a d-dim float vector stores as `m` BYTES — 4d/m×
  * compression (16× at d=64, m=16) — and similarity is computed against
  * CODES through per-query lookup tables (ADC), never against raw
  * corpus floats.
  *
  * All three expressions carry the codebook as an expression FIELD (the
  * [[NearestCentroids]] matrix-as-reference-object discipline — a
  * literal encoding of m×ksub×dsub floats would bloat every plan) and
  * follow its hot-loop pattern: the per-row work lives in a plain-array
  * method the generated code calls directly, keeping the surrounding
  * stage inside whole-stage codegen.
  */

/** Encode: `ARRAY<FLOAT>` embedding → `ARRAY<BYTE>` of `m` centroid
  * indices, subspace j's code = argmin L2 distance over its `ksub`
  * centroids (deterministic ties → lower index). `ksub <= 256`; codes
  * are the raw byte of the index (read back with `& 0xff`).
  *
  * MALFORMED VECTORS (wrong length, or a null/NaN slot poisoning every
  * centroid distance in some subspace) encode to the EMPTY code — the
  * corpus-side rank-last sentinel: [[PqAdcCosine]]'s length check scores
  * any code of length ≠ m at -2.0, strictly below every real cosine, so
  * a poisoned corpus row can never enter a top-k (mirrors the query-side
  * NaN-poisoning convention; silently routing the bad subspace to code 0
  * produced a valid-looking code with a plausible ADC similarity).
  */
case class PqEncode(child: Expression, centroids: Array[Array[Array[Float]]])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(ByteType, containsNull = false)
  override def prettyName: String = "pq_encode"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _)
      if centroids.nonEmpty && centroids.forall(cb => cb.nonEmpty && cb.length <= 256) =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"pq_encode expects ARRAY<FLOAT> and 1..256 centroids per subspace, " +
        s"got ${child.dataType.sql} with m=${centroids.length}")
  }

  @transient private lazy val expectedDim = centroids.map(_.head.length).sum

  def route(arr: ArrayData): ArrayData = {
    val m = centroids.length
    val out = new Array[Byte](m)
    // wrong-length vectors can never route honestly — sentinel up front
    if (arr.numElements() != expectedDim)
      return org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
        .fromPrimitiveArray(Array.emptyByteArray)
    var off = 0
    var j = 0
    while (j < m) {
      val cb = centroids(j)
      val dsub = cb(0).length
      var best = 0
      var bestDist = Double.MaxValue
      var c = 0
      while (c < cb.length) {
        val cent = cb(c)
        var dist = 0.0
        var i = 0
        while (i < dsub) {
          val idx = off + i
          val x =
            if (arr.isNullAt(idx)) Double.NaN
            else arr.getFloat(idx).toDouble
          val dl = x - cent(i)
          dist += dl * dl
          i += 1
        }
        // strict < : NaN never wins, ties keep the lower index
        if (dist < bestDist) { bestDist = dist; best = c }
        c += 1
      }
      // no centroid won — every distance NaN/∞ (a null/NaN slot poisons
      // the whole subspace): the vector is unencodable, sentinel out
      if (bestDist == Double.MaxValue)
        return org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
          .fromPrimitiveArray(Array.emptyByteArray)
      out(j) = best.toByte
      off += dsub
      j += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
  }

  override def nullSafeEval(input: Any): Any =
    route(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
                                   ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val ref = ctx.addReferenceObj("pqe", this, classOf[PqEncode].getName)
    nullSafeCodeGen(ctx, ev, arr => s"${ev.value} = $ref.route($arr);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Query-side ADC preparation, run ONCE per query row (never per pair —
  * that is the whole speedup): `ARRAY<DOUBLE>` of length `m*ksub + 1`
  * where slot `j*ksub + i` = dot(query subvector j, centroid (j,i)) and
  * the LAST slot is ‖query‖ — everything [[PqAdcCosine]] needs to score
  * a code with `m` adds and lookups instead of d multiplies. A
  * null/NaN query slot poisons its subspace's dots AND the norm to NaN,
  * which [[PqAdcCosine]] turns into the rank-last similarity.
  */
case class PqQueryTables(child: Expression, centroids: Array[Array[Array[Float]]])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "pq_query_tables"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) if centroids.nonEmpty =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"pq_query_tables expects ARRAY<FLOAT>, got ${child.dataType.sql}")
  }

  private lazy val ksub = centroids.map(_.length).max

  def tables(arr: ArrayData): ArrayData = {
    val m = centroids.length
    val out = new Array[Double](m * ksub + 1)
    var normSq = 0.0
    var off = 0
    var j = 0
    while (j < m) {
      val cb = centroids(j)
      val dsub = cb(0).length
      var c = 0
      while (c < cb.length) {
        val cent = cb(c)
        var dot = 0.0
        var i = 0
        while (i < dsub) {
          val idx = off + i
          val x =
            if (idx >= arr.numElements() || arr.isNullAt(idx)) Double.NaN
            else arr.getFloat(idx).toDouble
          dot += x * cent(i)
          i += 1
        }
        out(j * ksub + c) = dot
        c += 1
      }
      var i = 0
      while (i < dsub) {
        val idx = off + i
        val x =
          if (idx >= arr.numElements() || arr.isNullAt(idx)) Double.NaN
          else arr.getFloat(idx).toDouble
        normSq += x * x
        i += 1
      }
      off += dsub
      j += 1
    }
    out(m * ksub) = math.sqrt(normSq)
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
  }

  override def nullSafeEval(input: Any): Any =
    tables(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
                                   ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val ref = ctx.addReferenceObj("pqt", this, classOf[PqQueryTables].getName)
    nullSafeCodeGen(ctx, ev, arr => s"${ev.value} = $ref.tables($arr);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Pair-side ADC cosine: score = Σ_j dotTable[j*ksub + code_j] divided
  * by (‖q‖ · ‖recon(code)‖), where the reconstruction norm reads the
  * codebook's precomputed per-centroid ‖·‖² table — the asymmetric
  * distance computation of the PQ paper, specialised to cosine. Per
  * pair: `m` adds + `m` lookups (the d-dim dot never happens). A zero
  * or NaN denominator (zero-norm query/reconstruction, poisoned slots)
  * scores `-2.0` — strictly below every real cosine, the
  * [[NearestCentroids]] rank-last convention. The length guard covers
  * [[PqEncode]]'s empty-code corpus sentinel the same way: a malformed
  * corpus vector's code scores -2.0 on every query.
  */
case class PqAdcCosine(left: Expression, right: Expression,
                       centroids: Array[Array[Array[Float]]])
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "pq_adc_cosine"

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(DoubleType, _), ArrayType(ByteType, _)) if centroids.nonEmpty =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"pq_adc_cosine expects (ARRAY<DOUBLE> tables, ARRAY<BYTE> codes), got (${l.sql}, ${r.sql})")
  }

  private lazy val ksub = centroids.map(_.length).max

  // ‖centroid (j,i)‖² at slot j*ksub + i — query-independent, computed
  // once per codebook object and shipped with the expression
  @transient private lazy val normSq: Array[Double] = {
    val out = new Array[Double](centroids.length * ksub)
    var j = 0
    while (j < centroids.length) {
      var c = 0
      while (c < centroids(j).length) {
        var s = 0.0
        var i = 0
        while (i < centroids(j)(c).length) {
          val v = centroids(j)(c)(i).toDouble
          s += v * v
          i += 1
        }
        out(j * ksub + c) = s
        c += 1
      }
      j += 1
    }
    out
  }

  def score(tables: ArrayData, codes: ArrayData): Double = {
    val m = centroids.length
    if (codes.numElements() != m) return -2.0 // foreign/truncated code
    if (tables.numElements() != m * ksub + 1) return -2.0
    var dot = 0.0
    var reconSq = 0.0
    var j = 0
    while (j < m) {
      val code = codes.getByte(j) & 0xff
      if (code >= centroids(j).length) return -2.0
      dot += tables.getDouble(j * ksub + code)
      reconSq += normSq(j * ksub + code)
      j += 1
    }
    val denom = tables.getDouble(m * ksub) * math.sqrt(reconSq)
    val s = dot / denom
    if (java.lang.Double.isNaN(s) || java.lang.Double.isInfinite(s)) -2.0 else s
  }

  override def nullSafeEval(t: Any, c: Any): Any =
    score(t.asInstanceOf[ArrayData], c.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
                                   ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val ref = ctx.addReferenceObj("pqa", this, classOf[PqAdcCosine].getName)
    nullSafeCodeGen(ctx, ev, (t, c) => s"${ev.value} = $ref.score($t, $c);")
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
