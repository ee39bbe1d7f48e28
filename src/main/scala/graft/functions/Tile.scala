package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, QuaternaryExpression}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

/** Native tile extraction out of a row-major grayscale grid
  * (optimization round 21, guide §1.2 step 2): `imageTileHashes` built
  * each tile as `aggregate(transform(sequence(0, tileH-1), r ->
  * substring(gray, ...)), X'', concat)` — higher-order functions are
  * CodegenFallback, so every tile paid tileH interpreted lambda calls,
  * tileH substring allocations, and tileH GROWING concat copies
  * (O(tileW·tileH²) bytes copied per tile). This expression does the
  * same extraction as tileH `System.arraycopy` calls into one exact-size
  * buffer, inside whole-stage codegen.
  *
  * Children: (gray BINARY, w INT — the grid's pixel row width, tile_idx
  * INT — row-major over the hop-strided origin grid, tx INT — origins
  * per row); `hopW/hopH/tileW/tileH` are constructor constants (the
  * [[ResizeGray]] convention: a pipeline tiles a corpus ONE way).
  * Origin: x0 = (tile_idx % tx)·hopW, y0 = (tile_idx / tx)·hopH; output
  * byte r·tileW + c = gray[(y0 + r)·w + x0 + c] — exactly the
  * substring form's bytes (spec-pinned bit-equal in `TileSpec`).
  *
  * NULL contract: malformed per-row input (w < 1, tx < 1, tile_idx < 0,
  * or a tile span past the grid's end) returns NULL. The substring form
  * TRUNCATED instead — emitting a short binary that [[DHash64]] then
  * nulls (fewer than tileW·tileH bytes) — so through the dHash both
  * forms agree on every input (spec-pinned); a filterable NULL at the
  * extraction is strictly the cleaner contract.
  */
case class GridTile(first: Expression, second: Expression,
                    third: Expression, fourth: Expression,
                    hopW: Int, hopH: Int, tileW: Int, tileH: Int)
    extends QuaternaryExpression {
  require(tileW >= 1 && tileH >= 1, s"grid_tile size must be >= 1x1, got ${tileW}x$tileH")
  require(hopW >= 1 && hopH >= 1, s"grid_tile hops must be >= 1, got ${hopW}x$hopH")

  override def dataType: DataType = BinaryType
  override def prettyName: String = "grid_tile"
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType, fourth.dataType) match {
      case (BinaryType, IntegerType, IntegerType, IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b, c, d) => TypeCheckResult.TypeCheckFailure(
        s"grid_tile expects (BINARY, INT, INT, INT), got (${a.sql}, ${b.sql}, ${c.sql}, ${d.sql})")
    }

  override def nullSafeEval(bytes: Any, w: Any, tileIdx: Any, tx: Any): Any =
    route(bytes.asInstanceOf[Array[Byte]], w.asInstanceOf[Int],
      tileIdx.asInstanceOf[Int], tx.asInstanceOf[Int])

  /** Nullable so codegen assigns null through the same path. */
  def route(bytes: Array[Byte], w: Int, tileIdx: Int, tx: Int): Array[Byte] = {
    if (w < 1 || tx < 1 || tileIdx < 0) return null
    val x0 = (tileIdx % tx).toLong * hopW
    val y0 = (tileIdx / tx).toLong * hopH
    val last = (y0 + tileH - 1) * w + x0 + tileW // one past the final byte
    if (x0 + tileW > w || last > bytes.length) return null
    val out = new Array[Byte](tileW * tileH)
    var r = 0
    while (r < tileH) {
      System.arraycopy(bytes, ((y0 + r) * w + x0).toInt, out, r * tileW, tileW)
      r += 1
    }
    out
  }

  override protected def doGenCode(ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
                                   ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val ref = ctx.addReferenceObj("gt", this, classOf[GridTile].getName)
    nullSafeCodeGen(ctx, ev, (b, w, ti, tx) => s"""
      byte[] ${ev.value}Out = $ref.route($b, $w, $ti, $tx);
      if (${ev.value}Out == null) { ${ev.isNull} = true; }
      else { ${ev.value} = ${ev.value}Out; }
    """)
  }

  override protected def withNewChildrenInternal(newFirst: Expression,
                                                 newSecond: Expression,
                                                 newThird: Expression,
                                                 newFourth: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird, fourth = newFourth)
}

object Tile {
  /** Column face: `gridTile(gray, w, tileIdx, tx, ...)` — the grid and
    * tile index vary per row; the tile geometry is the pipeline constant.
    */
  def gridTile(gray: Column, w: Column, tileIdx: Column, tx: Column,
               hopW: Int, hopH: Int, tileW: Int, tileH: Int): Column =
    Bridge.column(GridTile(Bridge.expression(gray),
      Bridge.expression(w.cast("int")), Bridge.expression(tileIdx.cast("int")),
      Bridge.expression(tx.cast("int")), hopW, hopH, tileW, tileH))
}
