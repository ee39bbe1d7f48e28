package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Bit-equality pins for the native tile extraction (round 21):
  * [[GridTile]] replaces `imageTileHashes`' interpreted
  * aggregate-of-substrings HOF, so its bytes must match that form
  * exactly on every in-contract (grid, w, tile_idx, tx, hop) input, and
  * its NULL must land where the substring form's TRUNCATION landed
  * through the downstream dHash (short tile → dhash64 NULL).
  */
class TileSpec extends SparkSpec {
  import spark.implicits._

  // the r18 SQL form GridTile replaces, verbatim from imageTileHashes
  private def sqlTile(hopW: Int, hopH: Int, tileW: Int, tileH: Int) = expr(
    s"""aggregate(transform(sequence(0, ${tileH - 1}),
      r -> substring(_gray,
        cast(((tile_idx div _tx) * $hopH + r) * _w +
          (tile_idx % _tx) * $hopW + 1 as int),
        $tileW)),
      cast('' as binary), (acc, x) -> concat(acc, x))""")

  private def grids(w: Int, h: Int) =
    (0L until 20L).map { k =>
      val g = new Array[Byte](w * h)
      var i = 0
      while (i < g.length) { g(i) = ((k * 131 + i * 7) % 251).toByte; i += 1 }
      (k, g, w)
    }

  test("non-overlapping grid: GridTile bytes == aggregate-of-substrings bytes") {
    for ((w, h, tw, th) <- Seq((36, 32, 18, 16), (36, 16, 18, 16), (27, 24, 9, 8))) {
      val tx = w / tw
      val nt = tx * (h / th)
      val rows = grids(w, h).toDF("id", "_gray", "_w")
        .withColumn("_tx", lit(tx))
        .withColumn("tile_idx", explode(sequence(lit(0), lit(nt - 1))))
      val bad = rows.select(
          sqlTile(tw, th, tw, th).as("a"),
          Tile.gridTile(col("_gray"), col("_w"), col("tile_idx"), col("_tx"),
            tw, th, tw, th).as("b"))
        .filter(not(col("a") === col("b"))).count()
      assert(bad == 0, s"grid $w x $h tile $tw x $th drifted from the substring form")
    }
  }

  test("hop-strided origins (hop < tile): bytes match the substring form") {
    val (w, h, tw, th, hw, hh) = (36, 32, 18, 16, 9, 8)
    val tx = (w - tw) / hw + 1
    val nt = tx * ((h - th) / hh + 1)
    val rows = grids(w, h).toDF("id", "_gray", "_w")
      .withColumn("_tx", lit(tx))
      .withColumn("tile_idx", explode(sequence(lit(0), lit(nt - 1))))
    val bad = rows.select(
        sqlTile(hw, hh, tw, th).as("a"),
        Tile.gridTile(col("_gray"), col("_w"), col("tile_idx"), col("_tx"),
          hw, hh, tw, th).as("b"))
      .filter(not(col("a") === col("b"))).count()
    assert(bad == 0, "strided origins drifted from the substring form")
  }

  test("out-of-bounds tile agrees with the truncating form THROUGH dhash64 (both NULL)") {
    // a grid that lies about its height: _gray holds 36x16 bytes but the
    // caller's tile_idx walks a 36x32 grid — the substring form truncates
    // (short tile → dhash64 NULL), GridTile nulls at the extraction
    val g = new Array[Byte](36 * 16)
    val rows = Seq((1L, g, 36)).toDF("id", "_gray", "_w")
      .withColumn("_tx", lit(2))
      .withColumn("tile_idx", lit(3)) // origin (18, 16) — past the real grid
    val out = rows.select(
      graft.sources.Multimodal.dHash64(sqlTile(18, 16, 18, 16), lit(18), lit(16)).as("a"),
      graft.sources.Multimodal.dHash64(
        Tile.gridTile(col("_gray"), col("_w"), col("tile_idx"), col("_tx"),
          18, 16, 18, 16), lit(18), lit(16)).as("b")).collect().head
    assert(out.isNullAt(0) && out.isNullAt(1))
  }
}
