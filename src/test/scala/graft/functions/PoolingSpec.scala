package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Bit-equality pins for the native strided-mean pooling (round 21):
  * [[PooledFeaturesRgb]] replaces the interpreted
  * `aggregate(conv(substr(hex(grid))))` HOF inside
  * `Multimodal.pooledFeaturesRgb`, so its float32 vector must match
  * that form EXACTLY (same stripe sums, same IEEE double division, same
  * single float rounding) — the Q-M17 oracle hash rides on it.
  */
class PoolingSpec extends SparkSpec {
  import spark.implicits._

  // the r20 HOF form the native expression replaces, verbatim
  private def hofPooled(rgb: org.apache.spark.sql.Column, n: Int, dim: Int) = {
    val pooled = transform(array(hex(rgb)), hxv =>
      transform(sequence(lit(0), lit(dim - 1)), j => {
        val sum = aggregate(
          sequence(j, lit(n - 1), lit(dim)),
          lit(0L),
          (acc, p) =>
            acc + conv(hxv.substr(p.cast("int") * lit(2) + lit(1), lit(2)), 16, 10)
              .cast("long"))
        val cnt = floor((lit((n - 1).toDouble) - j.cast("double")) / lit(dim.toDouble)) + lit(1.0d)
        (sum.cast("double") / cnt).cast("float")
      }))
    when(rgb.isNotNull && length(rgb) === lit(n), element_at(pooled, 1))
  }

  private def grids(n: Int) =
    (0L until 30L).map { k =>
      val g = new Array[Byte](n)
      var i = 0
      while (i < n) { g(i) = ((k * 37 + i * 11) % 256).toByte; i += 1 }
      (k, g)
    }

  test("native pooling is float-bit-identical to the r20 HOF form (divisible and ragged stripes)") {
    for ((n, dim) <- Seq((216, 16), (216, 8), (48, 16), (864, 16))) {
      val rows = grids(n).toDF("id", "rgb")
      val bad = rows.select(
          hofPooled(col("rgb"), n, dim).as("a"),
          Pooling.pooledFeaturesRgb(col("rgb"), n, dim).as("b"))
        .filter(not(col("a") === col("b"))).count()
      assert(bad == 0, s"pooling n=$n dim=$dim drifted from the HOF form")
    }
  }

  test("the one-call operator still emits the identical vector (through resize, 255-range bytes)") {
    // bytes above 127 exercise the unsigned read; route through the real
    // resizeRgb normalization exactly like Q-M17
    val rows = grids(864).toDF("id", "rgb")
    val emb = graft.sources.Multimodal.pooledFeaturesRgb(
      graft.sources.Multimodal.resizeRgb(col("rgb"), lit(18), lit(16), 9, 8), 9, 8, 16)
    val old = hofPooled(
      graft.sources.Multimodal.resizeRgb(col("rgb"), lit(18), lit(16), 9, 8),
      9 * 8 * 3, 16)
    val bad = rows.select(old.as("a"), emb.as("b"))
      .filter(not(col("a") === col("b"))).count()
    assert(bad == 0, "operator-level pooling drifted from the r20 form")
  }

  test("NULL contract: NULL or wrong-length grid yields ONE NULL embedding") {
    val rows = Seq((1L, null.asInstanceOf[Array[Byte]]), (2L, Array.fill[Byte](5)(1)))
      .toDF("id", "rgb")
    val out = rows.select(
      graft.sources.Multimodal.pooledFeaturesRgb(col("rgb"), 9, 8, 16).as("e"))
      .collect()
    assert(out.forall(_.isNullAt(0)))
  }
}
