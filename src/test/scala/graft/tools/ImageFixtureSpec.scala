package graft.tools

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The `image_decode`/`image_dedup` ScaleBench rows are only meaningful
  * if the fixture's claims hold: every generated blob is a REAL decodable
  * PNG, and the planted 2×-upscale / +10-brightness variants are EXACTLY
  * dHash-invariant (uniform blocks, no clamping) so the dedup's pair
  * counts track planted copies. Those claims live in a generator comment
  * otherwise — this spec is their machine check (the r12/r13
  * unverified-claim discipline).
  */
class ImageFixtureSpec extends SparkSpec {

  test("ScaleBench image fixture: real PNGs, planted re-encodes exactly dHash-invariant") {
    val dir = java.nio.file.Files.createTempDirectory("imgfix").toString
    ScaleBench.generateImages(spark, sf, dir)
    val media = spark.read.parquet(dir)
    val hashed = graft.sources.Multimodal.decodeImage(
        media.select(col("media_id"), col("bytes")), "bytes")
      .select(col("media_id"),
        graft.sources.Multimodal.dHash64(col("gray"), col("width"), col("height"))
          .as("dh"))
      .collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toMap
    assert(hashed.nonEmpty)
    // every blob decodes: real PNGs, no NULL grids anywhere
    assert(hashed.values.forall(_.isDefined), "an undecodable fixture PNG")
    val bases = hashed.keys.filter(_ % 4 == 0).toSeq
    // the planted variants hash EQUAL to their base — the invariance the
    // image_dedup row's pair volume depends on
    var planted = 0
    for (b <- bases) {
      val id = b / 4
      if (id % 3 == 0) { assert(hashed(b) == hashed(b + 1), s"upscale of id $id"); planted += 1 }
      if (id % 5 == 0) { assert(hashed(b) == hashed(b + 2), s"brightness of id $id"); planted += 1 }
    }
    assert(planted > 0, "fixture must plant variants")
    // distinct ids carry distinct content (per-(id,x,y) hash pixels):
    // base hashes are overwhelmingly unique, so cross-id pairs are noise
    val uniq = bases.map(hashed(_).get).toSet
    assert(uniq.size > bases.size / 2,
      s"base images must be mostly distinct, got ${uniq.size}/${bases.size}")
  }
}
