package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins for the exact integer area-average resize (round 19): the
  * closed-form arithmetic the Q-M12 oracle replays, the exactness
  * identities that make the operator trustworthy as an
  * embedding-normalization step, and the NULL contract.
  */
class ResizeSpec extends SparkSpec {
  import spark.implicits._

  private def resize(gray: Array[Byte], w: Int, h: Int,
                     ow: Int, oh: Int): Array[Byte] = {
    val rows = Seq((1L, gray, w, h)).toDF("id", "g", "w", "h")
      .select(graft.sources.Multimodal.resizeGray(col("g"), col("w"), col("h"), ow, oh).as("r"))
      .collect()
    rows.head.getAs[Array[Byte]](0)
  }

  test("identity resize is byte-exact; 2x pixel-doubling round-trips") {
    val img = Array.tabulate[Byte](36 * 32)(i => ((i * 37 + 11) % 251).toByte)
    assert(resize(img, 36, 32, 36, 32).toSeq == img.toSeq,
      "same-size resize must be the identity")
    // pixel-double then area-average back down: each 2x2 block holds one
    // source value, so the box mean is exactly that value
    val doubled = new Array[Byte](72 * 64)
    for (y <- 0 until 64; x <- 0 until 72)
      doubled(y * 72 + x) = img((y / 2) * 36 + x / 2)
    assert(resize(doubled, 72, 64, 36, 32).toSeq == img.toSeq,
      "integer-upscale then downscale must round-trip exactly")
  }

  test("non-divisible ratio: hand-computed fractional overlap weights, rounded half-up") {
    // 3x1 -> 2x1 with pixels [10, 20, 30]: box 0 covers [0,3) in 2-units
    // = all of p0 (w=2) + half of p1 (w=1); area = w*h = 3
    // v0 = (2*10 + 1*20 + 1) / 3 = 41/3 = 13; v1 = (1*20 + 2*30 + 1)/3 = 27
    val out = resize(Array[Byte](10, 20, 30), 3, 1, 2, 1)
    assert(out.toSeq == Seq[Byte](13, 27), s"got ${out.toSeq}")
    // upscale 1x1 -> 2x2: every box overlaps the single pixel fully
    assert(resize(Array[Byte](77), 1, 1, 2, 2).toSeq == Seq[Byte](77, 77, 77, 77))
    // full-image average down to 1x1 (unsigned bytes: 200 > 127 must not
    // sign-poison the mean): (200+100+200+100+2)/4 = 150
    val avg = resize(Array[Byte](200.toByte, 100, 100, 200.toByte), 2, 2, 1, 1)
    assert((avg.head & 0xff) == 150, s"got ${avg.head & 0xff}")
  }

  test("NULL contract: malformed input rows filter, malformed targets fail the build") {
    val rows = Seq(
      (1L, Array.tabulate[Byte](12)(_.toByte), 4, 3), // well-formed
      (2L, Array[Byte](1, 2), 4, 3), // short buffer
      (3L, null.asInstanceOf[Array[Byte]], 4, 3), // null bytes
      (4L, Array[Byte](1), 0, 1) // degenerate dims
    ).toDF("id", "g", "w", "h")
    val out = rows.select(col("id"),
        graft.sources.Multimodal.resizeGray(col("g"), col("w"), col("h"), 2, 2).as("r"))
      .collect().map(r => r.getLong(0) -> r.isNullAt(1)).toMap
    assert(out == Map(1L -> false, 2L -> true, 3L -> true, 4L -> true))
    intercept[IllegalArgumentException](
      graft.sources.Multimodal.resizeGray(col("g"), col("w"), col("h"), 0, 8))
  }

  private def resizeRgb(rgb: Array[Byte], w: Int, h: Int,
                        ow: Int, oh: Int): Array[Byte] = {
    val rows = Seq((1L, rgb, w, h)).toDF("id", "g", "w", "h")
      .select(graft.sources.Multimodal.resizeRgb(col("g"), col("w"), col("h"), ow, oh).as("r"))
      .collect()
    rows.head.getAs[Array[Byte]](0)
  }

  test("RGB resize: each channel runs the exact gray kernel (round 20)") {
    // channel-equivalence pin: interleave three distinct planes, resize
    // as RGB, and the result's channel c must byte-match resizing plane
    // c alone through ResizeGray — one kernel, three strides
    val planes = Array.tabulate(3)(c =>
      Array.tabulate[Byte](36 * 32)(i => ((i * (37 + c * 7) + 11 + c) % 251).toByte))
    val rgb = new Array[Byte](36 * 32 * 3)
    for (i <- 0 until 36 * 32; c <- 0 until 3) rgb(i * 3 + c) = planes(c)(i)
    for ((ow, oh) <- Seq((36, 32), (9, 8), (7, 5))) {
      val got = resizeRgb(rgb, 36, 32, ow, oh)
      for (c <- 0 until 3) {
        val want = resize(planes(c), 36, 32, ow, oh)
        val gotPlane = Array.tabulate[Byte](ow * oh)(i => got(i * 3 + c))
        assert(gotPlane.toSeq == want.toSeq,
          s"channel $c diverges from the gray kernel at ${ow}x$oh")
      }
    }
  }

  test("RGB resize NULL contract mirrors the gray path; malformed targets fail the build") {
    val rows = Seq(
      (1L, Array.tabulate[Byte](36)(_.toByte), 4, 3),  // well-formed (3*4*3)
      (2L, Array[Byte](1, 2, 3), 4, 3),                // short buffer
      (3L, null.asInstanceOf[Array[Byte]], 4, 3)       // null bytes
    ).toDF("id", "g", "w", "h")
    val out = rows.select(col("id"),
        graft.sources.Multimodal.resizeRgb(col("g"), col("w"), col("h"), 2, 2).as("r"))
      .collect().map(r => r.getLong(0) -> r.isNullAt(1)).toMap
    assert(out == Map(1L -> false, 2L -> true, 3L -> true))
    intercept[IllegalArgumentException](
      graft.sources.Multimodal.resizeRgb(col("g"), col("w"), col("h"), 8, 0))
  }

  test("decodeImageRgb -> resizeRgb on a committed color PNG (the embedding normalize chain)") {
    def fixture(name: String): Array[Byte] = {
      val in = getClass.getResourceAsStream(s"/images/$name")
      require(in != null, s"missing fixture /images/$name")
      try in.readAllBytes() finally in.close()
    }
    import org.apache.spark.sql.DataFrame
    val media = Seq((1L, fixture("rgb_36x16.png")),
      (2L, fixture("pattern_36x16.png").take(40).toArray)).toDF("id", "bytes")
    val dec: DataFrame = graft.sources.Multimodal.decodeImageRgb(media, "bytes")
    val out = dec.select(col("id"), col("width"), col("height"),
        graft.sources.Multimodal.resizeRgb(col("rgb"), col("width"), col("height"), 9, 8).as("r"))
      .collect().map(r => r.getLong(0) -> r).toMap
    // the color PNG decodes to an interleaved 36x16 grid and normalizes
    // to 9x8x3; the truncated blob is NULL all the way through
    assert(out(1L).getInt(1) == 36 && out(1L).getInt(2) == 16)
    assert(out(1L).getAs[Array[Byte]](3).length == 9 * 8 * 3)
    assert(out(2L).isNullAt(1) && out(2L).isNullAt(3))
    // luma cross-check on the decoded grid: ITU-601 of the RGB decode
    // must equal the gray decode (one image, two layouts, same pixels)
    val Some((w, h, rgb)) = graft.sources.Multimodal.decodeToRgb(fixture("rgb_36x16.png"))
    val Some((_, _, gray)) = graft.sources.Multimodal.decodeToGray(fixture("rgb_36x16.png"))
    val luma = Array.tabulate[Byte](w * h) { i =>
      val r = rgb(3 * i) & 0xff; val g = rgb(3 * i + 1) & 0xff; val b = rgb(3 * i + 2) & 0xff
      ((299 * r + 587 * g + 114 * b + 500) / 1000).toByte
    }
    assert(luma.toSeq == gray.toSeq,
      "RGB and gray decodes must agree pixel-for-pixel through the luma formula")
  }

  test("pooledFeaturesRgb: hand-computed strided means, float-exact; loud dim guard") {
    // 1x1 RGB [10, 20, 30] at dim 2: stripe 0 = positions {0, 2} ->
    // (10+30)/2 = 20.0f; stripe 1 = {1} -> 20.0f (uneven stripes)
    val rows = Seq((1L, Array[Byte](10, 20, 30))).toDF("id", "rgb")
    val got = rows.select(graft.sources.Multimodal.pooledFeaturesRgb(
        col("rgb"), 1, 1, 2).as("f"))
      .head().getSeq[Float](0).toList
    assert(got == List(20.0f, 20.0f), s"got $got")
    // unsigned read: byte 0xFF pools as 255, not -1
    val hot = Seq((1L, Array[Byte](0xff.toByte, 0, 0))).toDF("id", "rgb")
    val gotHot = hot.select(graft.sources.Multimodal.pooledFeaturesRgb(
        col("rgb"), 1, 1, 3).as("f"))
      .head().getSeq[Float](0).toList
    assert(gotHot == List(255.0f, 0.0f, 0.0f), s"got $gotHot")
    intercept[IllegalArgumentException](
      graft.sources.Multimodal.pooledFeaturesRgb(col("rgb"), 1, 1, 4))
  }

  test("imageEmbeddingsRgb: renditions embed IDENTICALLY; undecodable rows carry NULL") {
    // the normalize-before-embed guarantee on REAL bytes: a pixel-doubled
    // re-encode of the color fixture must produce the SAME vector,
    // because the exact resize collapses the renditions before pooling
    def fixture(name: String): Array[Byte] = {
      val in = getClass.getResourceAsStream(s"/images/$name")
      require(in != null, s"missing fixture /images/$name")
      try in.readAllBytes() finally in.close()
    }
    val base = fixture("rgb_36x16.png")
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(base))
    val up = new java.awt.image.BufferedImage(72, 32,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 32; x <- 0 until 72)
      up.setRGB(x, y, img.getRGB(x / 2, y / 2))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(up, "png", bos)
    val media = Seq((1L, base), (2L, bos.toByteArray),
      (3L, base.take(40).toArray)).toDF("id", "bytes")
    val out = graft.sources.Multimodal.imageEmbeddingsRgb(
        media, "id", "bytes", outW = 9, outH = 8, dim = 16)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else r.getSeq[Float](1).toList)).toMap
    assert(out(1L) != null && out(1L).length == 16)
    assert(out(1L) == out(2L),
      "a pixel-doubled rendition must embed identically (resize normalizes first)")
    assert(out(3L) == null, "undecodable bytes carry a NULL embedding")
  }

  test("composes scan-side with dHash: a resized copy collapses with its original") {
    // dHash is invariant under EXACT integer upscales; an area-average
    // resize back to the original size reproduces the original grid, so
    // normalize-then-hash maps both renditions to one signature
    val img = Array.tabulate[Byte](18 * 16)(i => ((i * 91 + 5) % 240).toByte)
    val up = new Array[Byte](36 * 32)
    for (y <- 0 until 32; x <- 0 until 36)
      up(y * 36 + x) = img((y / 2) * 18 + x / 2)
    val rows = Seq((1L, img, 18, 16), (2L, up, 36, 32)).toDF("id", "g", "w", "h")
    val hashed = rows.select(col("id"), graft.sources.Multimodal.dHash64(
        graft.sources.Multimodal.resizeGray(col("g"), col("w"), col("h"), 18, 16),
        lit(18), lit(16)).as("dh"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hashed(1L) == hashed(2L),
      "normalize-to-fixed-size then hash must collapse the two renditions")
  }
}
