package graft.llm

import graft.SparkSpec
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Product quantization: training determinism, encode/ADC exactness
  * against driver-side reconstruction, compression-quality monotonicity,
  * clone-planted top-k recall (the Q-L65 contract at spec scale), and
  * the no-wide-column Exchange discipline.
  */
class PqSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = Tables.load(spark, sf, "embeddings")

  private def cosine(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < math.min(a.length, b.length)) {
      dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i); i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  test("PQ training is deterministic, partitioning-independent, and shaped (m, ksub, dsub)") {
    val c1 = Similarity.PqCodebook.train(emb, "vec_id", m = 16, ksub = 16,
      sampleSize = 256, iters = 4)
    val c0 = Similarity.PqCodebook.train(emb.withColumnRenamed("embedding", "vec"),
      "vec_id", m = 16, ksub = 16, sampleSize = 256, iters = 4, embCol = "vec")
    val c2 = Similarity.PqCodebook.train(emb.repartition(13), "vec_id", m = 16, ksub = 16,
      sampleSize = 256, iters = 4)
    assert(c1.m == 16 && c1.ksub == 16 && c1.dim == 64)
    assert(c1.centroids.map(_.map(_.toSeq).toSeq).toSeq ==
      c2.centroids.map(_.map(_.toSeq).toSeq).toSeq,
      "hash-ordered sample + fixed Lloyd must not see partitioning")
    assert(c1.centroids.map(_.map(_.toSeq).toSeq).toSeq ==
      c0.centroids.map(_.map(_.toSeq).toSeq).toSeq,
      "embCol rename must train the identical codebook")
    // non-degenerate: every subspace uses more than one centroid id
    val codes = emb.select(c1.encode(col("embedding")).as("c")).collect()
      .map(_.getSeq[Byte](0).toSeq)
    assert(codes.forall(_.length == 16))
    (0 until 16).foreach { j =>
      assert(codes.map(_(j)).distinct.size > 1, s"subspace $j collapsed to one code")
    }
  }

  test("identical vectors encode to identical codes; ADC equals reconstruction cosine exactly") {
    val cb = Similarity.PqCodebook.train(emb, "vec_id", m = 16, ksub = 16)
    val rows = emb.limit(20).select(col("vec_id"),
      col("embedding"),
      cb.encode(col("embedding")).as("code"),
      cb.queryTables(col("embedding")).as("t"))
      .collect()
    rows.foreach { r =>
      val v = r.getSeq[Float](1).toArray
      val code = r.getSeq[Byte](2).toArray.map(_ & 0xff)
      // ADC score of (v's tables, v's own code) == cosine(v, reconstruct(code))
      val recon = cb.reconstruct(code)
      val adc = emb.filter(col("vec_id") === r.getLong(0))
        .select(cb.adcCosine(cb.queryTables(col("embedding")), cb.encode(col("embedding"))))
        .head().getDouble(0)
      assert(math.abs(adc - cosine(v, recon)) < 1e-9,
        s"vec ${r.getLong(0)}: adc=$adc recon-cos=${cosine(v, recon)}")
    }
    // clones encode identically
    val two = emb.limit(1).select(col("embedding"))
      .union(emb.limit(1).select(col("embedding")))
      .select(cb.encode(col("embedding")).as("c")).collect()
    assert(two(0).getSeq[Byte](0) == two(1).getSeq[Byte](0))
  }

  test("reconstruction quality is monotone in ksub (mean squared error)") {
    def mse(ksub: Int): Double = {
      val cb = Similarity.PqCodebook.train(emb, "vec_id", m = 16, ksub = ksub)
      val vs = emb.select(col("embedding"), cb.encode(col("embedding")).as("code")).collect()
      vs.map { r =>
        val v = r.getSeq[Float](0).toArray
        val recon = cb.reconstruct(r.getSeq[Byte](1).toArray.map(_ & 0xff))
        v.zip(recon).map { case (a, b) => (a - b).toDouble * (a - b) }.sum
      }.sum / vs.length
    }
    val coarse = mse(2)
    val fine = mse(16)
    assert(fine < coarse, s"ksub=16 mse $fine !< ksub=2 mse $coarse")
  }

  test("pqTopK recalls planted exact clones ahead of every organic vector (Q-L65 contract)") {
    val cbQueries = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding"))
    val clones = (1 to 3).map { r =>
      emb.filter(col("vec_id") < 10)
        .select((col("vec_id") + r * 1000000L).as("neighbor_id"), col("embedding"))
    }.reduce(_ unionByName _)
    val corpus = emb.select(col("vec_id").as("neighbor_id"), col("embedding"))
      .unionByName(clones)
    val cb = Similarity.PqCodebook.train(corpus, "neighbor_id", m = 16, ksub = 16)
    val got = Similarity.pqTopK(cbQueries, corpus, cb, k = 3)
      .select(col("query_id"), col("rank"), col("neighbor_id"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val want = (for (q <- 0L until 10L; r <- 1 to 3)
      yield (q, r, q + r * 1000000L)).toSet
    assert(got == want, s"diff: ${(got diff want) ++ (want diff got)}")
    // the two-job form over pre-encoded codes is the same operator
    val codes = corpus.select(col("neighbor_id"), cb.encode(col("embedding")).as("pq_code"))
    val got2 = Similarity.pqTopKOnCodes(cbQueries, codes, cb, k = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(got2 == want)
  }

  test("ivfPqTopK composes the coarse quantizer with ADC and keeps clone recall") {
    val cbQueries = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding"))
    val clones = (1 to 3).map { r =>
      emb.filter(col("vec_id") < 10)
        .select((col("vec_id") + r * 1000000L).as("neighbor_id"), col("embedding"))
    }.reduce(_ unionByName _)
    val corpus = emb.select(col("vec_id").as("neighbor_id"), col("embedding"))
      .unionByName(clones)
    val ivf = Similarity.IvfIndex.train(corpus, "neighbor_id", k = 4)
    val cb = Similarity.PqCodebook.train(corpus, "neighbor_id", m = 16, ksub = 16)
    // a clone shares its query's embedding, hence its IVF bucket: nprobe=1
    // always reaches all three clones
    val got = Similarity.ivfPqTopK(cbQueries, corpus, ivf, cb, topK = 3, nprobe = 1)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val want = (for (q <- 0L until 10L; r <- 1 to 3)
      yield (q, r, q + r * 1000000L)).toSet
    assert(got == want, s"diff: ${(got diff want) ++ (want diff got)}")
  }

  test("zero-norm and null-slot vectors score the rank-last sentinel, never NaN") {
    val cb = Similarity.PqCodebook.train(emb, "vec_id", m = 16, ksub = 16)
    val zero = Seq((0L, Seq.fill(64)(0.0f))).toDF("query_id", "embedding")
    val s = zero.select(cb.adcCosine(cb.queryTables(col("embedding")),
      cb.encode(col("embedding")))).head().getDouble(0)
    assert(s == -2.0)
    val short = Seq((0L, Seq(1.0f, 2.0f))).toDF("query_id", "embedding")
    val s2 = short.select(cb.adcCosine(cb.queryTables(col("embedding")),
      cb.encode(col("embedding")))).head().getDouble(0)
    assert(s2 == -2.0, "truncated vector poisons to rank-last, not a crash")
  }

  test("malformed CORPUS vectors encode to the empty sentinel code and rank last (never top-k)") {
    val cb = Similarity.PqCodebook.train(emb, "vec_id", m = 16, ksub = 16)
    // corpus: 50 organic rows + a NaN-slot row + a truncated row — before
    // the sentinel these encoded to a VALID-LOOKING code (bad subspaces
    // fell back to code 0) that could score a plausible ADC similarity
    val nanVec = Seq.tabulate(64)(i => if (i == 7) Float.NaN else 0.5f)
    val bad = Seq((90001L, nanVec), (90002L, Seq(1.0f, 2.0f)))
      .toDF("neighbor_id", "embedding")
    val corpus = emb.filter(col("vec_id") < 50)
      .select(col("vec_id").as("neighbor_id"), col("embedding"))
      .unionByName(bad)
    val codes = bad.select(col("neighbor_id"), cb.encode(col("embedding")).as("c"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Byte](1).length).toMap
    assert(codes == Map(90001L -> 0, 90002L -> 0),
      s"malformed corpus vectors must encode to the EMPTY sentinel, got $codes")
    val queries = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding"))
    // k = 49 forces every rankable corpus row into each query's top-k —
    // the ONLY rows that may be absent are the two sentinels
    val got = Similarity.pqTopK(queries, corpus, cb, k = 49)
      .select(col("neighbor_id")).distinct()
      .collect().map(_.getLong(0)).toSet
    assert(!got.contains(90001L) && !got.contains(90002L),
      "poisoned corpus rows must rank below every organic row")
    assert(got.size >= 40, s"organic rows should fill the top-k, got ${got.size}")
  }

  test("codebook save/load round-trips and loaded codes match") {
    val cb = Similarity.PqCodebook.train(emb, "vec_id", m = 8, ksub = 16)
    val dir = java.nio.file.Files.createTempDirectory("pq_cb").toString
    try {
      cb.save(spark, s"$dir/cb")
      val back = Similarity.PqCodebook.load(spark, s"$dir/cb")
      assert(back.centroids.map(_.map(_.toSeq).toSeq).toSeq ==
        cb.centroids.map(_.map(_.toSeq).toSeq).toSeq)
    } finally {
      import scala.reflect.io.Directory
      new Directory(new java.io.File(dir)).deleteRecursively()
    }
  }

  test("neither embeddings nor codes ride any shuffle Exchange in pqTopK") {
    val cbQueries = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding"))
    val corpus = emb.select(col("vec_id").as("neighbor_id"), col("embedding"))
    val cb = Similarity.PqCodebook.train(corpus, "neighbor_id", m = 16, ksub = 16)
    assertNoEmbeddingInExchange(Similarity.pqTopK(cbQueries, corpus, cb, k = 3))
  }
}
