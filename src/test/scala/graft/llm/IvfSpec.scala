package graft.llm

import graft.SparkSpec
import graft.sources.Tables
import org.apache.spark.sql.functions._

class IvfSpec extends SparkSpec {

  private lazy val emb = Tables.load(spark, sf, "embeddings")
  private lazy val queries = emb.filter(col("vec_id") < 10)
    .select(col("vec_id").as("query_id"), col("embedding"))
  private lazy val corpus = emb.select(col("vec_id").as("neighbor_id"), col("embedding"))

  test("meanEmbedding pools per-group centroids exactly; empty/null vectors contribute nothing") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq(1.0f, 2.0f)),
      (1L, Seq(3.0f, 6.0f)),
      (2L, Seq(-1.5f, 0.5f)),
      (3L, Seq.empty[Float]),
      (3L, null.asInstanceOf[Seq[Float]]))
      .toDF("grp", "embedding")
    val out = Similarity.meanEmbedding(df, "grp").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getSeq[Double](2)))).toMap
    assert(out(1L) == ((2L, Seq(2.0, 4.0))))
    assert(out(2L) == ((1L, Seq(-1.5, 0.5))))
    // groups with only empty/null embeddings produce no row (posexplode)
    assert(!out.contains(3L))
    // partitioning-independence: DECIMAL sums make the mean order-exact
    val a = Similarity.meanEmbedding(emb.select((col("vec_id") % 7).as("grp"), col("embedding")), "grp")
    val b = Similarity.meanEmbedding(emb.repartition(13).select((col("vec_id") % 7).as("grp"), col("embedding")), "grp")
    assert(rowsOf(a.select(col("grp"), col("n_vectors"),
        posexplode(col("centroid")).as(Seq("pos", "mean")))) ==
      rowsOf(b.select(col("grp"), col("n_vectors"),
        posexplode(col("centroid")).as(Seq("pos", "mean")))))
  }

  test("IVF training is deterministic and buckets are non-degenerate") {
    val i1 = Similarity.IvfIndex.train(emb, "vec_id", k = 8, sampleSize = 256, iters = 4)
    val i2 = Similarity.IvfIndex.train(emb, "vec_id", k = 8, sampleSize = 256, iters = 4)
    assert(i1.centroids.zip(i2.centroids).forall { case (a, b) => a.sameElements(b) })
    // embCol is a parameter like the sibling APIs (VERDICT r15 #4): a
    // renamed embedding column trains to the identical quantizer
    val renamed = Similarity.IvfIndex.train(
      emb.withColumnRenamed("embedding", "vec"), "vec_id",
      k = 8, sampleSize = 256, iters = 4, embCol = "vec")
    assert(i1.centroids.zip(renamed.centroids).forall { case (a, b) => a.sameElements(b) })
    // the query-side convention's adapter: withEmbedding routes a
    // renamed corpus through any search API unchanged, and its guards
    // fire loudly on absence / silent-shadow hazards
    val vec = emb.withColumnRenamed("embedding", "vec")
    assert(rowsOf(Similarity.bruteForceTopKAgg(
        Similarity.withEmbedding(vec.filter(col("vec_id") < 5)
          .select(col("vec_id").as("query_id"), col("vec")), "vec"),
        Similarity.withEmbedding(vec
          .select(col("vec_id").as("neighbor_id"), col("vec")), "vec"), 3)) ==
      rowsOf(Similarity.bruteForceTopKAgg(
        emb.filter(col("vec_id") < 5).select(col("vec_id").as("query_id"), col("embedding")),
        emb.select(col("vec_id").as("neighbor_id"), col("embedding")), 3)))
    intercept[IllegalArgumentException](Similarity.withEmbedding(emb, "nope"))
    intercept[IllegalArgumentException](
      Similarity.withEmbedding(emb.withColumn("vec", col("embedding")), "vec"))
    val buckets = corpus.select(i1.assignment(col("embedding")).as("b"))
      .groupBy("b").count().collect()
    assert(buckets.length >= 4, s"expected spread over buckets, got ${buckets.length}")
  }

  test("IVF probes scan a fraction of the corpus yet keep useful recall") {
    val index = Similarity.IvfIndex.train(emb, "vec_id", k = 8, sampleSize = 256, iters = 4)
    val exact = rowsOf(Similarity.bruteForceTopK(queries, corpus, 3)
      .select("query_id", "neighbor_id"))
    val approx = rowsOf(Similarity.ivfTopK(queries, corpus, index, topK = 3, nprobe = 3)
      .select("query_id", "neighbor_id"))
    val recall = exact.intersect(approx).size.toDouble / exact.size
    // random embeddings are the worst case; probing 3/8 buckets must beat
    // the 3/8 random floor to show the quantizer is informative
    assert(recall >= 0.375, s"recall $recall at nprobe=3/8")
    // full probe = exact search (every bucket scanned)
    val full = rowsOf(Similarity.ivfTopK(queries, corpus, index, topK = 3, nprobe = 8)
      .select("query_id", "neighbor_id"))
    assert(full == exact)
  }

  test("IvfIndex save/load round-trips centroids and assignments") {
    val index = Similarity.IvfIndex.train(emb, "vec_id", k = 8, sampleSize = 256, iters = 4)
    val path = s"/tmp/graft_ivf_index_${System.getProperty("user.name")}"
    index.save(spark, path)
    val loaded = Similarity.IvfIndex.load(spark, path)
    assert(loaded.k == index.k)
    assert(loaded.centroids.zip(index.centroids).forall { case (a, b) => a.sameElements(b) })
    val diff = corpus.select(
      index.assignment(col("embedding")).as("a"),
      loaded.assignment(col("embedding")).as("b"))
      .filter(col("a") =!= col("b")).count()
    assert(diff == 0, "loaded index must reproduce every bucket assignment")
  }

  test("ivfTopK without the query broadcast hint returns the same rows") {
    val index = Similarity.IvfIndex.train(emb, "vec_id", k = 8, sampleSize = 256, iters = 4)
    val hinted = rowsOf(Similarity.ivfTopK(queries, corpus, index, topK = 3, nprobe = 3)
      .select("query_id", "rank", "neighbor_id"))
    val shuffled = rowsOf(Similarity.ivfTopK(queries, corpus, index, topK = 3, nprobe = 3,
      broadcastQueries = false).select("query_id", "rank", "neighbor_id"))
    assert(hinted == shuffled)
  }

  test("ivfTopK bounded-aggregate tail equals the window form, embeddings pruned pre-shuffle") {
    // the IVF half of the agg==window pin (the LSH half lives in LlmSpec):
    // same rows as the reference window tail, a map-side partial TopKBySim
    // combine, and no embedding column in any Exchange
    val index = Similarity.IvfIndex.train(emb, "vec_id", k = 8, sampleSize = 256, iters = 4)
    val agg = Similarity.ivfTopK(queries, corpus, index, topK = 3, nprobe = 3)
    val aggRows = rowsOf(agg.select(col("query_id").cast("long"),
      col("rank").cast("int"), col("neighbor_id").cast("long"), col("sim")))
    val window = rowsOf(Similarity.ivfTopKWindow(queries, corpus, index, topK = 3, nprobe = 3)
      .select(col("query_id").cast("long"),
        col("rank").cast("int"), col("neighbor_id").cast("long"), col("sim")))
    assert(aggRows == window)
    val plan = agg.queryExecution.executedPlan.toString
    assert(plan.contains("partial_topkbysim"), s"no partial TopKBySim phase in:\n$plan")
    assertNoEmbeddingInExchange(agg)
  }
  test("meanEmbedding fails loudly on ragged embedding dimensions within a group") {
    import spark.implicits._
    val ragged = Seq(
      (1L, Seq(1.0f, 2.0f, 3.0f)),
      (1L, Seq(1.0f, 2.0f))).toDF("grp", "embedding")
    val e = intercept[Exception] {
      Similarity.meanEmbedding(ragged, "grp").collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("ragged")), s"unexpected error: ${e.getMessage}")
    // the guard must survive column pruning (ADVICE r13): anchored only
    // to n_vectors, selecting just the centroid deleted the raise_error
    // and returned a plausible-looking ill-defined centroid
    val e2 = intercept[Exception] {
      Similarity.meanEmbedding(ragged, "grp").select("centroid").collect()
    }
    assert(msgs(e2).exists(_.contains("ragged")),
      s"centroid-only projection pruned the ragged guard: ${e2.getMessage}")
  }

}
