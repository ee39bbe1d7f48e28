package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class Bm25Spec extends SparkSpec {
  import spark.implicits._

  // The operator's exact arithmetic, recomputed scalar-side: per-term
  // IEEE double contribution rounded to DECIMAL(18,6) HALF_UP, summed
  // exactly — what the distributed plan must reproduce bit-for-bit.
  private def contrib(tf: Long, df: Long, dl: Long, n: Long, sumDl: Long,
                      k1: Double = 1.2, b: Double = 0.75): BigDecimal = {
    val idf = math.log10(1.0 + ((n.toDouble - df.toDouble) + 0.5) / (df.toDouble + 0.5))
    val tfn = (tf.toDouble * (k1 + 1.0)) /
      (tf.toDouble + k1 * ((1.0 - b) + (b * dl.toDouble) / (sumDl.toDouble / n.toDouble)))
    BigDecimal(idf * tfn).setScale(6, BigDecimal.RoundingMode.HALF_UP)
  }

  private val corpus = Seq(
    (1L, "apple banana apple"),          // dl=3: apple tf=2, banana tf=1
    (2L, "banana cherry"),               // dl=2
    (3L, "cherry cherry cherry durian")  // dl=4
  ).toDF("doc_id", "text")

  test("bm25TopK matches the hand-computed Okapi scores and ranking") {
    val queries = Seq((10L, "apple cherry")).toDF("query_id", "text")
    val out = TextAnalysis.bm25TopK(corpus, queries, "doc_id", "text",
      "query_id", "text", k = 5)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    // N=3, sum_dl=9; df(apple)=1, df(cherry)=2
    val d1 = contrib(tf = 2, df = 1, dl = 3, n = 3, sumDl = 9) // doc1: apple
    val d2 = contrib(tf = 1, df = 2, dl = 2, n = 3, sumDl = 9) // doc2: cherry
    val d3 = contrib(tf = 3, df = 2, dl = 4, n = 3, sumDl = 9) // doc3: cherry
    assert(d1 > d3 && d3 > d2, s"fixture must rank 1 > 3 > 2, got $d1 $d3 $d2")
    assert(out.toSeq == Seq(
      (10L, 1, 1L, d1.toDouble),
      (10L, 2, 3L, d3.toDouble),
      (10L, 3, 2L, d2.toDouble)))
  }

  test("bm25TopK sums multi-term matches in DECIMAL (order-independent)") {
    val queries = Seq((10L, "banana cherry")).toDF("query_id", "text")
    val base = TextAnalysis.bm25TopK(corpus, queries, "doc_id", "text",
      "query_id", "text", k = 5)
    val rows = rowsOf(base)
    // doc2 matches BOTH terms: its score is the exact DECIMAL sum
    val d2 = contrib(tf = 1, df = 2, dl = 2, n = 3, sumDl = 9) + // banana
      contrib(tf = 1, df = 2, dl = 2, n = 3, sumDl = 9)          // cherry (same tf/df/dl here)
    assert(rows.exists(r => r(0) == 10L && r(2) == 2L && r(3) == d2.toDouble))
    // partition layout must never change a score or a rank
    val repart = TextAnalysis.bm25TopK(corpus.repartition(7), queries,
      "doc_id", "text", "query_id", "text", k = 5)
    assert(rowsOf(repart) == rows)
  }

  test("bm25TopK caps at k with dense ranks and ascending-id ties") {
    val docs = Seq.tabulate(6)(i => (i.toLong, "same same text")).toDF("doc_id", "text")
    val queries = Seq((1L, "same")).toDF("query_id", "text")
    val out = TextAnalysis.bm25TopK(docs, queries, "doc_id", "text",
      "query_id", "text", k = 4)
      .collect().map(r => (r.getInt(1), r.getLong(2)))
    // all six docs tie exactly — survivors are the 4 smallest ids, ranked by id
    assert(out.toSeq == Seq((1, 0L), (2, 1L), (3, 2L), (4, 3L)))
  }

  test("bm25TopK edge cases: empty query, OOV-only query, null-text doc") {
    val docs = corpus.union(Seq((4L, null.asInstanceOf[String])).toDF("doc_id", "text"))
    val queries = Seq(
      (10L, "apple"), (11L, ""), (12L, "zzz-not-in-corpus")).toDF("query_id", "text")
    val out = TextAnalysis.bm25TopK(docs, queries, "doc_id", "text",
      "query_id", "text", k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getDouble(3)))
    // empty and OOV queries emit nothing; the null-text doc emits no
    // postings but DOES count in N and is skipped by sum_dl — idf and
    // avgdl shift accordingly (N=4, sum_dl=9)
    assert(out.map(_._1).toSet == Set(10L))
    val expected = contrib(tf = 2, df = 1, dl = 3, n = 4, sumDl = 9)
    assert(out.toSeq == Seq((10L, 1L, expected.toDouble)))
  }

  test("Bm25Index lifecycle: build==inline, save/load, bucketed shuffle-free df") {
    val queries = Seq((10L, "apple cherry"), (11L, "banana")).toDF("query_id", "text")
    val inline = rowsOf(TextAnalysis.bm25TopK(corpus, queries,
      "doc_id", "text", "query_id", "text", k = 5))
    val idx = TextAnalysis.Bm25Index.build(corpus, "doc_id", "text")
    val served = rowsOf(TextAnalysis.Bm25Index.search(idx, queries,
      "query_id", "text", k = 5))
    assert(served == inline, "index search must equal the inline operator")
    // plain parquet round trip
    val dir = java.nio.file.Files.createTempDirectory("bm25idx").toString
    TextAnalysis.Bm25Index.save(idx, s"$dir/plain")
    val loaded = TextAnalysis.Bm25Index.load(spark, s"$dir/plain")
    assert(rowsOf(TextAnalysis.Bm25Index.search(loaded, queries,
      "query_id", "text", k = 5)) == inline)
    // bucketed: identical serving AND the per-term df agg needs no Exchange
    spark.sql("DROP TABLE IF EXISTS bm25_idx_spec")
    TextAnalysis.Bm25Index.saveBucketed(idx, "bm25_idx_spec", s"$dir/bucketed",
      numBuckets = 4)
    val bucketed = TextAnalysis.Bm25Index.loadBucketed(spark, "bm25_idx_spec", s"$dir/bucketed")
    assert(rowsOf(TextAnalysis.Bm25Index.search(bucketed, queries,
      "query_id", "text", k = 5)) == inline)
    assert(graft.sources.Bucketing.isShuffleFree(
      bucketed.postings.groupBy(col("term")).count()),
      "a bucketed index must aggregate by term without an Exchange")
    // fresh-application path (ADVICE r15): drop the catalog entry, load
    // again — re-registers from the sidecar, serving and bucketing intact
    spark.sql("DROP TABLE bm25_idx_spec")
    val fresh = TextAnalysis.Bm25Index.loadBucketed(spark, "bm25_idx_spec", s"$dir/bucketed")
    assert(spark.catalog.tableExists("bm25_idx_spec"))
    assert(rowsOf(TextAnalysis.Bm25Index.search(fresh, queries,
      "query_id", "text", k = 5)) == inline)
    assert(graft.sources.Bucketing.isShuffleFree(
      fresh.postings.groupBy(col("term")).count()))
    spark.sql("DROP TABLE IF EXISTS bm25_idx_spec")
  }

  test("append's disjointness probe: the big-batch fallback path raises and passes like the broadcast path") {
    val idx = TextAnalysis.Bm25Index.build(corpus, "doc_id", "text")
    val dupBatch = Seq((1L, "apple redelivered")).toDF("doc_id", "text")
    val okBatch = Seq((10L, "apple durian")).toDF("doc_id", "text")
    // broadcastIdLimit = 0 forces the shuffle semi-join fallback
    val e = intercept[IllegalArgumentException] {
      TextAnalysis.Bm25Index.append(idx, dupBatch, "doc_id", "text",
        broadcastIdLimit = 0L)
    }
    assert(e.getMessage.contains("re-delivers"))
    val viaFallback = TextAnalysis.Bm25Index.append(idx, okBatch, "doc_id", "text",
      broadcastIdLimit = 0L)
    val viaBroadcast = TextAnalysis.Bm25Index.append(idx, okBatch, "doc_id", "text")
    assert(rowsOf(viaFallback.postings) == rowsOf(viaBroadcast.postings))
  }

  test("bm25TopK: colliding output column names raise instead of duplicating") {
    // decontamination shape: docs and queries both keyed 'doc_id'
    val queries = Seq((10L, "apple cherry")).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      TextAnalysis.bm25TopK(corpus, queries, "doc_id", "text", "doc_id", "text")
    }
    assert(e.getMessage.contains("distinct"))
    intercept[IllegalArgumentException] {
      TextAnalysis.bm25TopK(corpus, queries, "score", "text", "query_id", "text")
    }
    intercept[IllegalArgumentException] { // fixed names guarded in search too
      TextAnalysis.Bm25Index.search(
        TextAnalysis.Bm25Index.build(corpus, "doc_id", "text"),
        queries.withColumnRenamed("doc_id", "rank"), "rank", "text")
    }
    // non-colliding renames still work and carry the caller's names
    val ok = TextAnalysis.bm25TopK(corpus, queries.withColumnRenamed("doc_id", "qid"),
      "doc_id", "text", "qid", "text", k = 2)
    assert(ok.columns.toSeq == Seq("qid", "rank", "doc_id", "score"))
    assert(ok.count() > 0)
  }

  test("Bm25Index.append equals the union rebuild exactly; re-delivered ids raise") {
    val batch = Seq(
      (10L, "apple durian"), (11L, "cherry cherry banana")).toDF("doc_id", "text")
    val queries = Seq((1L, "apple cherry durian")).toDF("query_id", "text")
    val appended = TextAnalysis.Bm25Index.append(
      TextAnalysis.Bm25Index.build(corpus, "doc_id", "text"),
      batch, "doc_id", "text")
    val rebuilt = TextAnalysis.Bm25Index.build(
      corpus.unionByName(batch), "doc_id", "text")
    assert(rowsOf(TextAnalysis.Bm25Index.search(appended, queries,
      "query_id", "text", k = 10)) ==
      rowsOf(TextAnalysis.Bm25Index.search(rebuilt, queries,
        "query_id", "text", k = 10)),
      "append must converge to the union rebuild row for row")
    val e = intercept[IllegalArgumentException] {
      TextAnalysis.Bm25Index.append(
        TextAnalysis.Bm25Index.build(corpus, "doc_id", "text"),
        Seq((2L, "banana")).toDF("doc_id", "text"), "doc_id", "text")
    }
    assert(e.getMessage.contains("re-delivers already-indexed id"))
    // the guard probes the batch's RAW id column, so even an EMPTY-TEXT
    // re-delivery (no postings to collide with) is caught
    val e2 = intercept[IllegalArgumentException] {
      TextAnalysis.Bm25Index.append(
        TextAnalysis.Bm25Index.build(corpus, "doc_id", "text"),
        Seq((2L, "")).toDF("doc_id", "text"), "doc_id", "text")
    }
    assert(e2.getMessage.contains("re-delivers already-indexed id"))
  }

  test("Bm25Index.remove equals the complement rebuild exactly; absent ids are idempotent") {
    val extra = Seq(
      (10L, "apple durian"), (11L, "cherry cherry banana")).toDF("doc_id", "text")
    val queries = Seq((1L, "apple cherry durian banana")).toDF("query_id", "text")
    val full = TextAnalysis.Bm25Index.build(
      corpus.unionByName(extra), "doc_id", "text")
    // retract the extra docs: scores/ranks/stats must equal the index
    // that never saw them — BM25's statistics subtract exactly
    val removed = TextAnalysis.Bm25Index.remove(
      full, Seq(10L, 11L).toDF("id"))
    val complement = TextAnalysis.Bm25Index.build(corpus, "doc_id", "text")
    assert(rowsOf(TextAnalysis.Bm25Index.search(removed, queries,
      "query_id", "text", k = 10)) ==
      rowsOf(TextAnalysis.Bm25Index.search(complement, queries,
        "query_id", "text", k = 10)),
      "remove must converge to the complement rebuild row for row")
    assert(rowsOf(removed.stats) == rowsOf(complement.stats))
    // ids never indexed subtract nothing (idempotent takedown replay)
    val noop = TextAnalysis.Bm25Index.remove(
      complement, Seq(999L, 10L).toDF("id"))
    assert(rowsOf(noop.stats) == rowsOf(complement.stats))
    assert(rowsOf(noop.postings) == rowsOf(complement.postings))
    // append-then-remove round-trips (the full lifecycle)
    val roundTrip = TextAnalysis.Bm25Index.remove(
      TextAnalysis.Bm25Index.append(complement, extra, "doc_id", "text"),
      extra.select(col("doc_id")))
    assert(rowsOf(TextAnalysis.Bm25Index.search(roundTrip, queries,
      "query_id", "text", k = 10)) ==
      rowsOf(TextAnalysis.Bm25Index.search(complement, queries,
        "query_id", "text", k = 10)))
    // the big-list fallback path (shuffle joins) subtracts identically
    val fallback = TextAnalysis.Bm25Index.remove(
      full, Seq(10L, 11L).toDF("id"), broadcastIdLimit = 1L)
    assert(rowsOf(fallback.stats) == rowsOf(complement.stats))
    assert(rowsOf(fallback.postings) == rowsOf(complement.postings))
  }

  test("bm25TopK plan: query joins broadcast, postings prune before any shuffle") {
    val queries = Seq((10L, "apple cherry")).toDF("query_id", "text")
    val df = TextAnalysis.bm25TopK(corpus, queries, "doc_id", "text",
      "query_id", "text", k = 5)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastExchange"),
      "query vocabulary and fan-out must broadcast, never shuffle the corpus")
    assert(plan.contains("WindowGroupLimit"),
      "the per-query top-k window must prune map-side")
  }
}
