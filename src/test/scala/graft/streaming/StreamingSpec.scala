package graft.streaming

import graft.SparkSpec
import graft.sources.Tables
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import java.sql.Timestamp

class StreamingSpec extends SparkSpec {
  import spark.implicits._
  import StreamingSpec.Ev

  /** Replay sf0.001 events through a MemoryStream in two chunks; after
    * processAllAvailable the complete-mode result must equal the batch run
    * of the same stage (`SURVEY.md §5.2` streaming contract).
    */
  private def replayEquals(stageOf: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame,
                           queryName: String): Unit = {
    val events = Tables.load(spark, sf, "events")
      .select($"ts", $"user_id", $"event_type", $"value")
    val data = events.collect().map(r =>
      Ev(r.getTimestamp(0).toInstant, r.getLong(1), r.getString(2), r.getDouble(3)))

    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[Ev]
    val streamed = stageOf(stream.toDF())
    val q = streamed.writeStream
      .format("memory").queryName(queryName).outputMode("complete").start()
    try {
      val (a, b) = data.splitAt(data.length / 2)
      stream.addData(a.toIndexedSeq)
      q.processAllAvailable()
      stream.addData(b.toIndexedSeq)
      q.processAllAvailable()
      val streamedOut = spark.table(queryName)
      val batchOut = stageOf(events)
      assert(rowsOf(streamedOut) == rowsOf(batchOut),
        s"$queryName: streaming result after flush != batch result")
    } finally q.stop()
  }

  test("stream-stream interval join: replay equals batch, append mode") {
    import StreamingSpec.{Click, View}
    def t(m: Int) = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    val clickData = Seq(Click(t(0), 1, "a"), Click(t(10), 1, "b"),
      Click(t(20), 2, "c"), Click(t(40), 3, "d"))
    val viewData = Seq(View(t(2), 1, "x"), View(t(12), 1, "y"),
      View(t(25), 2, "z"), View(t(55), 3, "w")) // w is 15m after d → no match

    def stage(right: org.apache.spark.sql.DataFrame) =
      Windowed.intervalJoin("ij", right,
        col("ckey"), col("vkey"), col("cts"), col("vts"),
        "0 seconds", "10 minutes")

    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val clicks = MemoryStream[Click]
    val views = MemoryStream[View]
    val joined = stage(views.toDF().withWatermark("vts", "1 minute"))(
      clicks.toDF().withWatermark("cts", "1 minute"))
      .select($"page", $"item")
    val q = joined.writeStream
      .format("memory").queryName("ij_out").outputMode("append").start()
    try {
      clicks.addData(clickData.take(2)); views.addData(viewData.take(2))
      q.processAllAvailable()
      clicks.addData(clickData.drop(2)); views.addData(viewData.drop(2))
      q.processAllAvailable()
      val streamed = spark.table("ij_out")
      val batch = stage(viewData.toDF())(clickData.toDF()).select($"page", $"item")
      assert(rowsOf(streamed) == rowsOf(batch))
      // sanity on the batch semantics themselves
      assert(rowsOf(batch) == Set(
        Seq("a", "x"), Seq("b", "y"), Seq("c", "z"))) // d→w outside the bound
    } finally q.stop()
  }

  test("stream-static enrichment: the batch Enrich stage composes on a stream") {
    import StreamingSpec.Click
    val dim = Seq((1L, "alice"), (2L, "bob")).toDF("k", "name")
    val enrich = graft.stages.Enrich.lookup("who", dim,
      joinCond = col("ckey") === col("k"))(
      "who" -> coalesce(col("name"), lit("unknown")))
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val clicks = MemoryStream[Click]
    def t(m: Int) = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    val q = enrich(clicks.toDF()).select($"page", $"who")
      .writeStream.format("memory").queryName("enr_out").outputMode("append").start()
    try {
      clicks.addData(Click(t(0), 1, "a"), Click(t(1), 9, "b"))
      q.processAllAvailable()
      assert(rowsOf(spark.table("enr_out")) ==
        Set(Seq("a", "alice"), Seq("b", "unknown"))) // miss keeps the fallback
    } finally q.stop()
  }

  test("tumbling window: streaming replay equals batch (Q-T1)") {
    replayEquals(df =>
      Windowed.tumbling("t", col("ts"), "1 hour", Seq(col("event_type")),
        Seq(count(lit(1)).as("cnt")))(df)
        .select(col("window.start").as("w"), col("event_type"), col("cnt")),
      "qt1_stream")
  }

  test("sliding window: streaming replay equals batch (Q-T3)") {
    replayEquals(df =>
      Windowed.sliding("t", col("ts"), "1 hour", "30 minutes", Seq(col("event_type")),
        Seq(count(lit(1)).as("cnt")))(df)
        .select(col("window.start").as("w"), col("event_type"), col("cnt")),
      "qt3_stream")
  }

  test("session window: streaming replay equals batch (Q-T2)") {
    replayEquals(df =>
      Windowed.session("t", col("ts"), "30 minutes", Seq(col("user_id")),
        Seq(count(lit(1)).as("cnt")))(df)
        .select(col("user_id"), col("session_window.start").as("s"), col("cnt")),
      "qt2_stream")
  }

  test("stateless round-6 text ops run unchanged on a stream (normalize + chunk)") {
    // normalizeText / stripHtml / chunkTokenWindows are pure projections +
    // Generate — no state, no watermark needed; a streamed corpus must
    // produce exactly the batch chunks after full replay
    import StreamingSpec.Doc
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val docs = (1 to 40).map(i =>
      Doc(i.toLong, s"<p>word$i</p> " + (1 to 12).map(j => s"t$j").mkString("  ")))
    val stream = MemoryStream[Doc]
    def stage(df: org.apache.spark.sql.DataFrame) =
      graft.llm.TextAnalysis.chunkTokenWindows(
        df.withColumn("text", graft.llm.TextAnalysis.normalizeText(
          graft.llm.TextAnalysis.stripHtml(col("text")))),
        "doc_id", "text", chunkSize = 5, stride = 4)
    val q = stage(stream.toDF()).writeStream
      .format("memory").queryName("r6_stateless").outputMode("append").start()
    try {
      val (a, b) = docs.splitAt(20)
      stream.addData(a)
      q.processAllAvailable()
      stream.addData(b)
      q.processAllAvailable()
      val streamed = rowsOf(spark.table("r6_stateless"))
      val batch = rowsOf(stage(docs.toDF()))
      assert(streamed == batch, "streamed chunks != batch chunks after replay")
      assert(batch.nonEmpty)
    } finally q.stop()
  }

  test("stateless round-7 text ops run unchanged on a stream (gopher + canonical + bpe)") {
    // gopherQualityFlags / canonicalizeUrl / BPE counting are pure
    // projections — the crawl-filter battery applies per-document with no
    // state, so a streamed corpus must score identically to batch
    import StreamingSpec.Doc
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val vocab = graft.functions.BpeVocab(Map(("h", "e") -> 0, ("l", "l") -> 1))
    val docs = (1 to 40).map(i =>
      Doc(i.toLong, s"hello world$i https://WWW.Site$i.com:443/p/ " +
        (1 to 60).map(j => s"w$j").mkString(" ")))
    val stream = MemoryStream[Doc]
    def stage(df: org.apache.spark.sql.DataFrame) = df
      .withColumn("q", graft.llm.TextAnalysis.gopherQualityFlags(col("text")))
      .withColumn("n_bpe", graft.llm.TextAnalysis.tokenCount(col("text"),
        graft.llm.TextAnalysis.BpeTok(vocab)))
      .select(col("doc_id"), col("q.ok_length"), col("q.ok_alpha"), col("n_bpe"),
        graft.llm.TextAnalysis.canonicalizeUrl(
          concat(lit("https://WWW.Host"), col("doc_id").cast("string"),
            lit(".com:443/p/"))).as("curl"))
    val q = stage(stream.toDF()).writeStream
      .format("memory").queryName("r7_stateless").outputMode("append").start()
    try {
      val (a, b) = docs.splitAt(20)
      stream.addData(a)
      q.processAllAvailable()
      stream.addData(b)
      q.processAllAvailable()
      val streamed = rowsOf(spark.table("r7_stateless"))
      val batch = rowsOf(stage(docs.toDF()))
      assert(streamed == batch, "streamed round-7 signals != batch after replay")
      assert(batch.nonEmpty)
    } finally q.stop()
  }

  test("stateless round-8 text ops run unchanged on a stream (pii + c4 + gram stats)") {
    // redactPii / c4CleanLines / c4DocFlags / urlDomain and the fused
    // GopherGramStats expression are pure projections — including the
    // native codegen expression, which must evaluate identically inside
    // a streaming micro-batch projection
    import StreamingSpec.Doc
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val docs = (1 to 40).map(i =>
      Doc(i.toLong, s"Reach user$i@ex$i.org or 10.0.0.$i now.\n" +
        s"hot pair hot pair hot pair end $i https://www.s$i.com/x"))
    val stream = MemoryStream[Doc]
    def stage(df: org.apache.spark.sql.DataFrame) = df
      .withColumn("red", graft.llm.TextAnalysis.redactPii(col("text")))
      .withColumn("cleaned", graft.llm.TextAnalysis.c4CleanLines(col("text")))
      .withColumn("f", graft.llm.TextAnalysis.c4DocFlags(col("text")))
      .withColumn("dom", graft.llm.TextAnalysis.urlDomain(
        concat(lit("https://www.s"), col("doc_id").cast("string"), lit(".com/x"))))
      .withColumn("g", graft.functions.GramStats.gopherGramStats(
        graft.llm.Dedup.tokens(col("text")), Seq(2), Seq(5)))
      .select(col("doc_id"), col("red"), col("cleaned"), col("f.ok_sentences"),
        col("dom"), col("g"))
    val q = stage(stream.toDF()).writeStream
      .format("memory").queryName("r8_stateless").outputMode("append").start()
    try {
      val (a, b) = docs.splitAt(20)
      stream.addData(a)
      q.processAllAvailable()
      stream.addData(b)
      q.processAllAvailable()
      val streamed = rowsOf(spark.table("r8_stateless"))
      val batch = rowsOf(stage(docs.toDF()))
      assert(streamed == batch, "streamed round-8 signals != batch after replay")
      assert(batch.nonEmpty)
    } finally q.stop()
  }

  test("stateless round-10 sketch ops run unchanged on a stream (winnowing + simhash)") {
    // the fused winnowing deque and the one-hash-per-token simhash votes
    // are pure per-row projections — streaming a batch through them in
    // two micro-batches must replay the batch result exactly
    import StreamingSpec.Doc
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val docs = (1 to 40).map(i =>
      Doc(i.toLong, (1 to 12).map(j => s"tok${(i + j) % 7}w$j").mkString(" ")))
    val stream = MemoryStream[Doc]
    def stage(df: org.apache.spark.sql.DataFrame) = df
      .withColumn("fp", array_join(array_sort(
        graft.functions.Winnow.fingerprints(
          graft.llm.Dedup.tokens(col("text")), 3, 4)), ","))
      .withColumn("sig", array_join(
        graft.llm.Dedup.simHashBits(graft.llm.Dedup.tokens(col("text"))), ""))
      .select(col("doc_id"), col("fp"), col("sig"))
    val q = stage(stream.toDF()).writeStream
      .format("memory").queryName("r10_stateless").outputMode("append").start()
    try {
      val (a, b) = docs.splitAt(20)
      stream.addData(a)
      q.processAllAvailable()
      stream.addData(b)
      q.processAllAvailable()
      val streamed = rowsOf(spark.table("r10_stateless"))
      val batch = rowsOf(stage(docs.toDF()))
      assert(streamed == batch, "streamed round-10 sketches != batch after replay")
      assert(batch.nonEmpty)
    } finally q.stop()
  }

  test("stateless round-11 ops run unchanged on a stream (sentences + mixture)") {
    // sentence splitting and the hash-drawn mixture explode are per-row
    // projections (+ a static broadcast rate dim) — streaming must
    // replay the batch result exactly. NB scoring aggregates per doc, so
    // on streams it goes through the foreachBatch bridge like any agg.
    import StreamingSpec.Doc
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val docs = (1 to 40).map(i =>
      Doc(i.toLong, s"Sent one about tok${i % 5}. Sent two tok${i % 3}! tail"))
    val rates = Seq(("en", 2.5)).toDF("grp", "rate").localCheckpoint(true)
    val stream = MemoryStream[Doc]
    def stage(df: org.apache.spark.sql.DataFrame) = {
      val withSents = df
        .withColumn("sents", array_join(
          graft.llm.TextAnalysis.sentences(col("text")), "|"))
        .withColumn("grp", lit("en"))
      graft.llm.Sampling.sampleByRates(withSents, "grp", "doc_id", rates)
        .select(col("doc_id"), col("copy"), col("sents"))
    }
    val q = stage(stream.toDF()).writeStream
      .format("memory").queryName("r11_stateless").outputMode("append").start()
    try {
      val (a, b) = docs.splitAt(20)
      stream.addData(a)
      q.processAllAvailable()
      stream.addData(b)
      q.processAllAvailable()
      val streamed = rowsOf(spark.table("r11_stateless"))
      val batch = rowsOf(stage(docs.toDF()))
      assert(streamed == batch, "streamed round-11 ops != batch after replay")
      assert(batch.nonEmpty)
      // the 2.5 rate really replicated on the stream: 2 or 3 copies per doc
      assert(streamed.size > 2 * docs.size)
    } finally q.stop()
  }

  test("watermark stage is streaming-only passthrough in batch") {
    val events = Tables.load(spark, sf, "events")
    val out = Windowed.watermark("wm", "ts", "10 minutes")(events)
    assert(out.count() == events.count())
  }
}

object StreamingSpec {
  // top-level: MemoryStream encoders cannot reference suite-inner classes —
  // the old suite-inner Ev made every Ev deserializer fail Janino
  // compilation (outer-instance reference) and run INTERPRETED; Instant
  // (not java.sql.Timestamp) keeps the encoder on the java.time fast path
  case class Ev(ts: java.time.Instant, user_id: Long, event_type: String, value: Double)
  case class Doc(doc_id: Long, text: String)
  case class Click(cts: java.sql.Timestamp, ckey: Long, page: String)
  case class View(vts: java.sql.Timestamp, vkey: Long, item: String)
}
