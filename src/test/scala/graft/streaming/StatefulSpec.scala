package graft.streaming

import graft.SparkSpec
import graft.sources.Tables
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class StatefulSpec extends SparkSpec {
  import spark.implicits._

  test("mapGroupsWithState accumulates per-key state across micro-batches") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[(Long, String)]
    val counts = Stateful.runningCounts[(Long, String)](stream.toDS(), _._1)
      .toDF("user_id", "n")
    val q = counts.writeStream.format("memory").queryName("stateful_counts")
      .outputMode("update").start()
    try {
      stream.addData((1L, "a"), (1L, "b"), (2L, "c"))
      q.processAllAvailable()
      stream.addData((1L, "d"), (3L, "e"))
      q.processAllAvailable()
      // update mode emits one row per key per batch; the LAST emission per
      // key carries the accumulated state
      val last = spark.table("stateful_counts")
        .groupBy("user_id").agg(max("n").as("n"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(last == Map(1L -> 3L, 2L -> 1L, 3L -> 1L))
    } finally q.stop()
  }

  test("transformWithState firstSeen dedups across micro-batches") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val prevProvider = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val stream = MemoryStream[(Long, String)]
    val deduped = Stateful.firstSeen[Long, (Long, String)](stream.toDS(), _._1)
      .toDF("k", "v")
    val q = deduped.writeStream.format("memory").queryName("first_seen")
      .outputMode("update").start()
    try {
      stream.addData((1L, "a"), (1L, "dup-in-batch"), (2L, "b"))
      q.processAllAvailable()
      stream.addData((1L, "dup-across-batch"), (3L, "c"))
      q.processAllAvailable()
      val rows = spark.table("first_seen")
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(rows == Map(1L -> "a", 2L -> "b", 3L -> "c"))
    } finally {
      q.stop()
      prevProvider match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None    => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("firstSeen over a ts-ordered replay equals firstSeenBatch (the Q-T5 batch-parity contract)") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    withRocksDb {
      val ev = Tables.load(spark, sf, "events")
        .select($"user_id", $"event_type", $"ts_ns", $"event_id", $"value")
      // the batch form's explicit order IS the replay's arrival order
      val sorted = ev.orderBy($"ts_ns", $"event_id")
        .as[(Long, String, Long, Long, Double)].collect().toSeq
      val stream = MemoryStream[(Long, String, Long, Long, Double)]
      val deduped = Stateful.firstSeen[(Long, String), (Long, String, Long, Long, Double)](
        stream.toDS().coalesce(1), v => (v._1, v._2))
        .toDF("user_id", "event_type", "ts_ns", "event_id", "value")
      val q = deduped.writeStream.format("memory").queryName("qt5_parity")
        .outputMode("update").start()
      try {
        // several micro-batches: cross-batch keys must stay deduped
        sorted.grouped(400).foreach { chunk =>
          stream.addData(chunk)
          q.processAllAvailable()
        }
        val streaming = spark.table("qt5_parity")
          .collect().map(_.toSeq).toSet
        val batch = Stateful.firstSeenBatch(ev,
          Seq("user_id", "event_type"), Seq("ts_ns", "event_id"), Seq("value"))
          .collect().map(_.toSeq).toSet
        assert(streaming == batch)
      } finally q.stop()
    }
  }

  private def withRocksDb(body: => Unit): Unit = {
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try body
    finally prev match {
      case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
      case None    => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("streaming MinHash sketch over chunked docs equals the batch signature") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    withRocksDb {
      val stream = MemoryStream[(Long, Seq[String])]
      val sigs = Stateful.minHashSketchStream(stream.toDS(), numHashes = 16)
        .toDF("doc_id", "sig")
      val got = scala.collection.concurrent.TrieMap.empty[Long, Seq[Long]]
      // update mode re-emits per trigger; the LAST emission per doc wins
      val q = sigs.writeStream.outputMode("update")
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          batch.collect().foreach(r => got(r.getLong(0)) = r.getSeq[Long](1))
        }.start()
      try {
        stream.addData((1L, Seq("a", "b")), (2L, Seq("x")))
        q.processAllAvailable()
        stream.addData((1L, Seq("c")), (2L, Seq("y", "z")))
        q.processAllAvailable()
      } finally q.stop()
      val want = Seq((1L, "a b c"), (2L, "x y z")).toDF("doc_id", "text")
        .select(col("doc_id"), graft.llm.Dedup.minHash(
          graft.llm.Dedup.tokens(col("text")), 16).as("sig"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      assert(got.toMap == want,
        "chunk-accumulated streaming signature must be bit-identical to batch")
    }
  }

  test("streamed LSH candidate pairs equal batch minHashLshCandidates after replay") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    withRocksDb {
      val docs = Tables.load(spark, sf, "documents")
        .select(col("doc_id"), col("text")).as[(Long, String)].collect().toSeq
      val (b1, b2) = docs.splitAt(docs.length / 2)
      val stream = MemoryStream[(Long, String)]
      val pairs = Stateful.minHashLshCandidatePairsStream(stream.toDS())
        .toDF("doc_a", "doc_b")
      val got = java.util.concurrent.ConcurrentHashMap.newKeySet[(Long, Long)]()
      val q = pairs.writeStream.outputMode("update")
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          batch.collect().foreach(r => got.add((r.getLong(0), r.getLong(1))))
        }.start()
      try {
        stream.addData(b1: _*)
        q.processAllAvailable()
        stream.addData(b2: _*)
        q.processAllAvailable()
      } finally q.stop()
      val want = graft.llm.Dedup.minHashLshCandidates(
        docs.toDF("doc_id", "text"), "doc_id", "text")
        .select("doc_a", "doc_b")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      import scala.jdk.CollectionConverters._
      assert(got.asScala.toSet == want,
        s"streamed ${got.size} pairs != batch ${want.size}")
      assert(want.nonEmpty, "fixture should produce candidate pairs")
    }
  }

  test("streaming perceptual near-dup pairs equal the batch operator after replay") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    withRocksDb {
      // 120 independent pseudo-random hashes + planted re-encodes: every
      // 3rd id gets a copy with ONE bit flipped (Hamming 1 — a band must
      // collide by pigeonhole at bands=4, maxHamming=3)
      val base = (1 to 120).map(i => (i.toLong, new scala.util.Random(i).nextLong()))
      val flips = base.filter(_._1 % 3 == 0)
        .map { case (id, h) => (id + 10000L, h ^ (1L << (id % 64).toInt)) }
      // id 7 RE-DELIVERED with a different hash (a near-copy of id 60's):
      // batch bands both rows of the id, so the stream must score the
      // re-delivery too — keying idempotency on id alone lost this pair
      val redelivered = Seq((7L, base(59)._2 ^ 1L))
      val rows = base ++ flips ++ redelivered
      val (b1, b2) = (base ++ flips).splitAt(rows.length / 2)
      val stream = MemoryStream[(Long, Long)]
      val pairs = Stateful.perceptualNearDupPairsStream(stream.toDS())
        .toDF("doc_a", "doc_b", "hamming")
      val got = java.util.concurrent.ConcurrentHashMap.newKeySet[(Long, Long, Int)]()
      val q = pairs.writeStream.outputMode("update")
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          batch.collect().foreach(r => got.add((r.getLong(0), r.getLong(1), r.getInt(2))))
        }.start()
      try {
        stream.addData(b1: _*)
        q.processAllAvailable()
        stream.addData(b2: _*)
        q.processAllAvailable()
        stream.addData(redelivered: _*)
        q.processAllAvailable()
      } finally q.stop()
      val want = graft.sources.Multimodal.perceptualNearDupPairs(
        rows.toDF("id", "h"), "id", "h", bands = 4, maxHamming = 3)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      import scala.jdk.CollectionConverters._
      assert(got.asScala.toSet == want,
        s"streamed ${got.size} pairs != batch ${want.size}")
      // every planted flip found (organic collisions, if any, are in both)
      assert(want.size >= flips.size, s"only ${want.size} pairs for ${flips.size} plants")
      // the re-delivered hash really paired across ids
      assert(want.contains((7L, 60L, 1)), s"re-delivery pair missing from $want")
    }
  }

  test("dropDuplicatesWithinWatermark removes dups arriving inside the delay") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[(java.sql.Timestamp, Long)]
    val deduped = Stateful.dedupWithinWatermark(
      stream.toDS().toDF("ts", "doc_id"), "ts", "10 minutes", Seq("doc_id"))
    val q = deduped.writeStream.format("memory").queryName("wm_dedup")
      .outputMode("append").start()
    def ts(min: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")
    try {
      stream.addData((ts(0), 7L), (ts(1), 7L), (ts(2), 8L))
      q.processAllAvailable()
      stream.addData((ts(3), 7L), (ts(4), 9L)) // dup of 7 within watermark
      q.processAllAvailable()
      val ids = spark.table("wm_dedup").select("doc_id").as[Long].collect().sorted.toSeq
      assert(ids == Seq(7L, 8L, 9L))
    } finally q.stop()
  }

  test("approx_count_distinct lands within 5% of exact (Q-A2 bench contract)") {
    val orders = Tables.load(spark, sf, "orders")
    val exact = orders.agg(countDistinct(col("o_custkey"))).head().getLong(0)
    val approx = orders.agg(approx_count_distinct(col("o_custkey"))).head().getLong(0)
    assert(math.abs(approx - exact).toDouble / exact < 0.05,
      s"approx=$approx exact=$exact")
  }

  test("guardedForeachBatch runs micro-batches under a circuit breaker") {
    import graft.combinators.CircuitBreaker
    import scala.concurrent.duration._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val breaker = CircuitBreaker("stream_cb", failureThreshold = 3, resetTimeout = 1.minute)
    val seen = new java.util.concurrent.atomic.AtomicLong(0)
    val stream = MemoryStream[Long]
    val writer = StreamRunner.guardedForeachBatch(
      stream.toDS().toDF().writeStream, body => breaker.run(body)) { (batch, _) =>
      seen.addAndGet(batch.count())
    }
    val q = writer.start()
    try {
      stream.addData(1L, 2L, 3L)
      q.processAllAvailable()
      assert(seen.get() == 3)
      assert(breaker.state == CircuitBreaker.Closed)
    } finally q.stop()
  }
}
