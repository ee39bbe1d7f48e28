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
