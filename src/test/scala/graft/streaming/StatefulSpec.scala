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
