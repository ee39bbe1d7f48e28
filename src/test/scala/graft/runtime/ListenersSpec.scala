package graft.runtime

import graft.SparkSpec
import graft.core.SignalBus
import org.apache.spark.sql.functions._

class ListenersSpec extends SparkSpec {
  import spark.implicits._

  test("query completions surface on the SignalBus with durations") {
    val bus = new SignalBus
    val l = Listeners.attach(spark, bus)
    try {
      Seq(1, 2, 3).toDF("x").agg(sum("x")).collect()
      // QueryExecutionListener events are delivered asynchronously
      var tries = 0
      while (bus.emitted(Listeners.QueryCompleted).isEmpty && tries < 50) {
        Thread.sleep(100); tries += 1
      }
      val sigs = bus.emitted(Listeners.QueryCompleted)
      assert(sigs.nonEmpty)
      assert(sigs.head.fields("durationNs").toLong > 0)
      assert(sigs.head.severity == graft.core.Signal.Info)
    } finally spark.listenerManager.unregister(l)
  }

  test("failed queries surface as Error-severity signals") {
    val bus = new SignalBus
    val l = Listeners.attach(spark, bus)
    try {
      intercept[Throwable] {
        Seq("1", "boom").toDF("x")
          .select(expr("raise_error(x)")).collect()
      }
      var tries = 0
      while (bus.emitted(Listeners.QueryFailed).isEmpty && tries < 50) {
        Thread.sleep(100); tries += 1
      }
      val sigs = bus.emitted(Listeners.QueryFailed)
      assert(sigs.nonEmpty, "onFailure must emit query.failed")
      assert(sigs.head.severity == graft.core.Signal.Error)
      assert(sigs.head.fields("error").nonEmpty)
    } finally spark.listenerManager.unregister(l)
  }

  test("completed queries carry shuffle and output-row metrics") {
    val bus = new SignalBus
    val l = Listeners.attach(spark, bus)
    try {
      // groupBy forces a shuffle, so shuffle records must be nonzero
      (1 to 1000).toDF("x").groupBy(col("x") % 7).count().collect()
      var tries = 0
      def sig = bus.emitted(Listeners.QueryCompleted)
        .find(_.fields.get("shuffleRecordsWritten").exists(_.toLong > 0))
      while (sig.isEmpty && tries < 50) { Thread.sleep(100); tries += 1 }
      val s = sig.getOrElse(fail("no completion signal with shuffle metrics"))
      assert(s.fields("shuffleBytesWritten").toLong > 0)
      assert(s.fields("outputRows").toLong > 0)
    } finally spark.listenerManager.unregister(l)
  }
}
