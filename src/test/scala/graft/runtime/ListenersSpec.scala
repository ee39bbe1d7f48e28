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
    } finally spark.listenerManager.unregister(l)
  }
}
