package graft.combinators

import graft.SparkSpec
import graft.core._
import graft.stages.Transform
import org.apache.spark.sql.functions._

/** Round-2 signal parity: every declared signal name must actually be
  * emitted at its matching transition (`signals.go:7-137`). Signals fire at
  * stage-application granularity (the plan is built once for N rows).
  */
class SignalEmissionSpec extends SparkSpec {
  import spark.implicits._

  private def df = Seq((1, "a"), (2, "b"), (3, "c")).toDF("id", "v")

  private def emittedNames(body: => Unit): Set[String] = {
    SignalBus.global.clear()
    body
    SignalBus.global.emitted.map(_.name).toSet
  }

  test("Switch emits routed / no-route") {
    val names = emittedNames {
      Switch("sw", col("v"))("a" -> Transform("ra")("r" -> lit("A")))(df)
      Switch("sw0", col("v"))()(df)
    }
    assert(names.contains(Signals.SwitchRouted))
    assert(names.contains(Signals.SwitchNoRoute))
  }

  test("Filter emits filter.passed") {
    val names = emittedNames {
      Filter("f", col("id") > 1, Transform("up")("v" -> upper(col("v"))))(df)
    }
    assert(names.contains(Signals.FilterPassed))
  }

  private def awaitRowSignals(name: String): Seq[Signal] = {
    // QueryExecutionListener delivery is async to the action
    val deadline = System.currentTimeMillis + 10000
    def sigs = SignalBus.global.emitted(name)
      .filter(_.fields.get("phase").contains("rows"))
    while (System.currentTimeMillis < deadline && sigs.isEmpty) Thread.sleep(100)
    sigs
  }

  test("Filter fast path emits ACTUAL row counts at action time (signals.go:128,200)") {
    graft.runtime.RowSignals.attach(spark)
    SignalBus.global.clear()
    graft.runtime.RowSignals.scoped(SignalBus.global) {
      Filter("frow", col("id") > 1, Transform("up")("v" -> upper(col("v"))))(df)
    }.count()
    val sig = awaitRowSignals(Signals.FilterPassed).head
    assert(sig.stage.name == "frow")
    assert(sig.fields("rows_passed") == "2")
    assert(sig.fields("rows_filtered") == "1")
  }

  test("Filter split-union path emits per-branch row counts") {
    graft.runtime.RowSignals.attach(spark)
    SignalBus.global.clear()
    val opaque = Stage(StageId("opaque"))(d => d.withColumn("w", lit(1)))
    graft.runtime.RowSignals.scoped(SignalBus.global) {
      Filter("fsplit", col("id") > 1, opaque)(df)
    }.count()
    val sigs = awaitRowSignals(Signals.FilterPassed)
    val passed = sigs.find(_.fields.get("detail").contains("passed"))
    val passthrough = sigs.find(_.fields.get("detail").contains("passthrough"))
    assert(passed.exists(_.fields("rows_passed") == "2"))
    assert(passthrough.exists(_.fields("rows_filtered") == "1"))
  }

  test("Switch emits routed / no-route row counts at action time") {
    graft.runtime.RowSignals.attach(spark)
    SignalBus.global.clear()
    graft.runtime.RowSignals.scoped(SignalBus.global) {
      Switch("swrow", col("v"))("a" -> Transform("ra")("r" -> lit("A")))(df)
    }.count()
    val sig = awaitRowSignals(Signals.SwitchRouted).head
    assert(sig.fields("rows_routed") == "1")
    assert(sig.fields("rows_no_route") == "2")
  }

  test("Fallback emits ACTUAL resolved / all-failed row counts at action time") {
    graft.runtime.RowSignals.attach(spark)
    SignalBus.global.clear()
    val d = Seq((Option(1), Option.empty[Int]), (None, Option(2)), (None, None))
      .toDF("a", "b")
    graft.runtime.RowSignals.scoped(SignalBus.global) {
      Fallback("fbrow", "out")(col("a"), col("b"))(d)
    }.count()
    val sig = awaitRowSignals(Signals.FallbackTriggered).head
    assert(sig.stage.name == "fbrow")
    assert(sig.fields("rows_resolved") == "2")
    assert(sig.fields("rows_failed") == "1")
  }

  test("unscoped composition attaches NO observation (no pushdown barrier)") {
    val out = Filter("fplain", col("id") > 1, Transform("up")("v" -> upper(col("v"))))(df)
    val plan = out.queryExecution.analyzed.toString
    assert(!plan.contains("CollectMetrics"), s"plain plan must stay barrier-free:\n$plan")
  }

  test("row signals are scoped per bus: bus A never sees bus B's counts") {
    val busA = new SignalBus(logCapacity = 64)
    val busB = new SignalBus(logCapacity = 64)
    graft.runtime.RowSignals.attach(spark, busA)
    graft.runtime.RowSignals.attach(spark, busB)
    try {
      graft.runtime.RowSignals.scoped(busB) {
        Filter("fb_only", col("id") > 1, Transform("up")("v" -> upper(col("v"))))(df)
      }.count()
      val deadline = System.currentTimeMillis + 10000
      while (System.currentTimeMillis < deadline &&
             !busB.emitted(Signals.FilterPassed).exists(_.fields.get("phase").contains("rows")))
        Thread.sleep(100)
      assert(busB.emitted(Signals.FilterPassed).exists(_.fields("rows_passed") == "2"))
      assert(busA.emitted(Signals.FilterPassed).isEmpty,
        "bus A received counts for a query it never scoped")
    } finally {
      graft.runtime.RowSignals.detach(spark, busA)
      graft.runtime.RowSignals.detach(spark, busB)
    }
  }

  test("detach stops forwarding (per-pipeline bus teardown)") {
    val bus = new SignalBus(logCapacity = 64)
    val control = new SignalBus(logCapacity = 64)
    graft.runtime.RowSignals.attach(spark, bus)
    graft.runtime.RowSignals.attach(spark, control)
    graft.runtime.RowSignals.detach(spark, bus)
    try {
      graft.runtime.RowSignals.scoped(bus) {
        Filter("fdet", col("id") > 1, Transform("up")("v" -> upper(col("v"))))(df)
      }.count()
      // positive control AFTER the detached query: listener events are
      // delivered in order, so once the control bus sees its own query's
      // signal the detached query's events have already been processed —
      // the absence check below cannot false-pass on slow delivery
      graft.runtime.RowSignals.scoped(control) {
        Filter("fctl", col("id") > 1, Transform("up")("v" -> upper(col("v"))))(df)
      }.count()
      val deadline = System.currentTimeMillis + 10000
      def ctlRows = control.emitted(Signals.FilterPassed)
        .exists(_.fields.get("phase").contains("rows"))
      while (System.currentTimeMillis < deadline && !ctlRows) Thread.sleep(100)
      assert(ctlRows, "control bus never received its signal — delivery stalled")
      assert(bus.emitted(Signals.FilterPassed).forall(!_.fields.get("phase").contains("rows")))
    } finally graft.runtime.RowSignals.detach(spark, control)
  }

  test("Fallback emits fallback.triggered when alternatives exist") {
    val names = emittedNames {
      Fallback("fb", "out")(when(col("id") > 1, col("v")), lit("dflt"))(df)
    }
    assert(names.contains(Signals.FallbackTriggered))
  }

  test("Sequence emits sequence.failed when a stage throws") {
    val boom = Stage(StageId("boom"))(_ => throw new RuntimeException("kaboom"))
    val names = emittedNames {
      intercept[RuntimeException](Sequence("seq")(boom)(df))
    }
    assert(names.contains(Signals.SequenceFailed))
  }

  test("Race emits race.lost for cancelled stragglers") {
    val fast = Stage(StageId("fast"))(d => d)
    val slow = Stage(StageId("slow"))(d => { Thread.sleep(2000); d })
    val names = emittedNames {
      Race("race2")(fast, slow).run(df)
    }
    assert(names.contains(Signals.RaceWinner))
    assert(names.contains(Signals.RaceLost))
  }

  test("Contest emits contest.no_winner when nothing qualifies") {
    val b = Stage(StageId("b"))(d => d)
    val names = emittedNames {
      intercept[RuntimeException](Contest("c", _ => false)(b).run(df))
    }
    assert(names.contains(Signals.ContestNoWinner))
  }

  test("WorkerPool emits workerpool.saturated when branches exceed workers") {
    val b1 = Stage(StageId("b1"))(d => d)
    val b2 = Stage(StageId("b2"))(d => d)
    val b3 = Stage(StageId("b3"))(d => d)
    val wp = WorkerPool("wp", workers = 2)(b1, b2, b3)
    val names = emittedNames { wp.run(df, _.count(): Unit) }
    assert(names.contains(Signals.WorkerPoolSaturated))
    wp.close() // releases the tracked shared persist
  }

  test("SignalBus ring drops oldest beyond capacity (no unbounded growth)") {
    val bus = new SignalBus(logCapacity = 8)
    (1 to 20).foreach(i => bus.emit(s"sig$i", StageId("s")))
    val names = bus.emitted.map(_.name)
    assert(names.size == 8)
    assert(names.head == "sig13" && names.last == "sig20")
  }

  test("signals carry the reference's documented severities (5.hooks.md:37-40)") {
    assert(Signals.severityOf(Signals.BreakerOpened) == Signal.Error)
    assert(Signals.severityOf(Signals.BreakerRejected) == Signal.Error)
    assert(Signals.severityOf(Signals.RateLimitDrop) == Signal.Error)
    assert(Signals.severityOf(Signals.RetryExhausted) == Signal.Error)
    assert(Signals.severityOf(Signals.TimeoutExceeded) == Signal.Error)
    assert(Signals.severityOf(Signals.BreakerHalfOpen) == Signal.Warn)
    assert(Signals.severityOf(Signals.RateLimitWait) == Signal.Warn)
    assert(Signals.severityOf(Signals.WorkerPoolSaturated) == Signal.Warn)
    assert(Signals.severityOf(Signals.FallbackTriggered) == Signal.Warn)
    assert(Signals.severityOf(Signals.BackoffWaiting) == Signal.Warn)
    assert(Signals.severityOf(Signals.BreakerClosed) == Signal.Info)
    assert(Signals.severityOf(Signals.PipelineCompleted) == Signal.Info)
    // a live emission carries its default severity end-to-end
    val bus = new SignalBus(logCapacity = 8)
    bus.emit(Signals.BreakerOpened, StageId("cb"))
    assert(bus.emitted.head.severity == Signal.Error)
    // and the ladder is ordered for thresholding
    assert(Signal.Error > Signal.Warn && Signal.Warn > Signal.Info &&
      Signal.Info > Signal.Debug)
  }

  test("direct Signal(...) construction derives its severity from the name at emit") {
    // the Dedup.jaccard.df_cut / RowSignals-forwarding shape: no explicit
    // severity — the bus must attach the documented one, not default-Info
    val bus = new SignalBus(logCapacity = 8)
    bus.emit(Signal(Signals.JaccardDfCut, StageId("j"), Map("cut" -> "3")))
    bus.emit(Signal(Signals.FallbackTriggered, StageId("f")))
    bus.emit(Signal(Signals.PipelineCompleted, StageId("p")))
    assert(bus.emitted.map(_.severity) == Seq(Signal.Warn, Signal.Warn, Signal.Info))
    // an explicit severity is never overridden
    bus.emit(Signal("custom.event", StageId("c"), severity = Signal.Error))
    assert(bus.emitted.last.severity == Signal.Error)
  }

  test("severityOrDefault never NPEs for signals constructed outside the bus") {
    // the r16 ADVICE hole: Signal(...) defaults severity to null, so any
    // comparison on a signal that never passed through emit NPE'd.
    // severityOrDefault is the non-null read every engine comparison
    // (including the thresholded subscribe) routes through.
    assert(Signal(Signals.JaccardDfCut, StageId("j")).severityOrDefault == Signal.Warn)
    assert(Signal("custom.unknown", StageId("c")).severityOrDefault == Signal.Info)
    // a null smuggled via copy still resolves to the documented level
    val smuggled = Signal(Signals.BreakerOpened, StageId("b")).copy(severity = null)
    assert(smuggled.severityOrDefault == Signal.Error)
    // and a thresholded listener fed such a signal filters without NPE
    val bus = new SignalBus(logCapacity = 4)
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    bus.subscribe(Signal.Warn)(sig => seen.add(sig.name))
    bus.emit(smuggled)
    assert(seen.toArray.toSeq == Seq(Signals.BreakerOpened))
  }

  test("severity-thresholded subscribe filters below-min signals (e.Severity() analog)") {
    val bus = new SignalBus(logCapacity = 16)
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    bus.subscribe(Signal.Warn)(sig => seen.add(sig.name))
    bus.emit(Signals.PipelineCompleted, StageId("p")) // Info — filtered
    bus.emit(Signals.RateLimitWait, StageId("p")) // Warn — passes
    bus.emit(Signals.BreakerOpened, StageId("p")) // Error — passes
    assert(seen.toArray.toSeq == Seq(Signals.RateLimitWait, Signals.BreakerOpened))
  }

  test("async bus: a slow subscriber never stalls the emitting thread (5.hooks.md:31)") {
    val bus = new SignalBus(logCapacity = 64, async = true)
    val delivered = new java.util.concurrent.atomic.AtomicInteger()
    bus.subscribe { _ => Thread.sleep(50); delivered.incrementAndGet(): Unit }
    val t0 = System.nanoTime()
    (1 to 20).foreach(i => bus.emit(s"async$i", StageId("s")))
    val emitMs = (System.nanoTime() - t0) / 1e6
    // 20 emits × 50ms listener = 1s synchronous; async must return ~instantly
    assert(emitMs < 250, s"emit must not block on the subscriber (took $emitMs ms)")
    // the ring records synchronously regardless of dispatch
    assert(bus.emitted.size == 20)
    bus.drain()
    assert(delivered.get() == 20, "drain must wait for every delivery")
    assert(bus.droppedSignals == 0)
  }

  test("async bus preserves emission order and severities through the dispatcher") {
    val bus = new SignalBus(async = true)
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[(String, Signal.Severity)]()
    bus.subscribe(sig => seen.add((sig.name, sig.severity)))
    bus.emit(Signals.PipelineStarted, StageId("p"))
    bus.emit(Signals.RetryExhausted, StageId("p"))
    bus.emit(Signals.PipelineCompleted, StageId("p"))
    bus.drain()
    assert(seen.toArray.toSeq == Seq(
      (Signals.PipelineStarted, Signal.Info),
      (Signals.RetryExhausted, Signal.Error),
      (Signals.PipelineCompleted, Signal.Info)))
  }
}
