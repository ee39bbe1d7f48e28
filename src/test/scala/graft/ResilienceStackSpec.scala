package graft

import graft.combinators._
import graft.core._
import graft.runtime.Pipeline
import graft.stages._
import graft.testkit.ChaosStage
import org.apache.spark.sql.functions._
import scala.concurrent.duration._

/** Layered resilience integration — the reference's wrapping-stack pattern
  * (`api.go:319-333`, `testing/integration/resilience_patterns_test.go`):
  * breaker(retry(backoff(timeout(sequence)))) around a chaotic stage must
  * return the clean result once faults clear, and trip cleanly when they
  * don't.
  */
class ResilienceStackSpec extends SparkSpec {
  import spark.implicits._

  private def base = (1 to 100).map(i => (i, i * 2.0)).toDF("id", "x")

  private def cleanStage = Sequence("seq")(
    Where("pos", col("x") > 0),
    Transform("t")("y" -> (col("x") * 10)),
    Project("p")(col("id"), col("y"))
  )

  test("full stack: breaker(backoff(timeout(sequence))) over transient chaos recovers") {
    val chaos = ChaosStage.transient("chaos", cleanStage, failFirstN = 2)
    val clock = new Clock.Fake
    val breaker = CircuitBreaker("cb", failureThreshold = 5, resetTimeout = 1.minute, clock = clock)
    val backoff = Backoff(StageId("bo"), maxAttempts = 4, baseDelay = 10.millis, clock = clock)
    val timeout = Timeout("to", 60.seconds)

    val out = breaker.run(backoff.run(timeout.run(spark)(chaos(base))))
    assert(rowsOf(out) == rowsOf(cleanStage(base))) // wrapped success is transparent
    assert(chaos.callCount == 3) // 2 faults + 1 success
    assert(breaker.state == CircuitBreaker.Closed)
  }

  test("full stack: persistent faults exhaust retries and count on the breaker") {
    val clock = new Clock.Fake
    val breaker = CircuitBreaker("cb", failureThreshold = 2, resetTimeout = 1.minute, clock = clock)
    def attempt(): Unit = intercept[RuntimeException] {
      breaker.run(Backoff(StageId("bo"), 2, 1.millis, clock).run {
        ChaosStage.transient("always", cleanStage, failFirstN = 99)(base)
      })
    }
    attempt(); attempt()
    assert(breaker.state == CircuitBreaker.Open) // 2 exhausted stacks -> open
    val rejected = intercept[RuntimeException](breaker.run(1))
    assert(rejected.getMessage.contains("open"))
  }

  test("row-tier retry: dead letters replayed and recovered rows unioned back") {
    // transient per-row fault: the first application dead-letters id=2,
    // subsequent applications pass it - the replay must recover the row
    val attempts = new java.util.concurrent.atomic.AtomicInteger(0)
    val flaky = Stage(StageId("flaky")) { df =>
      if (attempts.incrementAndGet() == 1)
        ErrorChannel.markWhere(df, StageId("flaky"), col("id") === 2, lit("transient"))
      else ErrorChannel.ensure(df)
    }
    val df = Seq((1, 5), (2, 6), (3, 7)).toDF("id", "v")
    val once = Retry.recoverDeadLetters(flaky, df, maxAttempts = 1)
    assert(ErrorChannel.dead(once).count() == 1)
    attempts.set(0)
    val recovered = Retry.recoverDeadLetters(flaky, df, maxAttempts = 2)
    assert(ErrorChannel.dead(recovered).count() == 0)
    assert(ErrorChannel.good(recovered).count() == 3)
  }

  test("pipeline + stack end-to-end with signals") {
    SignalBus.global.clear()
    val p = Pipeline("stack", cleanStage)
    val n = p.run(spark)(p.plan(base).count())
    assert(n == 100)
    val names = SignalBus.global.emitted.map(_.name).toSet
    assert(names.contains(Signals.PipelineStarted) && names.contains(Signals.PipelineCompleted))
  }
}
