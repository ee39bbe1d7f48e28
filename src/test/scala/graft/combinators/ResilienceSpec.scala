package graft.combinators

import graft.SparkSpec
import graft.core._
import scala.concurrent.duration._

class ResilienceSpec extends SparkSpec {

  test("Retry succeeds after transient failures, counts attempts") {
    var calls = 0
    val out = Retry("r", 3).run { calls += 1; if (calls < 3) throw new RuntimeException("boom"); 42 }
    assert(out == 42 && calls == 3)
  }

  test("Retry exhaustion raises with the last cause (retry.go:119-142)") {
    var calls = 0
    val e = intercept[RuntimeException] {
      Retry("r", 2).run { calls += 1; throw new RuntimeException(s"fail-$calls") }
    }
    assert(calls == 2)
    assert(e.getMessage.contains("exhausted 2 attempts"))
    assert(e.getCause.getMessage == "fail-2")
  }

  test("Backoff doubles delays and skips the sleep after the final attempt") {
    val clock = new Clock.Recording
    var calls = 0
    intercept[RuntimeException] {
      Backoff(StageId("b"), 4, 100.millis, clock).run {
        calls += 1; throw new RuntimeException("always")
      }
    }
    assert(calls == 4)
    assert(clock.slept.toSeq == Seq(100L, 200L, 400L)) // no sleep after last (backoff.go:83)
  }

  test("Backoff returns on first success with no sleeping") {
    val clock = new Clock.Recording
    assert(Backoff(StageId("b"), 3, 100.millis, clock).run(7) == 7)
    assert(clock.slept.isEmpty)
  }

  test("Timeout passes fast bodies through unchanged (timeout.go:128-130)") {
    assert(Timeout("t", 30.seconds).run(spark)(123) == 123)
  }

  test("Timeout cancels and raises on deadline (Error{Timeout:true} analog)") {
    val e = intercept[java.util.concurrent.TimeoutException] {
      Timeout("t", 200.millis).run(spark) { Thread.sleep(5000); 1 }
    }
    assert(e.getMessage.contains("deadline"))
  }

  test("RateLimiter drop mode errors when tokens run out (ratelimiter.go:243-261)") {
    val clock = new Clock.Fake
    val rl = RateLimiter("rl", ratePerSec = 1, burst = 2, RateLimiter.Drop, clock)
    rl.acquire(); rl.acquire()
    val e = intercept[RuntimeException](rl.acquire())
    assert(e.getMessage.contains("rate limit exceeded"))
    clock.advanceMillis(1000) // refill 1 token (ratelimiter.go:117-130)
    rl.acquire()
  }

  test("RateLimiter wait mode blocks for refill via the clock") {
    val clock = new Clock.Fake
    val rl = RateLimiter("rl", ratePerSec = 10, burst = 1, RateLimiter.Wait, clock)
    rl.acquire()
    rl.acquire() // must wait ~100ms on the fake clock, then proceed
    assert(rl.availableTokens < 1.0)
  }

  test("RateLimiter wait mode never grants a permit without a full token") {
    // an under-delivering refill (clock jitter analog) must loop, not clamp:
    // N acquires on an empty bucket advance the fake clock by >= N/rate
    val clock = new Clock.Fake
    val rl = RateLimiter("rl2", ratePerSec = 10, burst = 1, RateLimiter.Wait, clock)
    val t0 = clock.milliTime()
    (1 to 5).foreach(_ => rl.acquire())
    // 5 permits at 10/sec from a 1-token bucket: >= 400ms of waiting
    assert(clock.milliTime() - t0 >= 400)
    assert(rl.availableTokens < 1.0)
  }

  test("RateLimiter.setRate retunes a live limiter; elapsed time is priced at the OLD rate (ratelimiter.go:275-284)") {
    val clock = new Clock.Fake
    val rl = RateLimiter("rl_sr", ratePerSec = 1, burst = 1, RateLimiter.Drop, clock)
    rl.acquire() // bucket empty
    clock.advanceMillis(500) // 0.5 tokens accrued at the old 1/sec
    rl.setRate(10) // refills BEFORE the change — still only ~0.5 tokens
    intercept[RuntimeException](rl.acquire())
    clock.advanceMillis(100) // +1.0 token at the NEW 10/sec
    rl.acquire()
  }

  test("RateLimiter.setBurst caps accumulated tokens and chains (ratelimiter.go:286-297, 455)") {
    val clock = new Clock.Fake
    val rl = RateLimiter("rl_sb", ratePerSec = 1, burst = 10, RateLimiter.Drop, clock)
    assert(rl.availableTokens == 10.0) // starts full
    rl.setBurst(3) // shrink caps the bucket immediately
    assert(rl.availableTokens <= 3.0)
    rl.acquire(); rl.acquire(); rl.acquire()
    intercept[RuntimeException](rl.acquire())
    // the reference's chaining style: SetRate(20).SetBurst(5).SetMode("drop")
    assert(rl.setRate(20).setBurst(5).setMode(RateLimiter.Wait).mode == RateLimiter.Wait)
    // and the retuned limiter waits (advancing the fake clock) instead of
    // dropping now
    rl.acquire()
  }

  test("a parked waiter does not starve the runtime knobs (sleep is outside the monitor)") {
    import java.util.concurrent.{CountDownLatch, TimeUnit}
    val entered = new CountDownLatch(1)
    val release = new CountDownLatch(1)
    val clock = new Clock {
      def nanoTime(): Long = java.lang.System.nanoTime()
      def sleep(millis: Long): Unit = {
        entered.countDown()
        release.await(10, TimeUnit.SECONDS); ()
      }
    }
    val rl = RateLimiter("rl_park", ratePerSec = 0.001, burst = 1, RateLimiter.Wait, clock)
    rl.acquire() // empty the bucket; the next acquire must park
    val dropped = new java.util.concurrent.atomic.AtomicBoolean(false)
    val waiter = new Thread(() =>
      try rl.acquire() catch { case _: RuntimeException => dropped.set(true) })
    waiter.start()
    assert(entered.await(10, TimeUnit.SECONDS), "waiter never reached the sleep")
    // the retune MUST complete while the waiter is parked — if acquire
    // slept inside the monitor this would block (old behavior) and the
    // waiter would finish at the old price first
    rl.setMode(RateLimiter.Drop)
    release.countDown()
    waiter.join(10000)
    assert(!waiter.isAlive, "waiter must terminate")
    assert(dropped.get,
      "the parked waiter must re-check under the NEW mode and drop")
  }

  test("RateLimiter.setMode switches wait/drop on a live limiter (ratelimiter.go:299-305)") {
    val clock = new Clock.Fake
    val rl = RateLimiter("rl_sm", ratePerSec = 1, burst = 1, RateLimiter.Wait, clock)
    rl.acquire()
    rl.setMode(RateLimiter.Drop)
    intercept[RuntimeException](rl.acquire()) // would have blocked in wait mode
    clock.advanceMillis(1000)
    rl.acquire()
  }

  test("Timeout.runOrDeadLetters flags timed-out input as timeout dead letters") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val df = Seq((1, "a"), (2, "b")).toDF("id", "v")
    val out = Timeout("slowjob", 200.millis).runOrDeadLetters(df) { d =>
      // stall inside the task so the deadline fires during the action
      d.as[(Int, String)].mapPartitions { it => Thread.sleep(5000); it }.toDF("id", "v")
    }
    assert(ErrorChannel.dead(out).count() == 2)
    assert(out.filter(ErrorChannel.isTimeout).count() == 2)
    assert(out.filter(ErrorChannel.isCanceled).count() == 0)
    // fast bodies pass through untouched
    val ok = Timeout("fastjob", 30.seconds).runOrDeadLetters(df)(d => d)
    assert(ErrorChannel.dead(ok).count() == 0)
    assert(ok.count() == 2)
  }

  test("Handle.runThenRaise runs the handler then re-raises (handle.go:96,117)") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val df = Seq((1, "ok"), (2, ""), (3, "ok")).toDF("id", "v")
    val failing = graft.stages.Apply("nonempty",
      errWhen = col("v") === "", msg = "empty v")("u" -> upper(col("v")))
    val handler = graft.stages.Project("keep")(col("id"))
    var handledRows = -1L
    val h = Handle("h", failing, handler)
    val e = intercept[RuntimeException] {
      h.runThenRaise(df, d => handledRows = d.count())
    }
    assert(e.getMessage.contains("empty v")) // original error re-raised
    assert(handledRows == 1L)                // handler ran first
    // clean inputs come back healthy, no raise
    val clean = Seq((1, "ok")).toDF("id", "v")
    assert(h.runThenRaise(clean, _ => ()).count() == 1)
  }

  test("CircuitBreaker FSM: opens after threshold, half-opens after reset, closes on success") {
    val clock = new Clock.Fake
    val cb = CircuitBreaker("cb", failureThreshold = 2, resetTimeout = 1.second,
      successThreshold = 1, clock = clock)
    def fail(): Unit = intercept[RuntimeException](cb.run(throw new RuntimeException("x")))
    assert(cb.state == CircuitBreaker.Closed)
    fail(); fail() // consecutive failures hit the threshold (circuitbreaker.go:250-265)
    assert(cb.state == CircuitBreaker.Open)
    val rejected = intercept[RuntimeException](cb.run(1))
    assert(rejected.getMessage.contains("open")) // fail-fast (circuitbreaker.go:164-181)
    clock.advanceMillis(1100)
    assert(cb.state == CircuitBreaker.HalfOpen) // probe window (circuitbreaker.go:143-157)
    assert(cb.run(99) == 99)
    assert(cb.state == CircuitBreaker.Closed) // closes after successThreshold
  }

  test("CircuitBreaker half-open failure re-opens") {
    val clock = new Clock.Fake
    val cb = CircuitBreaker("cb", 1, 1.second, clock = clock)
    intercept[RuntimeException](cb.run(throw new RuntimeException("x")))
    assert(cb.state == CircuitBreaker.Open)
    clock.advanceMillis(1500)
    assert(cb.state == CircuitBreaker.HalfOpen)
    intercept[RuntimeException](cb.run(throw new RuntimeException("y")))
    assert(cb.state == CircuitBreaker.Open)
  }

  test("breaker closed-state success resets the failure count") {
    val cb = CircuitBreaker("cb", 2, 1.second, clock = new Clock.Fake)
    intercept[RuntimeException](cb.run(throw new RuntimeException("x")))
    assert(cb.run(1) == 1) // resets consecutive-failure count
    intercept[RuntimeException](cb.run(throw new RuntimeException("x")))
    assert(cb.state == CircuitBreaker.Closed) // 1 < threshold again
  }
}
