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
