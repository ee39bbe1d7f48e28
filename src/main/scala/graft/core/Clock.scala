package graft.core

/** Injectable clock so time-dependent combinators (Backoff, Timeout,
  * RateLimiter, CircuitBreaker) are testable without sleeping — the engine's
  * `clockz` analog (reference wires a fake clock at `backoff.go:200-213`,
  * `timeout.go:194-207`, `ratelimiter.go:358-364`, `circuitbreaker.go:360-365`).
  */
trait Clock {
  def nanoTime(): Long
  def sleep(millis: Long): Unit
  final def milliTime(): Long = nanoTime() / 1000000L
}

object Clock {
  object System extends Clock {
    def nanoTime(): Long = java.lang.System.nanoTime()
    def sleep(millis: Long): Unit = if (millis > 0) Thread.sleep(millis)
  }

  /** Deterministic manual clock for tests: `sleep` advances time instantly. */
  final class Fake(start: Long = 0L) extends Clock {
    private var now = start
    def nanoTime(): Long = synchronized(now)
    def sleep(millis: Long): Unit = advanceMillis(millis)
    def advanceMillis(millis: Long): Unit =
      synchronized { now += millis * 1000000L }
    val slept = scala.collection.mutable.ArrayBuffer.empty[Long]
  }

  final class Recording(underlying: Clock = System) extends Clock {
    val slept = scala.collection.mutable.ArrayBuffer.empty[Long]
    def nanoTime(): Long = underlying.nanoTime()
    def sleep(millis: Long): Unit = synchronized { slept += millis }
  }
}
