package graft.core

import java.util.concurrent.CopyOnWriteArrayList
import scala.jdk.CollectionConverters._

/** Typed observability events at state transitions — the engine's analog of
  * the reference's 18 capitan signals (`signals.go:7-137`). Same event names
  * so a user of the reference finds the hooks they expect.
  *
  * Every event carries a [[Signal.Severity]] (the reference's
  * Error/Warn/Info/Debug levels, `docs/2.learn/5.hooks.md:35-42`) so hooks
  * can filter alerts from routine traffic; [[Signals.severityOf]] assigns
  * the documented default per signal name.
  *
  * Listener registration is thread-safe; emission never throws (a failing
  * listener must not fail the pipeline).
  */
final case class Signal(
    name: String,
    stage: StageId,
    fields: Map[String, String] = Map.empty,
    // null = "derive from the name" (a default expression cannot
    // reference `name` in the same parameter list). NEVER read this
    // field for comparisons — use [[severityOrDefault]]: every bus path
    // (emit fill-in, thresholded subscribe) already does, so a Signal
    // constructed outside the bus can't NPE a `>=` anywhere in the
    // engine; pass explicitly to override the documented level
    severity: Signal.Severity = null,
    nanos: Long = System.nanoTime()
) {
  /** Never-null severity: the constructor value, or the name's documented
    * default when a null slipped through a copy.
    */
  def severityOrDefault: Signal.Severity =
    if (severity != null) severity else Signals.severityOf(name)
}

object Signal {
  /** Reference severity ladder (`docs/2.learn/5.hooks.md:35-42`). Ordered
    * so hooks can threshold (`sig.severity >= Signal.Warn`).
    */
  sealed abstract class Severity(val level: Int, val label: String)
      extends Ordered[Severity] {
    def compare(that: Severity): Int = level.compareTo(that.level)
    override def toString: String = label
  }
  case object Debug extends Severity(0, "DEBUG")
  case object Info extends Severity(1, "INFO")
  case object Warn extends Severity(2, "WARN")
  case object Error extends Severity(3, "ERROR")
}

object Signals {
  // Connector lifecycle signal names, mirroring signals.go:7-137.
  val SequenceCompleted = "sequence.completed"
  val SequenceFailed = "sequence.failed"
  val ConcurrentCompleted = "concurrent.completed"
  val RaceWinner = "race.winner"
  val RaceLost = "race.lost"
  val ContestWinner = "contest.winner"
  val ContestNoWinner = "contest.no_winner"
  val SwitchRouted = "switch.routed"
  val SwitchNoRoute = "switch.no_route"
  val FilterPassed = "filter.passed"
  val FallbackTriggered = "fallback.triggered"
  val RetryAttempt = "retry.attempt"
  val RetryExhausted = "retry.exhausted"
  val BackoffWaiting = "backoff.waiting"
  val TimeoutExceeded = "timeout.exceeded"
  val HandleError = "handle.error"
  val RateLimitWait = "ratelimiter.wait"
  val RateLimitDrop = "ratelimiter.drop"
  val BreakerOpened = "circuitbreaker.opened"
  val BreakerHalfOpen = "circuitbreaker.half_open"
  val BreakerClosed = "circuitbreaker.closed"
  val BreakerRejected = "circuitbreaker.rejected"
  val WorkerPoolSaturated = "workerpool.saturated"
  val ScaffoldLaunched = "scaffold.launched"
  val PipelineStarted = "pipeline.started"
  val PipelineCompleted = "pipeline.completed"
  val PipelineFailed = "pipeline.failed"
  // Engine-specific (beyond the reference's 18): the guarded Jaccard
  // join's df-cut actually dropped hot shingles — the result is
  // approximate, and silently so without this signal.
  val JaccardDfCut = "jaccard.df_cut"
  // The batch perceptual band joins' arrival-rank cut fired: saturated
  // (band, bh) buckets dropped arrivals past maxBucketSize — recall in
  // those buckets is partial, and silently so without this signal.
  val PerceptualBucketCut = "perceptual.bucket_cut"
  // The batch MinHash/SimHash band joins' arrival-rank cut fired: the
  // text-signature twin of the perceptual cut (mass-duplicated or
  // near-empty docs collapse whole band buckets) — same partial-recall
  // disclosure.
  val LshBucketCut = "lsh.bucket_cut"

  /** The reference's documented default severities
    * (`docs/2.learn/5.hooks.md:37-40`): Error = failures needing
    * attention (circuit opened/rejected, drops, retries exhausted,
    * timeouts); Warn = degraded / fallback (half-open, throttled,
    * saturated, individual retry failures, fallbacks, backoff delays);
    * Info = normal operations. Unknown names default to Info.
    */
  def severityOf(name: String): Signal.Severity = name match {
    case BreakerOpened | BreakerRejected | RateLimitDrop | RetryExhausted |
        TimeoutExceeded | HandleError | SequenceFailed | PipelineFailed =>
      Signal.Error
    case BreakerHalfOpen | RateLimitWait | WorkerPoolSaturated |
        RetryAttempt | FallbackTriggered | BackoffWaiting | SwitchNoRoute |
        ContestNoWinner | RaceLost | JaccardDfCut | PerceptualBucketCut |
        LshBucketCut =>
      Signal.Warn
    case _ => Signal.Info
  }
}

/** @param logCapacity bound on the recorded-signal ring: long-running /
  *                    streaming pipelines emit without end, so the log keeps
  *                    only the most recent `logCapacity` signals (O(1) per
  *                    emit; oldest dropped). Listeners always see every
  *                    signal regardless of the ring.
  * @param async       reference parity with capitan's per-signal worker
  *                    goroutines ("hooks don't impact pipeline performance",
  *                    `docs/2.learn/5.hooks.md:31`): when true, listeners run
  *                    on a dedicated daemon dispatcher thread and `emit`
  *                    only enqueues — a slow subscriber can never stall the
  *                    emitting (driver) thread between micro-batches. The
  *                    in-order guarantee is BUS-wide (one dispatcher),
  *                    strictly stronger than the reference's per-signal
  *                    ordering. The queue is bounded (65536); on overflow
  *                    the OLDEST undelivered signal is dropped (observability
  *                    must lose data before it blocks the pipeline) and
  *                    [[droppedSignals]] counts the loss. The recorded ring
  *                    ([[emitted]]) is always written synchronously at emit,
  *                    so tests and post-mortems see every signal either way.
  */
final class SignalBus(logCapacity: Int = 4096, async: Boolean = false) {
  private val listeners = new CopyOnWriteArrayList[Signal => Unit]()
  private val log = new java.util.ArrayDeque[Signal]()
  @volatile var recording: Boolean = true

  private val enqueued = new java.util.concurrent.atomic.AtomicLong()
  private val handled = new java.util.concurrent.atomic.AtomicLong()
  private val droppedCount = new java.util.concurrent.atomic.AtomicLong()
  private val queue: java.util.concurrent.LinkedBlockingQueue[Signal] =
    if (async) new java.util.concurrent.LinkedBlockingQueue[Signal](65536) else null
  locally {
    if (async) {
      val t = new Thread(() => {
        // the dispatcher must survive ANYTHING a listener throws —
        // deliver's per-listener catch covers NonFatal, but a
        // ControlThrowable (non-local return, Breaks) would otherwise
        // kill the thread and silently end all async delivery for the
        // bus's lifetime; only an interrupt exits the loop
        var running = true
        while (running) {
          try {
            val sig = queue.take()
            try deliver(sig) finally handled.incrementAndGet()
          } catch {
            case _: InterruptedException => running = false
            case _: Throwable => ()
          }
        }
      }, "graft-signal-dispatch")
      t.setDaemon(true)
      t.start()
    }
  }

  def subscribe(f: Signal => Unit): Unit = listeners.add(f)

  /** Severity-thresholded hook (`e.Severity()` filtering,
    * `docs/2.learn/5.hooks.md:42`): `f` sees only signals at `min` or
    * above.
    */
  def subscribe(min: Signal.Severity)(f: Signal => Unit): Unit =
    listeners.add(sig => if (sig.severityOrDefault >= min) f(sig))

  private def deliver(sig: Signal): Unit =
    listeners.asScala.foreach { l =>
      try l(sig)
      catch { case scala.util.control.NonFatal(_) => () }
    }

  def emit(raw: Signal): Unit = {
    // a null severity means "derive from the name" — every signal that
    // reaches a listener or the ring carries its documented level
    val sig =
      if (raw.severity == null) raw.copy(severity = Signals.severityOf(raw.name))
      else raw
    if (recording) log.synchronized {
      if (log.size >= logCapacity) log.pollFirst()
      log.addLast(sig)
    }
    if (async) {
      enqueued.incrementAndGet()
      while (!queue.offer(sig)) {
        // never block the emitter: shed the oldest undelivered signal
        if (queue.poll() != null) { droppedCount.incrementAndGet(); handled.incrementAndGet() }
      }
    } else deliver(sig)
  }

  def emit(name: String, stage: StageId, fields: (String, String)*): Unit =
    emit(Signal(name, stage, fields.toMap, Signals.severityOf(name)))

  /** Async-overflow loss counter (0 for sync buses). */
  def droppedSignals: Long = droppedCount.get()

  /** Wait until every signal emitted BEFORE this call has been delivered
    * to (or shed past) the listeners — the test/shutdown hook for async
    * buses; immediate for sync ones.
    */
  def drain(timeoutMs: Long = 30000L): Unit = if (async) {
    val target = enqueued.get()
    val deadline = System.nanoTime() + timeoutMs * 1000000L
    while (handled.get() < target && System.nanoTime() < deadline)
      Thread.sleep(1L)
  }

  def emitted: Seq[Signal] = log.synchronized(log.asScala.toVector)
  def emitted(name: String): Seq[Signal] = emitted.filter(_.name == name)
  def clear(): Unit = log.synchronized(log.clear())
}

object SignalBus {
  /** Default shared bus; pipelines can carry their own. */
  val global = new SignalBus
}
