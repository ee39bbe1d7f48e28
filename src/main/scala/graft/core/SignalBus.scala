package graft.core

import java.util.concurrent.CopyOnWriteArrayList
import scala.jdk.CollectionConverters._

/** Typed observability events at state transitions — the engine's analog of
  * the reference's 18 capitan signals (`signals.go:7-137`). Same event names
  * so a user of the reference finds the hooks they expect.
  *
  * Listener registration is thread-safe; emission never throws (a failing
  * listener must not fail the pipeline).
  */
final case class Signal(
    name: String,
    stage: StageId,
    fields: Map[String, String] = Map.empty,
    nanos: Long = System.nanoTime()
)

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
}

/** @param logCapacity bound on the recorded-signal ring: long-running /
  *                    streaming pipelines emit without end, so the log keeps
  *                    only the most recent `logCapacity` signals (O(1) per
  *                    emit; oldest dropped). Listeners always see every
  *                    signal regardless of the ring.
  */
final class SignalBus(logCapacity: Int = 4096) {
  private val listeners = new CopyOnWriteArrayList[Signal => Unit]()
  private val log = new java.util.ArrayDeque[Signal]()
  @volatile var recording: Boolean = true

  def subscribe(f: Signal => Unit): Unit = listeners.add(f)

  def emit(sig: Signal): Unit = {
    if (recording) log.synchronized {
      if (log.size >= logCapacity) log.pollFirst()
      log.addLast(sig)
    }
    listeners.asScala.foreach { l =>
      try l(sig)
      catch { case scala.util.control.NonFatal(_) => () }
    }
  }

  def emit(name: String, stage: StageId, fields: (String, String)*): Unit =
    emit(Signal(name, stage, fields.toMap))

  def emitted: Seq[Signal] = log.synchronized(log.asScala.toVector)
  def emitted(name: String): Seq[Signal] = emitted.filter(_.name == name)
  def clear(): Unit = log.synchronized(log.clear())
}

object SignalBus {
  /** Default shared bus; pipelines can carry their own. */
  val global = new SignalBus
}
