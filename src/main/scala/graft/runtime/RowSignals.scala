package graft.runtime

import graft.core.{Signal, SignalBus, StageId}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.util.QueryExecutionListener

import java.util.concurrent.atomic.AtomicLong

/** Per-ROW signal fidelity (`signals.go:128,200`): the reference emits
  * `filter.evaluated` per processed item with a `passed` field; a
  * plan-composition signal can only say "a Filter was built". This bridge
  * closes the gap with Spark's observed-metrics machinery: routing stages
  * attach `observe()` aggregates (count of rows passed / filtered /
  * routed) under a structured name, and a QueryExecutionListener converts
  * each completed action's observed metrics into signals whose fields
  * carry the ACTUAL routed-row counts.
  *
  * Row-level observation is SCOPED, not ambient: stages only attach
  * `observe()` nodes when composed inside [[scoped]] (which [[Pipeline]]
  * enters with its own bus). Two reasons:
  *
  *  - `CollectMetrics` is a predicate-pushdown barrier — Catalyst will not
  *    push a downstream filter through it to the scan. A pipeline that
  *    never asked for row signals must keep its pruned-scan plan; at
  *    100 TB an accidental observation node is the difference between a
  *    partition-pruned read and a full scan.
  *  - The observation name carries the scope's bus token, so a listener
  *    forwards ONLY its own pipeline's counts — per-pipeline buses on a
  *    shared session don't see each other's rows (and can't evict each
  *    other's signals from the bounded log).
  *
  * Timing contract: row-level signals fire when an action on the composed
  * plan completes (that is when the counts exist — lazy plans process no
  * rows at composition). Stages still emit their composition-time signal
  * with `phase=composed`; the observed emission carries `phase=rows`.
  *
  * Scale: an observed metric is a map-side aggregate riding the existing
  * scan (no extra job, no shuffle — Spark merges partial aggregates on
  * the driver), so the counts are free at any data size.
  */
object RowSignals {

  private val Prefix = "graft.rows"
  private val seq = new AtomicLong()

  // Stable per-bus token for observation names. Weak keys: a bus no one
  // references anymore must not be pinned by this registry.
  private val tokens = new java.util.WeakHashMap[SignalBus, String]()
  private val tokenSeq = new AtomicLong()
  private def tokenOf(bus: SignalBus): String = tokens.synchronized {
    Option(tokens.get(bus)).getOrElse {
      val t = s"b${tokenSeq.incrementAndGet()}"
      tokens.put(bus, t)
      t
    }
  }

  private val scope = new scala.util.DynamicVariable[Option[SignalBus]](None)

  /** Compose `body` with row-level observation routed to `bus`. Stages
    * applied outside any scope attach no observation at all (plan
    * unchanged, pushdown unimpeded).
    */
  def scoped[A](bus: SignalBus)(body: => A): A = scope.withValue(Some(bus))(body)

  // '|' is the name delimiter; a stage name / route key containing it must
  // not break the exact-arity parse in forward().
  private def clean(s: String): String = s.replace('|', '¦')

  /** Structured observation name; `detail` distinguishes multiple
    * observations of one stage application (e.g. split-union branches).
    * The trailing sequence keeps names unique within a query (Spark
    * rejects duplicate observed-metric names).
    */
  def observeName(bus: SignalBus, signal: String, stage: StageId, detail: String): String =
    s"$Prefix|${tokenOf(bus)}|${clean(signal)}|${clean(stage.name)}|${clean(detail)}|${seq.incrementAndGet()}"

  /** Attach observed row-count metrics to `df` for `signal` — only when a
    * scope is active; identity otherwise.
    */
  def observe(df: DataFrame, signal: String, stage: StageId, detail: String,
              metrics: Seq[org.apache.spark.sql.Column]): DataFrame =
    scope.value match {
      case Some(bus) => df.observe(observeName(bus, signal, stage, detail), metrics.head, metrics.tail: _*)
      case None      => df
    }

  private val attached =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, SignalBus), QueryExecutionListener]()

  /** Register the observed-metrics → SignalBus bridge once per
    * (session, bus) pair (idempotent). [[Pipeline.run]] attaches
    * automatically; direct stage users call this (plus [[scoped]] around
    * composition) when they want row-level signals. Balance with
    * [[detach]] when the bus's lifetime is shorter than the session's.
    */
  def attach(spark: SparkSession, bus: SignalBus = SignalBus.global): Unit = {
    if (attached.containsKey((spark, bus))) return // hot path: Pipeline.run attaches per run
    val busToken = tokenOf(bus)
    val l = new QueryExecutionListener {
      private def forward(qe: org.apache.spark.sql.execution.QueryExecution): Unit =
        qe.observedMetrics.foreach { case (name, row) =>
          name.split('|') match {
            case Array(Prefix, token, signal, stageName, detail, _) if token == busToken =>
              val fields = row.schema.fieldNames.zipWithIndex.map { case (f, i) =>
                f -> String.valueOf(row.get(i))
              }.toMap ++ Map("phase" -> "rows", "detail" -> detail)
              bus.emit(Signal(signal, StageId(stageName), fields))
            case _ => () // not ours
          }
        }
      override def onSuccess(funcName: String, qe: org.apache.spark.sql.execution.QueryExecution,
                             durationNs: Long): Unit = forward(qe)
      override def onFailure(funcName: String, qe: org.apache.spark.sql.execution.QueryExecution,
                             error: Exception): Unit = () // no rows completed
    }
    if (attached.putIfAbsent((spark, bus), l) == null) spark.listenerManager.register(l)
  }

  /** Unregister the bridge for (session, bus) and release the references —
    * the teardown for per-pipeline buses on a long-lived session.
    */
  def detach(spark: SparkSession, bus: SignalBus = SignalBus.global): Unit =
    Option(attached.remove((spark, bus))).foreach(spark.listenerManager.unregister)

  /** Registered-bridge count — the listener-hygiene audit hook: a
    * Verify-scale run (90+ queries on one session) must hold this at one
    * per (session, bus), not one per query.
    */
  private[graft] def attachedCount: Int = attached.size()
}
