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

  /** Structured observation name; `detail` distinguishes multiple
    * observations of one stage application (e.g. split-union branches).
    * The trailing sequence keeps names unique within a query (Spark
    * rejects duplicate observed-metric names).
    */
  def observeName(signal: String, stage: StageId, detail: String): String =
    s"$Prefix|$signal|${stage.name}|$detail|${seq.incrementAndGet()}"

  /** Attach observed row-count metrics to `df` for `signal`. */
  def observe(df: DataFrame, signal: String, stage: StageId, detail: String,
              metrics: Seq[org.apache.spark.sql.Column]): DataFrame =
    df.observe(observeName(signal, stage, detail), metrics.head, metrics.tail: _*)

  private val attached =
    java.util.Collections.newSetFromMap(
      new java.util.concurrent.ConcurrentHashMap[(SparkSession, SignalBus), java.lang.Boolean]())

  /** Register the observed-metrics → SignalBus bridge once per
    * (session, bus) pair (idempotent — a pipeline with its own bus still
    * attaches even when the global bus already did). [[Pipeline.run]]
    * attaches automatically; direct stage users call this when they want
    * row-level signals.
    */
  def attach(spark: SparkSession, bus: SignalBus = SignalBus.global): Unit =
    if (attached.add((spark, bus))) {
      val l = new QueryExecutionListener {
        private def forward(qe: org.apache.spark.sql.execution.QueryExecution): Unit =
          qe.observedMetrics.foreach { case (name, row) =>
            name.split('|') match {
              case Array(Prefix, signal, stageName, detail, _) =>
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
      spark.listenerManager.register(l)
    }
}
