package graft.runtime

import graft.core._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** C16 Pipeline — semantic wrapper + runner (`pipeline.go:33-100`): gives
  * the stage graph a stable pipeline UUID and stamps each run with a fresh
  * execution UUID via the Spark job group, so listener events / the Spark UI
  * correlate to (pipeline, run) exactly as the reference correlates signals
  * via context values (`pipeline.go:52-56`).
  */
final class Pipeline(val id: StageId, val root: Stage, val bus: SignalBus = SignalBus.global) {
  val pipelineUuid: java.util.UUID = id.uuid

  /** Lazily compose the plan (no action). Composition runs inside this
    * pipeline's [[RowSignals.scoped]] scope, so routing stages attach
    * row-count observations tagged with THIS bus — and stages composed
    * outside any pipeline attach none (no CollectMetrics barrier in plain
    * plans; see RowSignals for why that matters for pushdown).
    */
  def plan(df: DataFrame): DataFrame = RowSignals.scoped(bus)(root(df))

  def planTree: PlanNode = PlanNode("Pipeline", id, Seq(root.plan))
  def planJson: String = planTree.toJson

  /** Run an action under this pipeline's job group with a per-run UUID. */
  def run[A](spark: SparkSession)(body: => A): A = {
    val runUuid = java.util.UUID.randomUUID()
    val sc = spark.sparkContext
    sc.setJobGroup(s"$pipelineUuid/$runUuid", id.name, interruptOnCancel = true)
    RowSignals.attach(spark, bus) // row-level routing signals (idempotent)
    bus.emit(Signals.PipelineStarted, id, "run" -> runUuid.toString)
    val t0 = System.nanoTime()
    try {
      val a = body
      bus.emit(Signals.PipelineCompleted, id,
        "run" -> runUuid.toString,
        "nanos" -> (System.nanoTime() - t0).toString)
      a
    } catch {
      case t: Throwable =>
        bus.emit(Signals.PipelineFailed, id, "run" -> runUuid.toString, "error" -> String.valueOf(t.getMessage))
        throw t
    } finally sc.clearJobGroup()
  }

  /** Fail-fast gate (`apply.go:44-55` analog, `SURVEY.md §7.4.2`): checked
    * ONCE per action rather than per stage so laziness survives. Returns the
    * healthy rows; throws if any dead letters exist.
    */
  def failFast(df: DataFrame): DataFrame = {
    val out = plan(df)
    if (!ErrorChannel.hasChannel(out)) out
    else {
      val firstDead = ErrorChannel.dead(out)
        .select(col(s"${ErrorChannel.ColName}.path"), col(s"${ErrorChannel.ColName}.msg"),
          col(s"${ErrorChannel.ColName}.timeout"), col(s"${ErrorChannel.ColName}.canceled"))
        .head(1)
      firstDead.headOption.foreach { row =>
        val path = row.getSeq[String](0).mkString(" -> ")
        val kind =
          if (!row.isNullAt(2) && row.getBoolean(2)) " [timeout]"
          else if (!row.isNullAt(3) && row.getBoolean(3)) " [canceled]"
          else ""
        throw new PipelineException(id, path, String.valueOf(row.getString(1)) + kind)
      }
      ErrorChannel.good(out)
    }
  }

  def close(): Unit = root.close()

  /** Release the row-signal bridge registered by [[run]] for this
    * pipeline's bus — the teardown for per-pipeline buses on a long-lived
    * session (no-op if never run). Separate from [[close]] because
    * several pipelines may legitimately share one bus.
    */
  def detachRowSignals(spark: SparkSession): Unit = RowSignals.detach(spark, bus)
}

/** Job-level failure carrying the stage path — the `Error[T]` message shape
  * (`error.go:31-52`): "pipeline -> stage failed: msg".
  */
final class PipelineException(val pipeline: StageId, val path: String, val msg: String)
    extends RuntimeException(s"${pipeline.name} -> $path failed: $msg")

object Pipeline {
  def apply(name: String, root: Stage): Pipeline = new Pipeline(StageId(name), root)
}
