package graft.runtime

import graft.core.{Signal, SignalBus, StageId}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Spark-side observability bridge (`SURVEY.md §1.1` Signals row): query
  * completions/failures surface on the engine's SignalBus with the same
  * event-name discipline as the reference's capitan signals, correlated to
  * the pipeline via the job group set by [[Pipeline.run]].
  */
object Listeners {
  val QueryCompleted = "query.completed"
  val QueryFailed = "query.failed"

  /** Sum a named SQL metric over the executed plan tree — shuffle volume
    * and row counts per completed query, the numbers a capacity planner
    * actually watches (a query whose shuffle bytes jump 10× between
    * releases regressed its plan, whatever the wall-clock says).
    */
  private def planMetric(qe: QueryExecution, names: Set[String]): Long = {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
    var total = 0L
    // Identity-dedup: ReusedExchangeExec (and AQE stage reuse) points at a
    // subtree that is ALSO reachable at its original position — walking it
    // twice would double-count shuffle volume, the exact false alarm this
    // metric exists to catch.
    val seen = java.util.Collections.newSetFromMap(
      new java.util.IdentityHashMap[SparkPlan, java.lang.Boolean]())
    def walk(p: SparkPlan): Unit = if (seen.add(p)) {
      p.metrics.foreach { case (k, m) => if (names.contains(k)) total += m.value }
      // AQE wraps the final plan in leaf nodes TreeNode.foreach won't enter
      p match {
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
        case q: QueryStageExec        => walk(q.plan)
        case r: ReusedExchangeExec    => walk(r.child)
        case _                        => ()
      }
      p.children.foreach(walk)
    }
    walk(qe.executedPlan)
    total
  }

  /** Attach a QueryExecutionListener forwarding to `bus`. Returns the
    * listener so callers can detach it (`spark.listenerManager.unregister`).
    */
  def attach(spark: SparkSession, bus: SignalBus = SignalBus.global): QueryExecutionListener = {
    val l = new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
        bus.emit(Signal(QueryCompleted, StageId(funcName), Map(
          "durationNs" -> durationNs.toString,
          "jobGroup" -> String.valueOf(qe.sparkSession.sparkContext.getLocalProperty("spark.jobGroup.id")),
          "shuffleBytesWritten" -> planMetric(qe, Set("shuffleBytesWritten", "bytesWritten")).toString,
          "shuffleRecordsWritten" -> planMetric(qe, Set("shuffleRecordsWritten", "recordsWritten")).toString,
          "outputRows" -> planMetric(qe, Set("numOutputRows")).toString
        )))
      override def onFailure(funcName: String, qe: QueryExecution, error: Exception): Unit =
        bus.emit(Signal(QueryFailed, StageId(funcName), Map(
          "error" -> String.valueOf(error.getMessage).take(256)
        ), severity = Signal.Error))
    }
    spark.listenerManager.register(l)
    l
  }
}
