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

  /** Attach a QueryExecutionListener forwarding to `bus`. Returns the
    * listener so callers can detach it (`spark.listenerManager.unregister`).
    */
  def attach(spark: SparkSession, bus: SignalBus = SignalBus.global): QueryExecutionListener = {
    val l = new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
        bus.emit(Signal(QueryCompleted, StageId(funcName), Map(
          "durationNs" -> durationNs.toString,
          "jobGroup" -> String.valueOf(qe.sparkSession.sparkContext.getLocalProperty("spark.jobGroup.id"))
        )))
      override def onFailure(funcName: String, qe: QueryExecution, error: Exception): Unit =
        bus.emit(Signal(QueryFailed, StageId(funcName), Map(
          "error" -> String.valueOf(error.getMessage).take(256)
        )))
    }
    spark.listenerManager.register(l)
    l
  }
}
