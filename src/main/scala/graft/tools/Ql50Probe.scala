package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** ql50_pretrain_pipeline action-level attribution (optimization round 22,
  * VERDICT r21 #2): the pipeline is a COMPOSITE — persisted gate cut,
  * banded LSH pair join, the pointer-jumping cluster loop's per-iteration
  * count actions, keep-best joins, the bucket window, and a final eager
  * localCheckpoint. MetricsProbe captures only the LAST QueryExecution, so
  * the composite's cost splits invisibly across ~a dozen intermediate
  * actions. This probe logs EVERY action's wall-clock + its root plan node
  * during one timed run, so the dominant stage is named instead of argued.
  *
  * Usage: SPARK_GRAFT_CPUS=32 sbt -error
  *   "runMain graft.tools.Ql50Probe [sfDir] [query] [samples]"
  */
object Ql50Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val name = if (args.length > 1) args(1) else "ql50_pretrain_pipeline"
    val samples = if (args.length > 2) args(2).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val events = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.listenerManager.register(new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution,
                             durationNs: Long): Unit = {
        val root = qe.executedPlan.nodeName
        val rows = qe.executedPlan.metrics.get("numOutputRows").map(_.value).getOrElse(-1L)
        events.add(f"${durationNs / 1e9}%8.3f s  $funcName%-18s root=$root rows=$rows")
      }
      override def onFailure(funcName: String, qe: QueryExecution,
                             exception: Exception): Unit = ()
    })

    // warm the shape at the smallest SF
    graft.SparkEntry.queries(name)(spark, "/root/testdata/sf0.001")
      .write.format("noop").mode("overwrite").save()
    Thread.sleep(500)

    (1 to samples).foreach { i =>
      events.clear()
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      spark.sqlContext.clearCache()
      Thread.sleep(1000) // let the async listener drain
      println(f"== $name sample $i total=$sec%.3f s ($sfDir)")
      events.forEach(e => println(s"  $e"))
    }
    spark.stop()
  }
}
