package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.{QueryExecution, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.util.QueryExecutionListener

/** Stage-level SQLMetrics attribution (VERDICT r15 #4): run registry
  * queries at a given SF and print, per execution, every physical node
  * with its populated SQLMetric values — scan times, shuffle bytes/rows,
  * codegen durations, aggregate build times. Wall-clock probes said the
  * ql27/ql4 family drifted ~15% with no code change; per-operator metrics
  * from the plan that ACTUALLY ran (captured via QueryExecutionListener —
  * `df.write` creates its own QueryExecution, so inspecting the input
  * frame's plan would read metrics that never executed) name the stage
  * that grew instead of re-arguing totals. Run the same probe from a
  * worktree at an old round's commit for a like-for-like diff.
  *
  * Usage: SPARK_GRAFT_CPUS=32 sbt -error
  *   "runMain graft.tools.MetricsProbe [sfDir] [q1,q2,...] [samples]"
  */
object MetricsProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val names = (if (args.length > 1) args(1) else "ql27_quantized_topk,ql4_cosine_topk")
      .split(',').toSeq
    val samples = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    @volatile var captured: QueryExecution = null
    spark.listenerManager.register(new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution,
                             durationNs: Long): Unit = captured = qe
      override def onFailure(funcName: String, qe: QueryExecution,
                             exception: Exception): Unit = ()
    })

    def walk(p: SparkPlan, depth: Int): Seq[(Int, SparkPlan)] = {
      val inner = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec => Seq(q.plan)
        case other => other.children
      }
      (depth, p) +: inner.flatMap(walk(_, depth + 1))
    }

    // warm shapes (codegen is per-shape); metrics come from the timed runs
    names.foreach { n =>
      graft.SparkEntry.queries(n)(spark, "/root/testdata/sf0.001")
        .write.format("noop").mode("overwrite").save()
    }

    names.foreach { n =>
      val times = (1 to samples).map { _ =>
        captured = null
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(n)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        val sec = (System.nanoTime() - t0) / 1e9
        spark.sqlContext.clearCache()
        // the listener bus delivers asynchronously; wait for this run's QE
        val deadline = System.currentTimeMillis + 10000
        while (captured == null && System.currentTimeMillis < deadline)
          Thread.sleep(20)
        sec
      }
      println(f"== $n min=${times.min}%.3f all=${times.map(t => f"$t%.3f").mkString(",")} sfDir=$sfDir")
      if (captured == null) println("   (no QueryExecution captured)")
      else walk(captured.executedPlan, 0).foreach { case (d, node) =>
        val ms = node.metrics.toSeq
          .filter(_._2.value > 0)
          .sortBy(_._1)
          .map { case (k, m) => s"$k=${m.value}" }
          .mkString(", ")
        if (ms.nonEmpty || node.children.isEmpty)
          println(s"  ${"  " * d}${node.nodeName}: $ms")
      }
    }
    spark.stop()
  }
}
