package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Diagnostic for the append-session checkpoint cadence (round 15): times each
  * appendCrawlBatch + checkpoint step and reports plan sizes, to locate
  * the growth the PipelinesSpec append-session test bounds.
  *
  * Usage: sbt -error "runMain graft.tools.AppendLoopProbe [appends] [cadence]"
  */
object AppendLoopProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toInt else 20
    val cadence = if (args.length > 1) args(1).toInt else 3
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def goodDoc(i: Int): String =
      (0 until 5).map { s =>
        (1 to 12).map(j => s"w${i}x${s}y$j").mkString(" ") + "."
      }.mkString(" ")

    var state = graft.llm.Pipelines.initCrawlState(
      Seq((0L, goodDoc(0), "en")).toDF("doc_id", "text", "lang"))
    (1 to n).foreach { i =>
      val t0 = System.nanoTime()
      state = graft.llm.Pipelines.appendCrawlBatch(state,
        Seq((i.toLong, goodDoc(i), "en")).toDF("doc_id", "text", "lang"))
      val tAppend = (System.nanoTime() - t0) / 1e9
      val tCkpt = if (i % cadence == 0) {
        val t1 = System.nanoTime()
        state = state.checkpoint()
        (System.nanoTime() - t1) / 1e9
      } else 0.0
      val planNodes = state.pairs.queryExecution.analyzed.collect { case p => p }.size
      val mem = (Runtime.getRuntime.totalMemory() - Runtime.getRuntime.freeMemory()) / 1e6
      println(f"[probe] i=$i%2d append=$tAppend%6.2fs ckpt=$tCkpt%6.2fs pairsPlanOps=$planNodes%6d heapMB=$mem%7.0f")
    }
    spark.stop()
  }
}
