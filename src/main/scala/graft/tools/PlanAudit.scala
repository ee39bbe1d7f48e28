package graft.tools

import org.apache.spark.sql.SparkSession

/** Prints a one-line physical-plan summary per query: shuffle count, join
  * strategies, scan shapes — the scale checklist (`SURVEY.md §7.4.6`).
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = graft.SparkEntry.queries.keys.toSeq.sorted
    names.foreach { name =>
      try {
        val df = graft.SparkEntry.queries(name)(spark, sfDir)
        val p = df.queryExecution.executedPlan.toString
        def n(pat: String) = pat.r.findAllIn(p).size
        val flags = Seq(
          "xchg" -> n("Exchange"),
          "bhj" -> n("BroadcastHashJoin"),
          "smj" -> n("SortMergeJoin"),
          "shj" -> n("ShuffledHashJoin"),
          "bnlj" -> n("BroadcastNestedLoop"),
          "cart" -> n("CartesianProduct"),
          "sort" -> n("(?m)^\\s*\\+?-?\\s*\\*?\\(?\\d*\\)?\\s*Sort "),
          "scan" -> n("Scan parquet")
        ).collect { case (k, v) if v > 0 => s"$k=$v" }.mkString(" ")
        val pushed = "PushedFilters: \\[[^\\]]*\\]".r.findFirstIn(p).getOrElse("")
        println(f"$name%-24s $flags%-40s ${pushed.take(70)}")
      } catch { case e: Throwable => println(f"$name%-24s ERROR ${e.getMessage.take(60)}") }
    }
    spark.stop()
  }
}
