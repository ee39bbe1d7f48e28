package graft.tools

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Optimization-round artifact helper: dump `.explain("formatted")` for a
  * comma-separated subset of SparkEntry.queries into per-query files —
  * `plans/r{N}/<query>_<suffix>.txt` — so before/after plan diffs commit
  * alongside the bench evidence (args: sfDir outDir name,name,… suffix).
  * Same sf0.001 default rationale as [[PlanAudit]]: dim sizes at the audit
  * SF keep join strategies representative of production dims.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.001"
    val outDir = if (args.length > 1) args(1) else "plans/tmp"
    val names = if (args.length > 2) args(2).split(",").toSeq else Seq.empty
    val suffix = if (args.length > 3) args(3) else "after"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    new java.io.File(outDir).mkdirs()
    for (name <- names) {
      try {
        val df = graft.SparkEntry.queries(name)(spark, sfDir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        Files.writeString(Paths.get(s"$outDir/${name}_$suffix.txt"), txt)
        println(s"dumped $name -> $outDir/${name}_$suffix.txt")
      } catch {
        case t: Throwable => println(s"ERROR dumping $name: ${t.getMessage}")
      }
    }
    spark.stop()
  }
}
