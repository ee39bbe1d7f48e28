package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Adjudication probe for the r13 ql47b regression (0.255 → 0.414 s at
  * sf0.1 while exact ql47 stayed flat — VERDICT r13 #7): min-of-5
  * timings on a quiet machine for the exact form, the approx form, and
  * the approx form's two halves (the cuts aggregation alone; the
  * bucket-compare probe with literal cuts), using the Bench noop-write
  * convention. If the full approx row re-measures at its historical
  * 0.23–0.26 band, the r13 number was environmental; if it stays ~0.4,
  * the split shows which half grew.
  *
  * Usage: SPARK_GRAFT_CPUS=32 sbt -error "runMain graft.tools.Ql47bProbe [sfDir]"
  */
object Ql47bProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def scored(dir: String) = graft.sources.Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("lang"))
      .withColumn("score", pmod(xxhash64(col("doc_id")), lit(1000000L)).cast("double"))

    val variants: Seq[(String, String => org.apache.spark.sql.DataFrame)] = Seq(
      "ql47_exact" -> (d => graft.SparkEntry.queries("ql47_percentile_buckets")(spark, d)),
      "ql47b_full" -> (d => graft.SparkEntry.queries("ql47b_percentile_buckets_approx")(spark, d)),
      "ql47b_cuts_only" -> (d => scored(d).groupBy(col("lang"))
        .agg(approx_percentile(col("score"),
          array(lit(1.0 / 3), lit(2.0 / 3)), lit(10000)).as("cuts"))),
      "ql47b_probe_only" -> (d => scored(d)
        .withColumn("bucket",
          when(col("score") <= 333333.0, "head")
            .when(col("score") <= 666666.0, "middle").otherwise("tail"))
        .orderBy(col("doc_id"), col("lang"), col("score"), col("bucket"))))

    // warm plan shapes at the smallest SF (the Bench convention)
    variants.foreach { case (_, f) =>
      f("/root/testdata/sf0.001").write.format("noop").mode("overwrite").save() }

    def loadavg(): String =
      try new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get("/proc/loadavg"))).trim.split(" ").take(1).mkString
      catch { case _: Throwable => "" }
    val results = variants.map { case (name, f) =>
      val ts = (1 to 5).map { _ =>
        val t0 = System.nanoTime()
        f(sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      name -> ts.min
    }
    println(results.map { case (n, t) => f""""$n":$t%.3f""" }
      .mkString("{", ",", s""","loadavg":"${loadavg()}"}"""))
    spark.stop()
  }
}
