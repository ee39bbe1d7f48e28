package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Adjudication probe for the r14 ql27 drift (0.603 → 0.871 s at sf0.1
  * under a loaded floor, surviving a same-floor remeasure — VERDICT r14
  * "what's wrong" #3): min-of-5 timings on a quiet machine for the int8
  * form, its exact float sibling (ql4 — same fixture, same bounded
  * top-k tail, no quantization), and the PQ sibling (ql65 — same family,
  * one more transform stage), using the Bench noop-write convention. If
  * ql27 re-measures in its historical 0.55–0.65 band while ql4/ql65 sit
  * in theirs, the r14 number was environmental (the same class as r13's
  * ql47b, adjudicated by `Ql47bProbe`); if it stays ~0.87 the contrast
  * shows whether the int8 path alone grew (ql4 flat) or the whole
  * topKAggTail family did (all three up).
  *
  * Usage: SPARK_GRAFT_CPUS=32 sbt -error "runMain graft.tools.Ql27Probe [sfDir]"
  */
object Ql27Probe {
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

    val variants: Seq[(String, String => org.apache.spark.sql.DataFrame)] = Seq(
      "ql27_int8" -> (d => graft.SparkEntry.queries("ql27_quantized_topk")(spark, d)),
      "ql4_exact" -> (d => graft.SparkEntry.queries("ql4_cosine_topk")(spark, d)),
      "ql65_pq" -> (d => graft.SparkEntry.queries("ql65_pq_topk")(spark, d)))

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
