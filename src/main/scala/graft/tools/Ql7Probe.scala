package graft.tools

import org.apache.spark.sql.SparkSession

object Ql7Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    // warm at sf0.001 like Bench
    graft.SparkEntry.queries("ql7_token_count")(spark, "/root/testdata/sf0.001")
      .write.format("noop").mode("overwrite").save()
    val times = (1 to 5).map { _ =>
      val t0 = System.nanoTime()
      graft.SparkEntry.queries("ql7_token_count")(spark, dir)
        .write.format("noop").mode("overwrite").save()
      spark.sqlContext.clearCache()
      (System.nanoTime() - t0) / 1e9
    }
    println("QL7TIMES " + times.map(t => f"$t%.3f").mkString(","))
    spark.stop()
  }
}
