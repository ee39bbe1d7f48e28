package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch diagnostics main (not part of the library surface). */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.001"
    for (t <- Seq("events", "orders", "embeddings", "documents")) {
      try {
        val df = spark.read.parquet(s"$sf/$t.parquet")
        println(s"== $t: ${df.count()} rows")
        df.printSchema()
        df.show(3, truncate = 60)
      } catch { case e: Throwable => println(s"== $t FAILED: ${e.getMessage.take(400)}") }
    }
    spark.stop()
  }
}
