package graft.streaming

import graft.SparkSpec
import graft.sources.StreamSources
import org.apache.spark.sql.functions._

import java.nio.file.Files

class ThrottleSpec extends SparkSpec {
  import spark.implicits._

  test("file stream with maxFilesPerTrigger admits one file per micro-batch") {
    val dir = Files.createTempDirectory("graft_throttle").toFile
    try {
      // three separate files
      (1 to 3).foreach { i =>
        Seq((i.toLong, s"f$i")).toDF("id", "v").coalesce(1)
          .write.mode("append").parquet(dir.getAbsolutePath)
      }
      val schema = spark.read.parquet(dir.getAbsolutePath).schema
      val stream = StreamSources.files(spark, dir.getAbsolutePath, schema,
        maxFilesPerTrigger = 1)
      val batchSizes = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
      val q = stream.writeStream.foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batchSizes.add(batch.count()): Unit
      }.start()
      try {
        q.processAllAvailable()
        val sizes = batchSizes.toArray(Array.empty[java.lang.Long]).map(_.toLong)
        assert(sizes.sum == 3, s"all rows must arrive, got ${sizes.toSeq}")
        assert(sizes.count(_ > 0) >= 3, // one file (=1 row) per trigger
          s"throttle should spread files over micro-batches, got ${sizes.toSeq}")
      } finally q.stop()
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(): Unit
      }
      rm(dir)
    }
  }
}
