package graft.streaming

import graft.SparkSpec
import graft.sources.Sinks
import graft.stages.Transform
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** Round-2 streaming sink parity: durable parquet sink with checkpoint,
  * per-row ForeachWriter, and the stage-per-micro-batch bridge.
  */
class SinksSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  test("parquet stream sink writes append-mode files under a checkpoint") {
    implicit val sc = spark.sqlContext
    val stream = MemoryStream[Int]
    val out = tmp("sink-out")
    val ckp = tmp("sink-ckp")
    val q = Sinks.parquetStream(
      stream.toDF().select(col("value"), (col("value") * 2).as("doubled")),
      out, ckp)
    stream.addData(1, 2, 3)
    q.processAllAvailable()
    stream.addData(4, 5)
    q.processAllAvailable()
    q.stop()
    val rows = spark.read.parquet(out)
    assert(rows.count() == 5)
    assert(rows.agg(sum("doubled")).head().getLong(0) == 30L)
    // the checkpoint carries committed offsets (restart would resume, not replay)
    assert(Files.list(java.nio.file.Paths.get(ckp)).count() > 0)
  }

  test("foreach sink processes every row on the executor side") {
    implicit val sc = spark.sqlContext
    val stream = MemoryStream[Int]
    val q = Sinks.foreachSink(stream.toDS())(
      openFn = (_, _) => true,
      processFn = v => SinksSpec.seen.add(v))
    stream.addData(7, 8, 9)
    q.processAllAvailable()
    q.stop()
    assert(SinksSpec.seen.contains(7) && SinksSpec.seen.contains(8) && SinksSpec.seen.contains(9))
  }

  test("stagePerBatch applies a batch stage to each micro-batch") {
    implicit val sc = spark.sqlContext
    val stream = MemoryStream[Int]
    val stage = Transform("label")("tag" -> concat(lit("v"), col("value")))
    val ckp = tmp("spb-ckp")
    val q = Sinks.stagePerBatch(stream.toDF(), stage, ckp) { (staged, _) =>
      staged.select("tag").as[String].collect().foreach(SinksSpec.tags.add)
    }
    stream.addData(1, 2)
    q.processAllAvailable()
    q.stop()
    assert(SinksSpec.tags.contains("v1") && SinksSpec.tags.contains("v2"))
  }

  test("deadLetterSplit routes healthy rows and dead letters to separate sinks") {
    implicit val sc = spark.sqlContext
    val stream = MemoryStream[String]
    // fallible stage: non-numeric strings go to the dead-letter channel
    val stage = graft.stages.Apply("parse_int",
      errWhen = expr("try_cast(value AS int)").isNull,
      msg = "not an int")("n" -> expr("try_cast(value AS int)"))
    val ckp = tmp("dlq-ckp")
    val q = Sinks.deadLetterSplit(stream.toDF(), stage, ckp) { (good, _) =>
      good.select("n").as[Int].collect().foreach(SinksSpec.goods.add)
    } { (dead, _) =>
      // released dead letters are live rows with the error in `err`
      dead.select(col("value"), col("err.msg")).as[(String, String)]
        .collect().foreach(p => SinksSpec.deads.add(p._1 + ":" + p._2))
    }
    stream.addData("1", "oops", "3")
    q.processAllAvailable()
    stream.addData("bad", "5")
    q.processAllAvailable()
    q.stop()
    assert(SinksSpec.goods == java.util.Set.of(1, 3, 5))
    assert(SinksSpec.deads.contains("oops:not an int"))
    assert(SinksSpec.deads.contains("bad:not an int"))
  }
}

/** Executor-visible accumulators (local-mode tests share the JVM). */
object SinksSpec {
  val seen = java.util.concurrent.ConcurrentHashMap.newKeySet[Int]()
  val tags = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  val goods = java.util.concurrent.ConcurrentHashMap.newKeySet[Int]()
  val deads = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
}
