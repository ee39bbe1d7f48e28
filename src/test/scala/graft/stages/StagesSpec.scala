package graft.stages

import graft.SparkSpec
import graft.core._
import org.apache.spark.sql.functions._

class StagesSpec extends SparkSpec {
  import spark.implicits._

  test("Effect observes metrics as a by-product of the action (effect.go:42)") {
    val df = Seq((1, 10.0), (2, 20.0), (3, 30.0)).toDF("id", "x")
    val eff = Effect("audit")(count(lit(1)).as("n"), sum(col("x")).as("sx"))
    val out = eff(df)
    assert(out.columns.toSeq == df.columns.toSeq) // passthrough
    out.write.format("noop").mode("overwrite").save()
    val m = eff.metrics
    assert(m("n") == 3L)
    assert(m("sx") == 60.0)
  }

  test("a reused Effect observes every application, not just the first") {
    val eff = Effect("audit2")(count(lit(1)).as("n"))
    val first = eff(Seq((1, 1.0), (2, 2.0)).toDF("id", "x"))
    first.write.format("noop").mode("overwrite").save()
    assert(eff.metrics("n") == 2L)
    // round-1 defect #4: a second application silently skipped observe
    val second = eff(Seq((1, 1.0), (2, 2.0), (3, 3.0)).toDF("id", "x"))
    second.write.format("noop").mode("overwrite").save()
    assert(eff.metrics("n") == 3L)
  }

  test("Enrich keeps the original value on lookup miss (enrich.go:44-47)") {
    val facts = Seq((1, "x"), (9, "y")).toDF("fid", "name")
    val base = Seq((1, "a"), (2, "b")).toDF("id", "orig")
    val enrich = Enrich.lookup("look", facts, col("id") === facts("fid"))(
      "orig" -> coalesce(facts("name"), col("orig")))
    val out = enrich(base)
    assert(rowsOf(out.select("id", "orig")) == Set(Seq(1, "x"), Seq(2, "b")))
    assert(!out.columns.contains("fid")) // dim columns dropped
  }

  test("SafeLambda.mapRecover swallows per-row failures (panic guard analog)") {
    val ds = Seq("1", "x", "3").toDS()
    val stage = SafeLambda.mapRecover[String, Int](StageId("parse"))(_.toInt)((_, _) => -1)
    assert(stage(ds).collect().toSeq == Seq(1, -1, 3))
  }

  test("SafeLambda.mapEither dead-letters failing rows with sanitized messages") {
    val ds = Seq("2", "boom").toDS()
    val stage = SafeLambda.mapEither[String, Int](StageId("parse"))(_.toInt)
    val rows = stage(ds).collect()
    assert(rows(0) == ((Some(2), None)))
    val (v, e) = rows(1)
    assert(v.isEmpty && e.get.startsWith("NumberFormatException"))
    assert(!e.get.contains("\n"))
  }

  test("sanitize strips control chars and bounds length") {
    val msg = SafeLambda.sanitize(new RuntimeException("a\tb\nSTACK" + "x" * 500))
    assert(!msg.contains("\n") && !msg.contains("\t"))
    assert(msg.length <= 256)
  }
}
