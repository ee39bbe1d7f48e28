package graft.runtime

import graft.SparkSpec
import graft.core._
import graft.combinators.Sequence
import graft.stages.{Apply, Transform}
import org.apache.spark.sql.functions._

class PipelineSpec extends SparkSpec {
  import spark.implicits._

  private def df = Seq((1, "5"), (2, "x"), (3, "7")).toDF("id", "raw")

  private def parsePipe = Pipeline("numbers", Sequence("seq")(
    Apply("parse", errWhen = expr("try_cast(raw AS INT)").isNull, msg = "not a number")(
      "n" -> expr("try_cast(raw AS INT)")),
    Transform("double")("n" -> (col("n") * 2))
  ))

  test("failFast surfaces the dead-letter path as a typed exception (apply.go:44-55)") {
    val e = intercept[PipelineException](parsePipe.failFast(df))
    assert(e.path == "seq -> parse")
    assert(e.msg == "not a number")
    assert(e.getMessage == "numbers -> seq -> parse failed: not a number")
  }

  test("failFast tags timeout dead letters in the exception message") {
    val timedOut = ErrorChannel.markWhere(df, StageId("deadline"),
      col("id") === 2, lit("too slow"), timeout = true)
    val p = Pipeline("t", Stage.identity("id"))
    val e = intercept[PipelineException](p.failFast(timedOut))
    assert(e.getMessage.endsWith("too slow [timeout]"))
  }

  test("failFast returns healthy rows when nothing is dead") {
    val clean = Seq((1, "5"), (2, "6")).toDF("id", "raw")
    val out = parsePipe.failFast(clean)
    assert(rowsOf(out.select("id", "n")) == Set(Seq(1, 10), Seq(2, 12)))
  }

  test("run stamps the job group and emits lifecycle signals") {
    SignalBus.global.clear()
    val p = parsePipe
    val n = p.run(spark)(ErrorChannel.good(p.plan(df)).count())
    assert(n == 2)
    assert(SignalBus.global.emitted(Signals.PipelineStarted).size == 1)
    assert(SignalBus.global.emitted(Signals.PipelineCompleted).size == 1)
  }

  test("planJson exports the stage tree") {
    val json = parsePipe.planJson
    assert(json.contains("\"kind\":\"Pipeline\""))
    assert(json.contains("\"name\":\"parse\""))
  }
}
