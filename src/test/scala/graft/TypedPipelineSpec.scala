package graft

import graft.core._
import graft.stages.SafeLambda
import java.sql.Timestamp

/** Typed-face fixture from the reference README's Order pipeline
  * (`README.md:97-101`, FIXTURES §B): validate → enrich → format as
  * TypedStage composition over Dataset[Order].
  */
case class Order(id: String, total: Double, processedAt: Timestamp)

class TypedPipelineSpec extends SparkSpec {
  import spark.implicits._

  private val t0 = Timestamp.valueOf("2024-01-01 00:00:00")

  test("typed stages compose like the reference's Chainable chain") {
    val validate = TypedStage[Order, Order](StageId("validate"))(
      _.filter(o => o.id.nonEmpty && o.total >= 0))
    val enrich = TypedStage.map[Order, Order](StageId("apply-fee"))(
      o => o.copy(total = o.total * 1.1))
    val format = TypedStage.map[Order, (String, Double)](StageId("format"))(
      o => (o.id.toUpperCase, math.round(o.total * 100) / 100.0))

    val pipe = validate.andThen(enrich).andThen(format)
    val ds = Seq(
      Order("a1", 100.0, t0),
      Order("", 50.0, t0), // dropped by validate
      Order("b2", -5.0, t0) // dropped by validate
    ).toDS()
    assert(pipe(ds).collect().toSet == Set(("A1", 110.0)))
    assert(pipe.id.name == "validate>>apply-fee>>format")
  }

  test("typed stage with mapRecover keeps the pipeline total") {
    val parse = SafeLambda.mapRecover[Order, Double](StageId("risky"))(
      o => if (o.total > 75) throw new IllegalStateException("too big") else o.total)(
      (o, _) => -o.total)
    val ds = Seq(Order("a", 100.0, t0), Order("b", 50.0, t0)).toDS()
    assert(parse(ds).collect().toSet == Set(-100.0, 50.0))
  }
}
