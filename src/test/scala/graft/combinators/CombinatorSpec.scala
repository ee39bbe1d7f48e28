package graft.combinators

import graft.SparkSpec
import graft.core._
import graft.stages._
import org.apache.spark.sql.functions._

class CombinatorSpec extends SparkSpec {
  import spark.implicits._

  private def df = Seq((1, "a", 10.0), (2, "b", 20.0), (3, "a", 30.0)).toDF("id", "tag", "x")

  test("Sequence folds stages in order into one plan") {
    val pipe = Sequence("s")(
      Where("gt", col("x") > 10),
      Transform("double")("x2" -> (col("x") * 2)),
      Project("p")(col("id"), col("x2"))
    )
    val out = pipe(df)
    assert(rowsOf(out) == Set(Seq(2, 40.0), Seq(3, 60.0)))
  }

  test("Sequence mutation API is immutable and name-addressed") {
    val s0 = Sequence("s")(Stage.identity("a"), Stage.identity("b"))
    val s1 = s0.push(Stage.identity("c")).after("a", Stage.identity("a2"))
    assert(s1.names == Seq("a", "a2", "b", "c"))
    assert(s0.names == Seq("a", "b")) // original untouched
    assert(s1.remove("b").names == Seq("a", "a2", "c"))
    assert(s1.replaceStage("c", Stage.identity("z")).names == Seq("a", "a2", "b", "z"))
  }

  test("Filter routes matching rows through the stage, passes the rest") {
    val f = Filter("f", col("tag") === "a", Transform("u")("tag" -> upper(col("tag"))))
    val out = f(df).select("id", "tag")
    assert(rowsOf(out) == Set(Seq(1, "A"), Seq(3, "A"), Seq(2, "b")))
  }

  test("Filter(false-cond) ≡ passthrough (filter.go:94-97 law)") {
    val f = Filter("f", lit(false), MockStage_fails)
    assert(rowsOf(f(df).select("id", "tag", "x")) == rowsOf(df))
  }

  private def MockStage_fails: Stage =
    Transform("never")("tag" -> lit("SHOULD_NOT_APPEAR"))

  test("Switch dispatches per route and passes unmatched through") {
    val sw = Switch("sw", col("tag"))(
      "a" -> Transform("ra")("r" -> lit("route-a")))
    val out = sw(df)
    val byId = out.collect().map(r => r.getAs[Int]("id") -> Option(r.getAs[String]("r"))).toMap
    assert(byId(1).contains("route-a") && byId(3).contains("route-a"))
    assert(byId(2).isEmpty) // passthrough: no route column value
  }

  test("Filter fast path gates on INPUT values when an out overwrites a cond column") {
    // cond reads x; the transform overwrites x THEN writes y — y must still
    // be gated by the ORIGINAL x (split-union semantics), not the new one
    val f = Filter("f", col("x") > 15.0,
      Transform("t")("x" -> lit(-5.0), "y" -> lit(1)))
    val out = f(df)
    val byId = out.collect().map(r => r.getAs[Int]("id") ->
      ((r.getAs[Double]("x"), Option(r.get(r.fieldIndex("y")))))).toMap
    assert(byId(1) == ((10.0, None)))    // not gated: untouched
    assert(byId(2) == ((-5.0, Some(1)))) // gated: BOTH outs applied
    assert(byId(3) == ((-5.0, Some(1))))
    assert(!out.columns.exists(_.startsWith("__graft_pin__")))
  }

  test("Switch single-pass routes on INPUT key when a route overwrites the key column") {
    val sw = Switch("sw", col("tag"))(
      "a" -> Transform("t")("tag" -> lit("z"), "r" -> lit("route-a")))
    val out = sw(df)
    val byId = out.collect().map(r => r.getAs[Int]("id") ->
      ((r.getAs[String]("tag"), Option(r.getAs[String]("r"))))).toMap
    assert(byId(1) == (("z", Some("route-a"))))
    assert(byId(3) == (("z", Some("route-a"))))
    assert(byId(2) == (("b", None))) // passthrough keeps its key
    assert(!out.columns.exists(_.startsWith("__graft_pin__")))
  }

  test("pinned hidden column never collides with user columns") {
    // a user column already named like the pin must survive untouched
    val clash = df.withColumn("__graft_pin__", lit(7))
    val f = Filter("f", col("x") > 15.0, Transform("t")("y" -> lit(1)))
    val out = f(clash)
    assert(out.columns.count(_ == "__graft_pin__") == 1)
    assert(out.select("__graft_pin__").distinct().head().getInt(0) == 7)
  }

  test("Switch with no routes is identity (switch.go:104-107)") {
    val sw = Switch("sw", col("tag"))()
    assert(rowsOf(sw(df)) == rowsOf(df))
  }

  test("Fallback takes alternatives in order and dead-letters total misses") {
    val fb = Fallback("fb", "out")(
      when(col("tag") === "a", col("tag")),
      when(col("id") === 2, lit("second")))
    val out = fb(df)
    val good = ErrorChannel.good(out)
    assert(rowsOf(good.select("id", "out")) ==
      Set(Seq(1, "a"), Seq(2, "second"), Seq(3, "a")))
    // all-null alternatives → dead letter
    val fb2 = Fallback("fb2", "out")(lit(null).cast("string"))
    assert(ErrorChannel.dead(fb2(df)).count() == 3)
  }

  test("stage plan trees export to JSON with nested children") {
    val pipe = Sequence("root")(Where("w", col("x") > 0),
      Switch("sw", col("tag"))("a" -> Stage.identity("ra")))
    val json = pipe.plan.toJson
    assert(json.contains("\"kind\":\"Sequence\""))
    assert(json.contains("\"name\":\"sw\""))
    assert(pipe.plan.count == 5) // root, w, sw, route-a, ra
    assert(pipe.plan.findByName("ra").isDefined)
    assert(pipe.plan.findByKind("Route").size == 1)
  }
}
