package graft.analytics

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("saltedJoin equals the plain join (inner and left)") {
    val big = (1 to 500).map(i => (if (i % 10 == 0) 1L else i.toLong, s"v$i")).toDF("k", "v")
    val small = Seq((1L, "one"), (2L, "two"), (999L, "none")).toDF("k", "name")
    for (how <- Seq("inner", "left")) {
      val plain = rowsOf(big.join(small, Seq("k"), how))
      val salted = rowsOf(Skew.saltedJoin(big, small, Seq("k"), factor = 8, how))
      assert(salted == plain, s"$how join mismatch")
    }
  }

  test("saltedJoin spreads a hot key over multiple salt buckets") {
    val big = (1 to 1000).map(_ => (1L, "x")).toDF("k", "v") // one key, all rows
    val salted = big.withColumn("_salt",
      pmod(xxhash64(big.columns.map(col).toIndexedSeq: _*), lit(8)).cast("int"))
    // constant rows hash identically; real rows differ — use distinct values
    val big2 = (1 to 1000).map(i => (1L, s"x$i")).toDF("k", "v")
    val salts = big2.withColumn("_salt",
      pmod(xxhash64(big2.columns.map(col).toIndexedSeq: _*), lit(8)).cast("int"))
      .select("_salt").distinct().count()
    assert(salts == 8)
  }

  test("twoPhaseAgg matches single-phase for algebraic aggregates") {
    val df = (1 to 300).map(i => (i % 3, i.toLong)).toDF("g", "v")
    val direct = rowsOf(df.groupBy("g").agg(sum("v").as("s"), count(lit(1)).as("c")))
    val twoPhase = rowsOf(Skew.twoPhaseAgg(df, Seq("g"), factor = 4,
      phase1 = Seq(sum("v").as("ps"), count(lit(1)).as("pc")),
      phase2 = Seq(sum("ps").as("s"), sum("pc").as("c"))))
    assert(twoPhase == direct)
  }
}
