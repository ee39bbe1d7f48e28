package graft.analytics

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BloomPruneSpec extends SparkSpec {
  import spark.implicits._

  private def fact = (1L to 10000L).map(i => (i, i % 97)).toDF("fk", "payload")
  private def dim = Seq((5L, "a"), (77L, "b"), (9000L, "c")).toDF("dk", "name")

  test("bloom-pruned join equals the unpruned join exactly") {
    val plain = fact.join(dim, col("fk") === col("dk")).select("fk", "name")
    val pruned = BloomPrune
      .prunedJoin("bp", dim, col("fk"), col("dk"), col("fk") === col("dk"),
        expectedItems = 100)(fact)
      .select("fk", "name")
    assert(rowsOf(pruned) == rowsOf(plain))
    assert(pruned.count() == 3)
  }

  test("pruning removes the vast majority of non-matching fact rows pre-join") {
    val kept = BloomPrune.prune(fact, col("fk"), dim, col("dk"), expectedItems = 100)
    val n = kept.count()
    // 3 true matches; fpp=3% of 10k ≈ 300 false positives worst case
    assert(n >= 3 && n <= 600, s"kept $n rows — filter not selective")
  }

  test("empty dimension prunes everything") {
    val empty = dim.filter(lit(false))
    assert(BloomPrune.prune(fact, col("fk"), empty, col("dk")).count() == 0)
  }

  test("re-applying a prunedJoin stage runs ONE dimension job, not one per apply") {
    var jobs = 0
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs += 1
    }
    val stage = BloomPrune.prunedJoin("bp2", dim, col("fk"), col("dk"),
      col("fk") === col("dk"), expectedItems = 100)
    spark.sparkContext.addSparkListener(listener)
    try {
      // listener events are async: wait until the count stabilizes
      def stable(): Int = {
        val deadline = System.currentTimeMillis + 10000
        var last = -1
        while (System.currentTimeMillis < deadline && jobs != last) {
          last = jobs; Thread.sleep(200)
        }
        jobs
      }
      stage(fact)                  // first apply builds the filter
      val afterFirst = stable()
      assert(afterFirst > 0, "filter build should run at least one job")
      stage(fact)                  // second apply must reuse the bytes
      assert(stable() == afterFirst,
        s"second apply launched new dimension jobs (was $afterFirst, now $jobs)")
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("outer-preserving join types are rejected") {
    val e = intercept[IllegalArgumentException] {
      BloomPrune.prunedJoin("bp3", dim, col("fk"), col("dk"),
        col("fk") === col("dk"), how = "left_outer")
    }
    assert(e.getMessage.contains("unmatched fact rows"))
    // semi and right_outer are accepted
    BloomPrune.prunedJoin("bp4", dim, col("fk"), col("dk"),
      col("fk") === col("dk"), how = "left_semi")
    BloomPrune.prunedJoin("bp5", dim, col("fk"), col("dk"),
      col("fk") === col("dk"), how = "right_outer")
  }

  test("the might_contain predicate sits on the fact scan (parquet-backed)") {
    // a local Seq relation is constant-folded by ConvertToLocalRelation,
    // so use the real parquet fact table to observe the filter placement
    val lineitem = graft.sources.Tables.load(spark, sf, "lineitem")
    val keys = Seq((1L, "x")).toDF("k", "v")
    val kept = BloomPrune.prune(lineitem, col("l_orderkey"), keys, col("k"),
      expectedItems = 10)
    val plan = kept.queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), s"filter missing from plan:\n$plan")
    assert(kept.count() > 0) // orderkey 1 exists at sf0.001
  }
}
