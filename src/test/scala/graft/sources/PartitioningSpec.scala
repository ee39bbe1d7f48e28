package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** Partition-layout scale evidence: at 100 TB the difference between
  * scanning a partition and scanning the table is the whole game. These
  * specs pin that (a) static filters prune partition directories at plan
  * time and (b) a selective dim join prunes fact partitions at RUNTIME
  * (dynamic partition pruning) — both visible in the physical plan.
  */
class PartitioningSpec extends SparkSpec {
  import spark.implicits._

  private def writePartitioned(): String = {
    val dir = Files.createTempDirectory("part").toString
    Tables.load(spark, sf, "orders")
      .withColumn("o_year", year(col("o_orderdate")))
      .write.mode("overwrite").partitionBy("o_year").parquet(dir)
    dir
  }

  test("static partition pruning: the filter lands in PartitionFilters, not the scan") {
    val dir = writePartitioned()
    val pruned = spark.read.parquet(dir).filter(col("o_year") === 1995)
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      "PartitionFilters: \\[[^\\]]*o_year[^\\]]*\\]".r.findFirstIn(plan).isDefined,
      s"o_year filter did not become a partition filter:\n${plan.take(800)}")
    val years = pruned.select("o_year").distinct().as[Int].collect().toSeq
    assert(years == Seq(1995))
  }

  test("a downstream Where pushes through an unscoped Filter stage to the scan") {
    // the Filter fast path is pure projection; with row observation now
    // scope-gated there is no CollectMetrics barrier, so a later selective
    // predicate must reach the parquet source as a pushed filter
    val dir = writePartitioned()
    val src = spark.read.parquet(dir)
    val staged = graft.combinators.Filter("f", col("o_totalprice") > 1000.0,
      graft.stages.Transform("t")("band" -> (col("o_totalprice") > 200000.0)))(src)
    val out = staged.filter(col("o_orderkey") === 42L)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("CollectMetrics"), s"unexpected barrier:\n${plan.take(600)}")
    assert("PushedFilters: \\[[^\\]]*o_orderkey[^\\]]*\\]".r.findFirstIn(plan).isDefined,
      s"o_orderkey predicate did not reach the scan:\n${plan.take(1200)}")
  }

  test("dynamic partition pruning: a selective dim join prunes fact partitions at runtime") {
    val dir = writePartitioned()
    val fact = spark.read.parquet(dir)
    // DPP wants a file-backed dim with a selective predicate (a local
    // relation constant-folds the filter away and the rule sees nothing)
    val dimDir = Files.createTempDirectory("dim").toString
    Seq((1995, "pick"), (1871, "skip"), (1900, "skip")).toDF("y", "tag")
      .write.mode("overwrite").parquet(dimDir)
    val dim = spark.read.parquet(dimDir).filter(col("tag") === "pick")
    val joined = fact.join(dim, fact("o_year") === dim("y"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"),
      s"expected a dynamicpruning subquery on the fact scan:\n${plan.take(800)}")
    assert(joined.count() ==
      fact.filter(col("o_year") === 1995).count())
  }
}
