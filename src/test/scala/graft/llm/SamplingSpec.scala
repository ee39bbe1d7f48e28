package graft.llm

import graft.SparkSpec
import graft.sources.Tables
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  test("hash sampling is deterministic and partitioning-independent") {
    val docs = Tables.load(spark, sf, "documents")
    val a = Sampling.hashSample(docs, "doc_id", 250).select("doc_id").as[Long].collect().sorted.toSeq
    val b = Sampling.hashSample(docs.repartition(13), "doc_id", 250)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(a == b) // identical rows regardless of partitioning
    val frac = a.size.toDouble / docs.count()
    assert(frac > 0.15 && frac < 0.35, s"~25% expected, got $frac")
  }

  test("hash sample rate scales with the keep threshold") {
    val docs = Tables.load(spark, sf, "documents")
    val small = Sampling.hashSample(docs, "doc_id", 100).count()
    val large = Sampling.hashSample(docs, "doc_id", 500).count()
    assert(small < large)
    // monotone containment: the 10% sample is a subset of the 50% one
    val smallIds = Sampling.hashSample(docs, "doc_id", 100).select("doc_id").as[Long].collect().toSet
    val largeIds = Sampling.hashSample(docs, "doc_id", 500).select("doc_id").as[Long].collect().toSet
    assert(smallIds.subsetOf(largeIds))
  }

  test("perGroup draws exactly n per group, deterministically") {
    val docs = Tables.load(spark, sf, "documents")
    val s1 = Sampling.perGroup(docs, Seq(col("lang")), "doc_id", 3)
    val counts = s1.groupBy("lang").agg(count(lit(1)).as("n"))
      .collect().map(_.getLong(1))
    assert(counts.forall(_ <= 3) && counts.exists(_ == 3))
    val s2 = Sampling.perGroup(docs.repartition(7), Seq(col("lang")), "doc_id", 3)
    assert(rowsOf(s1.select("doc_id")) == rowsOf(s2.select("doc_id")))
  }
}
