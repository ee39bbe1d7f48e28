package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all suites (one JVM-wide session, local[4]). */
object TestSession {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-tests")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}

abstract class SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSession.spark
  lazy val sf: String = "/root/testdata/sf0.001"

  def rowsOf(df: DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq).toSet

  /** Asserts no float-array (embedding), int8-array, or raw-binary
    * (media bytes) column rides any shuffle in the executed plan — the
    * 100 TB contract for the similarity-search tails and the multimodal
    * operators: score/hash, project to narrow ids, THEN shuffle.
    */
  def assertNoEmbeddingInExchange(df: DataFrame): Unit = {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    import org.apache.spark.sql.types.{ArrayType, BinaryType, ByteType, FloatType}
    df.collect() // force execution so AQE finalizes the plan
    // AQE hides the final plan behind AdaptiveSparkPlanExec/QueryStageExec,
    // which TreeNode.collect does not descend into — walk them explicitly
    def walk(p: SparkPlan): Seq[SparkPlan] = {
      val inner = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec => Seq(q.plan)
        case other => other.children
      }
      p +: inner.flatMap(walk)
    }
    val exchanges = walk(df.queryExecution.executedPlan).collect {
      case e: ShuffleExchangeLike => e
    }
    assert(exchanges.nonEmpty, "expected at least one shuffle in the plan under test")
    exchanges.foreach { e =>
      val wide = e.output.filter {
        case a => a.dataType match {
          case ArrayType(FloatType, _) => true
          case ArrayType(ByteType, _) => true // int8-quantized embeddings
          // media payloads — but NOT ObjectHashAggregate's serialized
          // partial buffer ("buf"), which prints as binary and is bounded
          // by the aggregate's own semantics (e.g. dim structs per group
          // for the centroid collect_list), not a payload column
          case BinaryType => a.name != "buf"
          case _ => false
        }
      }
      assert(wide.isEmpty,
        s"embedding columns ${wide.map(_.name).mkString(",")} enter a shuffle:\n$e")
    }
  }
}
