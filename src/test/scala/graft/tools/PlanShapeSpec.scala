package graft.tools

import graft.SparkSpec

/** The plan-regression gate: [[PlanAudit.shapes]] asserted against the
  * ACTUAL physical plans at sf0.001 (the same dir PlanAudit documents, so
  * join-strategy choices match PLANS.md). Counting is string-level over
  * `executedPlan.toString` — AQE prints the initial tree without
  * executing, and shuffle Exchanges print as `Exchange <partitioning>`
  * while `BroadcastExchange`/`ReusedExchange` are distinct tokens (the
  * FormatsSpec compactTo counter's convention).
  */
class PlanShapeSpec extends SparkSpec {

  private val shuffleLine = """(?m)^[\s+:*-]*Exchange """.r

  test("every audited plan shape holds: shuffle budget, required and forbidden operators") {
    val failures = PlanAudit.shapes.toSeq.sortBy(_._1).flatMap { case (name, shape) =>
      try {
        val plan = graft.SparkEntry.queries(name)(spark, sf)
          .queryExecution.executedPlan.toString
        val shuffles = shuffleLine.findAllIn(plan).size
        val over =
          if (shuffles > shape.maxShuffles)
            Seq(s"$name: $shuffles shuffles > budget ${shape.maxShuffles}")
          else Nil
        // scan budget: "FileScan parquet" occurrences — the ql63 class of
        // claim ("the expensive scan-riding projection runs at most N
        // times") machine-checked like the shuffle budget
        val scans = "FileScan parquet".r.findAllIn(plan).size
        val overScans =
          if (scans > shape.maxScans)
            Seq(s"$name: $scans parquet scans > budget ${shape.maxScans}")
          else Nil
        val missing = shape.require.filterNot(plan.contains)
          .map(op => s"$name: required operator $op absent")
        val present = shape.forbid.filter(plan.contains)
          .map(op => s"$name: forbidden operator $op present")
        over ++ overScans ++ missing ++ present
      } catch {
        case e: Exception => Seq(s"$name: failed to plan: ${e.getMessage}")
      }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("ql54's four static aggregation branches dedupe to ONE scan at runtime") {
    // the static plan prints four Generate+scan subtrees; the claim is
    // that AQE dedupes the identical bigram-count shuffle stages, so the
    // corpus is scanned ONCE and the other three branches read
    // ReusedExchange — assert on the finalized adaptive plan
    val df = graft.SparkEntry.queries("ql54_lm_estimate")(spark, sf)
    df.collect() // force execution so AQE finalizes and dedupes stages
    val finalPlan = df.queryExecution.executedPlan.toString
    val finalSection = finalPlan.split("== Initial Plan ==")(0)
    assert(finalSection.contains("isFinalPlan=true"))
    val scans = "FileScan parquet".r.findAllIn(finalSection).size
    val reused = "ReusedExchange".r.findAllIn(finalSection).size
    assert(scans == 1, s"expected ONE corpus scan in the final plan, got $scans")
    assert(reused >= 3, s"expected >=3 reused bigram-count stages, got $reused")
  }

  test("every shape key is a registered query with an audit claim") {
    val unknown = PlanAudit.shapes.keySet -- graft.SparkEntry.queries.keySet
    assert(unknown.isEmpty, s"shapes for unregistered queries: $unknown")
    val unclaimed = PlanAudit.shapes.keySet -- PlanAudit.audited.map(_._1).toSet
    assert(unclaimed.isEmpty,
      s"machine shapes need a matching prose claim in PlanAudit.audited: $unclaimed")
  }
}
