package graft

import org.apache.spark.sql.types.{ArrayType, MapType, StructType}

/** Registry-wide output lint (the spec `Queries.scala` cites at the ql40
  * emission comment). Two invariants over EVERY registered query, checked
  * in one place so a violation fails loudly here instead of surfacing as a
  * driver-harness crash:
  *
  *   1. The query ANALYZES against the current testdata — `.schema` forces
  *      analysis, so a source-contract break (e.g. the events `ts`
  *      encoding changing under `Tables.loadEvents`) turns into one red
  *      test naming the query, not 14 absent correctness rows.
  *   2. No output column is Array/Map/Struct-typed: the driver's harness
  *      sorts the raw result frame with pandas before canonicalizing, and
  *      pandas cannot lexsort ndarray-valued cells — nested output must be
  *      emitted through `array_join`/`to_json` (the ql28/ql40 convention).
  *
  * Schema-only on purpose: analysis exercises the whole plan contract
  * (sources, column resolution, expression typing) without executing 112
  * queries' jobs, so the lint stays cheap enough to run in every suite
  * pass. A handful of query BUILDERS run bounded driver-side jobs while
  * constructing the frame (IVF training, prefix totals); those run at
  * sf0.001 here and are already exercised by their own specs.
  */
class QueryOutputLintSpec extends SparkSpec {

  /** Queries allowed nested output columns. Empty today — additions need a
    * matching driver-side story for how the harness sorts the column.
    */
  private val nestedWhitelist: Map[String, Set[String]] = Map.empty

  test("every registered query analyzes and emits only scalar columns") {
    val failures = Queries.all.toSeq.sortBy(_._1).flatMap { case (name, q) =>
      val analyzed =
        try Right(q(spark, sf).schema)
        catch { case e: Exception => Left(s"$name: fails analysis: ${e.getMessage}") }
      analyzed match {
        case Left(err) => Seq(err)
        case Right(schema) =>
          val allowed = nestedWhitelist.getOrElse(name, Set.empty)
          schema.fields.collect {
            case f if !allowed.contains(f.name) && (f.dataType match {
              case _: ArrayType | _: MapType | _: StructType => true
              case _ => false
            }) =>
              s"$name: nested output column `${f.name}: ${f.dataType.simpleString}` " +
                "(emit via array_join/to_json — the driver sorts raw frames with pandas)"
          }
      }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("registry, oracle map, and Verify agree on the query-name universe") {
    // every oracle row must point at a registered query; queries without an
    // oracle row are the documented rows-only set
    val orphanOracles = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphanOracles.isEmpty, s"oracle SQL without a query: $orphanOracles")
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(rowsOnly.subsetOf(Set("ql50_pretrain_pipeline", "qx6_approx_distinct")),
      s"new rows-only queries need either an oracle or a documented waiver: " +
        (rowsOnly -- Set("ql50_pretrain_pipeline", "qx6_approx_distinct")))
  }
}
