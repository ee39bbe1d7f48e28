package graft.runtime

import graft.core.Stage
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}

/** SQL-facing entry: lets `spark.sql` users query pipeline outputs and the
  * engine's native functions without touching the Stage API.
  *
  *  - [[install]] registers the native function vocabulary
  *    (`cosine_similarity`, `dot_product`, `explode_ngrams`,
  *    `nfc_normalize`, signature functions, `psl_domain`, `pii_scrub`)
  *    on a session — same registrations
  *    [[graft.functions.GraftExtensions]] injects when configured via
  *    `spark.sql.extensions`.
  *  - [[view]] publishes a stage's output over an input as a temp view —
  *    the plan stays lazy (a view is a named logical plan, nothing runs
  *    until queried), so SQL over a pipeline costs the same as the
  *    DataFrame form.
  *  - [[registerTables]] exposes the canonical parquet tables as views.
  *  - [[sql]] is `spark.sql` with the vocabulary guaranteed installed.
  */
object GraftSql {

  def install(spark: SparkSession): Unit = {
    graft.functions.Native.register(spark)
    graft.functions.Generators.register(spark)
    graft.functions.TextNorm.register(spark)
    graft.functions.Psl.register(spark)
    graft.llm.TextAnalysis.registerSql(spark)
  }

  /** Publish a pipeline stage's output as a queryable temp view. */
  def view(name: String, stage: Stage, input: DataFrame): Unit =
    stage(input).createOrReplaceTempView(name)

  /** Publish a DataFrame as a queryable temp view. */
  def view(name: String, df: DataFrame): Unit =
    df.createOrReplaceTempView(name)

  /** Expose the canonical tables of `dir` as temp views (nanos-safe). */
  def registerTables(spark: SparkSession, dir: String): Unit =
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events", "documents", "embeddings")
      .foreach(t => Tables.load(spark, dir, t).createOrReplaceTempView(t))

  def sql(spark: SparkSession, query: String): DataFrame = {
    install(spark)
    spark.sql(query)
  }
}
