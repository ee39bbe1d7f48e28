package graft.sources

import graft.core.{Stage, StageId}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet sources over the oracle tables (`TESTDATA.md`). A source is just
  * a stage-graph entry point; reads stay fully declarative so Catalyst
  * pushes filters and prunes columns into the scan.
  */
object Tables {
  val all = Seq("region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, table: String): DataFrame = {
    if (table == "events") loadEvents(spark, sfDir)
    else spark.read.parquet(s"$sfDir/$table.parquet")
  }

  /** Coalesce toward ~`targetFileBytes` output files using the optimizer's
    * size estimate — the small-files guard before any write (thousands of
    * KB-sized parquet files destroy downstream scan planning). `coalesce`
    * (not `repartition`) so compaction itself adds NO shuffle; it only
    * ever reduces partition count.
    */
  def compactTo(df: DataFrame, targetFileBytes: Long): DataFrame = {
    require(targetFileBytes > 0)
    val est = df.queryExecution.optimizedPlan.stats.sizeInBytes
    // unknown stats default sizeInBytes to ~Long.MaxValue: BigInt→toLong→
    // toInt would wrap negative and make coalesce throw. Anything at or
    // past Int.MaxValue files means "stats unusable — don't compact",
    // which also skips the plan-to-RDD conversion for the partition guard.
    val fileCount = (est + targetFileBytes - 1) / targetFileBytes
    if (fileCount >= Int.MaxValue) df
    else {
      val files = fileCount.toInt.max(1)
      if (files < df.rdd.getNumPartitions) df.coalesce(files) else df
    }
  }

  /** `events.ts` has shipped in two physical encodings: parquet
    * TIMESTAMP(NANOS) — which the Spark scanner rejects outright
    * ([PARQUET_TYPE_ILLEGAL]) unless read as a raw nanos-since-epoch long
    * via `spark.sql.legacy.parquet.nanosAsLong` — and plain timestamp[us].
    * Branch on the type the scan actually produces and surface the SAME
    * two-column contract either way: a microsecond-precision `ts`
    * TimestampType column (for window/session operators) and an exact
    * `ts_ns` nanos long (for queries that must keep full precision for
    * oracle parity). Output column order is identical across branches so
    * positional consumers can't diverge by input encoding.
    */
  def loadEvents(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$sfDir/events.parquet")
    raw.schema("ts").dataType match {
      case LongType =>
        // TIMESTAMP(NANOS) read as ns-epoch long under the legacy flag.
        // Integer division: `/` would go through Double and ns-epoch values
        // (~1.7e18) exceed Double's 2^53 exact-integer range.
        raw.withColumnRenamed("ts", "ts_ns")
          .withColumn("ts", timestamp_micros(expr("ts_ns div 1000")))
      case TimestampType | TimestampNTZType =>
        // timestamp[us]; the scanner yields TIMESTAMP_NTZ for
        // non-UTC-adjusted files — cast to TimestampType (value-preserving
        // under the library's mandatory UTC session) so downstream window
        // arithmetic and unix_micros resolve.
        val t = raw.withColumn("ts", col("ts").cast(TimestampType))
        val withNs = t.withColumn("ts_ns", unix_micros(col("ts")) * lit(1000L))
        // replicate the long branch's order: ts_ns in ts's slot, ts last
        withNs.select((raw.columns.map(c =>
          if (c == "ts") col("ts_ns") else col(c)) :+ col("ts")): _*)
      case other =>
        // Anything else (string, int32, ...) is a corrupt file, not a third
        // encoding — fail loudly instead of letting a cast degrade to NULLs.
        throw new IllegalStateException(
          s"events.ts: unsupported physical type ${other.sql}; expected " +
          "TIMESTAMP(NANOS)-as-long (legacy flag) or timestamp[us]")
    }
  }
}

/** ParquetSource as a composable Stage (ignores its input frame). */
final case class ParquetSource(id: StageId, path: String) extends Stage {
  def apply(df: DataFrame): DataFrame = df.sparkSession.read.parquet(path)
}

object ParquetSource {
  def apply(path: String): ParquetSource = ParquetSource(StageId(s"parquet:$path"), path)
}

/** Parquet sink stage: writes and passes the frame through (Effect-like). */
final case class ParquetSink(id: StageId, path: String, mode: String = "overwrite")
    extends Stage {
  def apply(df: DataFrame): DataFrame = { df.write.mode(mode).parquet(path); df }
}

/** CSV source with explicit schema (schema inference is a full extra scan —
  * never at 100 TB).
  */
final case class CsvSource(id: StageId, path: String,
                           schema: org.apache.spark.sql.types.StructType,
                           header: Boolean = true) extends Stage {
  def apply(df: DataFrame): DataFrame =
    df.sparkSession.read.schema(schema).option("header", header.toString).csv(path)
}

/** JSON-lines source with explicit schema. */
final case class JsonSource(id: StageId, path: String,
                            schema: org.apache.spark.sql.types.StructType) extends Stage {
  def apply(df: DataFrame): DataFrame =
    df.sparkSession.read.schema(schema).json(path)
}

/** JSONL sink: one JSON object per line — the interchange format training
  * corpora actually ship in. Writes stay distributed (one file per
  * partition); pair with [[Tables.compactTo]] for the small-files guard.
  */
final case class JsonSink(id: StageId, path: String, mode: String = "overwrite")
    extends Stage {
  def apply(df: DataFrame): DataFrame = { df.write.mode(mode).json(path); df }
}

object JsonLines {
  /** JSONL source with the row-level ERROR CHANNEL attached: well-formed
    * lines parse against the EXPLICIT schema (inference is a full extra
    * scan — never at 100 TB); malformed lines become dead-letter rows
    * (`_err` non-null, msg carrying the raw line) instead of being
    * silently nulled or dropped — the P2 Apply error-channel contract
    * (reference `apply.go:44-55` analog) applied at the source boundary,
    * so `Handle`/`failFast` triage corrupt input like any other stage
    * failure.
    *
    * Deliberately a TEXT scan + `from_json` projection, not
    * `spark.read.json`: the raw-JSON file scan refuses plans whose
    * referenced columns reduce to the corrupt-record column
    * (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN — so
    * `df.filter(_err.isNotNull).count()`, the FIRST thing a dead-letter
    * consumer runs, would throw). Parsing as an expression over
    * `text` has no such restriction, costs the same single scan with the
    * same Jackson parse, and the raw line is the scan's own `value`
    * column — no duplicate-capture column needed.
    */
  def readWithErrors(spark: SparkSession, path: String,
                     schema: org.apache.spark.sql.types.StructType,
                     stage: String = "jsonl"): DataFrame = {
    import org.apache.spark.sql.functions._
    val corrupt = "_corrupt_line"
    val parsed = from_json(
      col("value"), schema.add(corrupt, org.apache.spark.sql.types.StringType),
      java.util.Map.of("mode", "PERMISSIVE", "columnNameOfCorruptRecord", corrupt))
    val errCol = graft.core.ErrorChannel.errValue(
      StageId(stage), concat(lit("malformed jsonl: "), col("value")))
    spark.read.text(path)
      .withColumn("_parsed", CsvLines.parseOnce(parsed))
      .withColumn(graft.core.ErrorChannel.ColName,
        when(col(s"_parsed.$corrupt").isNotNull || col("_parsed").isNull, errCol)
          .otherwise(lit(null).cast(graft.core.ErrorChannel.errType)))
      .select(schema.fieldNames.map(f => col(s"_parsed.$f").as(f)) :+
        col(graft.core.ErrorChannel.ColName): _*)
  }
}

/** CSV sink: the flat interchange format for scalar tables. Distributed
  * write (one file per partition); fields containing the separator/quote
  * are quoted by the writer. NOT for free-text columns that may embed the
  * record delimiter — a quoted newline spans lines, and the line-oriented
  * [[CsvLines.readWithErrors]] reader (by design: splittable at any byte
  * offset, the 100 TB property) would see two broken records. Ship
  * free-text as JSONL ([[JsonSink]], `\n` escaped) instead; the boundary
  * is spec-pinned.
  */
final case class CsvSink(id: StageId, path: String, mode: String = "overwrite",
                         header: Boolean = false, sep: String = ",")
    extends Stage {
  def apply(df: DataFrame): DataFrame = {
    df.write.mode(mode).option("header", header.toString).option("sep", sep).csv(path)
    df
  }
}

object CsvLines {
  /** Pin an expensive parse expression to ONE evaluation per row
    * (optimization round 22, guide §4.4 — the duplicated-evaluation
    * problem, here with a builtin instead of a UDF): consumers of the
    * error-channel readers immediately filter on `_err IS NULL`, and the
    * optimizer pushes that filter below the parse projection with the
    * full `from_csv`/`from_json` SUBSTITUTED into the Filter condition —
    * the qx13 plan showed the parse running 2–3× per line (twice in the
    * Filter, once in the field Project). Wrapping the parse in an
    * always-true nondeterministic guard (`monotonically_increasing_id()`
    * is never negative) blocks both predicate pushdown and project
    * collapse through the projection, so the parse evaluates exactly
    * once and every downstream reference is an attribute read. Value is
    * bit-identical — the guard never takes the null branch.
    */
  private[sources] def parseOnce(parsed: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    when(monotonically_increasing_id() >= 0, parsed)
  }

  /** CSV source with the row-level ERROR CHANNEL attached — the
    * [[JsonLines.readWithErrors]] contract for the other interchange
    * format tabular corpora ship in: well-formed lines parse against the
    * EXPLICIT schema (inference is a full extra scan — never at 100 TB);
    * malformed lines (token-count mismatch, unparsable numerics/dates)
    * become dead-letter rows (`_err` non-null, msg carrying the raw line
    * for replay) instead of being silently nulled or dropped.
    *
    * Same text-scan + `from_csv` projection design as JsonLines (one
    * scan, parse as an expression, no corrupt-column-only-query
    * restriction); line-oriented by construction, so every task parses
    * its own split — which is exactly why embedded-newline fields are
    * out of contract (see [[CsvSink]]).
    */
  def readWithErrors(spark: SparkSession, path: String,
                     schema: org.apache.spark.sql.types.StructType,
                     stage: String = "csv",
                     options: Map[String, String] = Map.empty): DataFrame = {
    import org.apache.spark.sql.functions._
    val corrupt = "_corrupt_line"
    val parsed = from_csv(
      col("value"), schema.add(corrupt, org.apache.spark.sql.types.StringType),
      options ++ Map("mode" -> "PERMISSIVE", "columnNameOfCorruptRecord" -> corrupt))
    val errCol = graft.core.ErrorChannel.errValue(
      StageId(stage), concat(lit("malformed csv: "), col("value")))
    spark.read.text(path)
      .withColumn("_parsed", parseOnce(parsed))
      .withColumn(graft.core.ErrorChannel.ColName,
        when(col(s"_parsed.$corrupt").isNotNull || col("_parsed").isNull, errCol)
          .otherwise(lit(null).cast(graft.core.ErrorChannel.errType)))
      .select(schema.fieldNames.map(f => col(s"_parsed.$f").as(f)) :+
        col(graft.core.ErrorChannel.ColName): _*)
  }
}

/** ORC source (columnar alternative to parquet; same pushdown/pruning). */
final case class OrcSource(id: StageId, path: String) extends Stage {
  def apply(df: DataFrame): DataFrame = df.sparkSession.read.orc(path)
}

object OrcSource {
  def apply(path: String): OrcSource = OrcSource(StageId(s"orc:$path"), path)
}

/** ORC sink stage: writes and passes the frame through. */
final case class OrcSink(id: StageId, path: String, mode: String = "overwrite")
    extends Stage {
  def apply(df: DataFrame): DataFrame = { df.write.mode(mode).orc(path); df }
}

/** Line-oriented text source: one row per line in column `value` — the
  * raw-corpus entry point before tokenization/quality filtering.
  */
final case class TextSource(id: StageId, path: String) extends Stage {
  def apply(df: DataFrame): DataFrame = df.sparkSession.read.text(path)
}

object TextSource {
  def apply(path: String): TextSource = TextSource(StageId(s"text:$path"), path)
}

object StreamSources {
  /** Synthetic rate source (rowsPerSecond ticks) — load/chaos testing. */
  def rate(spark: SparkSession, rowsPerSecond: Int): DataFrame =
    spark.readStream.format("rate").option("rowsPerSecond", rowsPerSecond).load()

  /** File stream source with mandatory schema + per-trigger admission cap —
    * the C12 RateLimiter analog at the source (`SURVEY.md §2.2`).
    */
  def files(spark: SparkSession, path: String,
            schema: org.apache.spark.sql.types.StructType,
            format: String = "parquet", maxFilesPerTrigger: Int = 0): DataFrame = {
    val r = spark.readStream.schema(schema).format(format)
    (if (maxFilesPerTrigger > 0) r.option("maxFilesPerTrigger", maxFilesPerTrigger) else r)
      .load(path)
  }
}

object Sinks {
  /** In-memory sink (tests / small previews): returns the started query;
    * read results from `spark.table(name)`.
    */
  def memory(df: DataFrame, name: String,
             outputMode: String = "append"): org.apache.spark.sql.streaming.StreamingQuery =
    df.writeStream.format("memory").queryName(name).outputMode(outputMode).start()

  /** Foreach-partition sink for batch frames: executor-side handler, no
    * driver collect (the Effect sink shape, `effect.go:36` analog).
    */
  def foreachPartitionSink(id: StageId)(handler: Iterator[org.apache.spark.sql.Row] => Unit): Stage =
    Stage(id) { df => df.foreachPartition(handler); df }

  /** Durable file sink: append-mode parquet with a checkpoint — the
    * exactly-once production sink (restart resumes from the checkpointed
    * offsets; the file sink's log makes output atomic per micro-batch).
    */
  def parquetStream(df: DataFrame, path: String, checkpoint: String,
                    partitionBy: Seq[String] = Nil): org.apache.spark.sql.streaming.StreamingQuery = {
    val w = df.writeStream.format("parquet")
      .option("path", path)
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).start()
  }

  /** Per-row ForeachWriter sink (the kafka/jdbc-producer shape): open a
    * connection per partition-epoch, process rows, close — runs entirely
    * on executors. Spark retries partitions, so `process` must be
    * idempotent or the target transactional, exactly like any ForeachWriter.
    */
  def foreachSink[T](df: org.apache.spark.sql.Dataset[T])(
      openFn: (Long, Long) => Boolean,
      processFn: T => Unit,
      closeFn: Throwable => Unit = _ => ()): org.apache.spark.sql.streaming.StreamingQuery =
    df.writeStream.foreach(new org.apache.spark.sql.ForeachWriter[T] {
      override def open(partitionId: Long, epochId: Long): Boolean = openFn(partitionId, epochId)
      override def process(value: T): Unit = processFn(value)
      override def close(errorOrNull: Throwable): Unit = closeFn(errorOrNull)
    }).start()

  /** Run a batch Stage per micro-batch (foreachBatch bridge): the whole
    * batch library — joins, enrich, dedup, error channel — applies to a
    * stream without reimplementation. `action` decides what to do with
    * each staged batch (write, upsert, ...).
    */
  def stagePerBatch(df: DataFrame, stage: Stage, checkpoint: String)(
      action: (DataFrame, Long) => Unit): org.apache.spark.sql.streaming.StreamingQuery =
    df.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch((batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        action(stage(batch.toDF()), id))
      .start()

  /** Streaming dead-letter queue: run a fallible stage per micro-batch and
    * route each batch's healthy rows and dead letters to separate sinks —
    * the end-to-end form of the engine's error channel under streaming
    * (bad records park durably instead of failing the query; the batch is
    * persisted so the stage computes once, not once per split).
    */
  def deadLetterSplit(df: DataFrame, stage: Stage, checkpoint: String,
      releaseAs: String = "err")(
      goodAction: (DataFrame, Long) => Unit)(
      deadAction: (DataFrame, Long) => Unit): org.apache.spark.sql.streaming.StreamingQuery =
    stagePerBatch(df, stage, checkpoint) { (staged, id) =>
      val cached = staged.persist()
      try {
        goodAction(graft.core.ErrorChannel.good(cached), id)
        deadAction(graft.core.ErrorChannel.release(
          graft.core.ErrorChannel.dead(cached), releaseAs), id)
      } finally cached.unpersist(blocking = false)
    }
}
