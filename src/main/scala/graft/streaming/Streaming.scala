package graft.streaming

import graft.core._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}

/** Streaming operator surface (`SURVEY.md §2.3` streaming rows).
  *
  * Everything is expressed on Structured Streaming DataFrames (micro-batch);
  * the same stages compose in batch mode — `window`/`session_window` are
  * ordinary grouping expressions — which is exactly how the Q-T1..T3
  * contract is verified: streaming replay after final watermark flush must
  * equal the batch run (`SURVEY.md §5.2`).
  *
  * Scale posture: windowed aggregations carry watermarks so state is
  * bounded; session windows shuffle once on (key); sliding windows expand
  * rows by (length/slide) in the map phase — partial aggregation happens
  * before the shuffle.
  */
object Windowed {

  /** Event-time watermark — late-data bound (`withWatermark`), the Timeout
    * analog of the reference (C10): rows later than `delay` are dropped
    * from stateful aggregation.
    */
  def watermark(name: String, tsCol: String, delay: String): Stage =
    Stage(StageId(name))(df =>
      if (df.isStreaming) df.withWatermark(tsCol, delay) else df)

  /** Tumbling event-time window aggregation. */
  def tumbling(name: String, ts: Column, width: String, keys: Seq[Column],
               aggs: Seq[Column]): Stage =
    Stage(StageId(name)) { df =>
      df.groupBy(window(ts, width) +: keys: _*).agg(aggs.head, aggs.tail: _*)
    }

  /** Sliding event-time window aggregation. */
  def sliding(name: String, ts: Column, width: String, slide: String,
              keys: Seq[Column], aggs: Seq[Column]): Stage =
    Stage(StageId(name)) { df =>
      df.groupBy(window(ts, width, slide) +: keys: _*).agg(aggs.head, aggs.tail: _*)
    }

  /** Session window (gap-based) aggregation. */
  def session(name: String, ts: Column, gap: String, keys: Seq[Column],
              aggs: Seq[Column]): Stage =
    Stage(StageId(name)) { df =>
      df.groupBy(session_window(ts, gap) +: keys: _*).agg(aggs.head, aggs.tail: _*)
    }

  /** Stream-stream INNER interval join: left rows pair with right rows of
    * the same key whose event time lies in [leftTime + lower, leftTime +
    * upper] (offsets are SQL interval strings, lower may be negative,
    * e.g. "-10 minutes" / "0 seconds"). Both inputs must carry watermarks
    * (the [[watermark]] stage) — the time bound plus the watermarks is
    * what lets Spark evict buffered rows instead of keeping both streams'
    * state forever, the thing that decides whether the join survives a
    * week of uptime. Same stage composes in batch (replay ≡ batch,
    * spec-verified).
    */
  def intervalJoin(name: String, right: DataFrame,
                   leftKey: Column, rightKey: Column,
                   leftTime: Column, rightTime: Column,
                   lower: String, upper: String): Stage =
    Stage(StageId(name)) { left =>
      left.join(right,
        leftKey === rightKey &&
          rightTime >= leftTime + expr(s"INTERVAL $lower") &&
          rightTime <= leftTime + expr(s"INTERVAL $upper"))
    }
}

/** Driver-side helpers for running streaming queries with the engine's
  * resilience combinators wrapped around micro-batches.
  */
object StreamRunner {

  /** foreachBatch sink whose per-batch body runs inside caller-supplied
    * wrappers (breaker, limiter, retry) — the job-tier composition point
    * for C12/C13 under streaming (`SURVEY.md §1.3`).
    */
  def guardedForeachBatch(
      writer: DataStreamWriter[org.apache.spark.sql.Row],
      guard: (=> Unit) => Unit
  )(body: (DataFrame, Long) => Unit): DataStreamWriter[org.apache.spark.sql.Row] =
    writer.foreachBatch { (batch: DataFrame, id: Long) =>
      guard(body(batch, id))
    }

  /** Ingestion throttling configs — the RateLimiter analog (C12) for
    * sources: bound what each trigger admits.
    */
  def throttled(reader: org.apache.spark.sql.streaming.DataStreamReader,
                maxFilesPerTrigger: Int): org.apache.spark.sql.streaming.DataStreamReader =
    reader.option("maxFilesPerTrigger", maxFilesPerTrigger)

  def processingTrigger(intervalMs: Long): Trigger = Trigger.ProcessingTime(intervalMs)

  /** Run to quiescence and stop (test/backfill helper). */
  def drain(q: StreamingQuery): Unit = {
    q.processAllAvailable()
    q.stop()
    q.awaitTermination()
  }
}
