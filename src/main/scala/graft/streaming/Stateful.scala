package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues}

/** Custom stateful streaming operators (`SURVEY.md §2.3` StatefulStage):
  * `mapGroupsWithState` wrappers carrying explicit per-key state — the
  * data-parallel home of reference-style cross-call state (the breaker's
  * failure counts, the limiter's token level: `SURVEY.md §1.3`).
  *
  * State lives in the state store (checkpointable, partitioned by key);
  * nothing accumulates on the driver.
  */
object Stateful {

  /** Generic keyed fold: per key, state `S` evolves by `update` for every
    * batch of values; emits the updated state each trigger.
    */
  def keyedFold[K: Encoder, V, S: Encoder, O: Encoder](
      ds: Dataset[V], key: V => K, init: S, timeout: GroupStateTimeout = GroupStateTimeout.NoTimeout())(
      update: (S, Iterator[V]) => S)(
      emit: (K, S) => O)(implicit kvEnc: Encoder[(K, S)]): Dataset[O] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(key)
      .mapGroupsWithState[S, O](timeout) { (k: K, values: Iterator[V], state: GroupState[S]) =>
        val next = update(state.getOption.getOrElse(init), values)
        state.update(next)
        emit(k, next)
      }
  }

  /** Running per-key count — the canonical stateful example. */
  def runningCounts[V](ds: Dataset[V], key: V => Long): Dataset[(Long, Long)] = {
    import ds.sparkSession.implicits._
    keyedFold[Long, V, Long, (Long, Long)](ds, key, 0L) { (s, vs) =>
      s + vs.size
    } { (k, s) => (k, s) }
  }

  val updateMode: OutputMode = OutputMode.Update()

  /** First-seen filter on the `transformWithState` API (the arbitrary-state
    * successor to mapGroupsWithState): per key a ValueState flag with
    * optional TTL — each key's first row passes, later rows drop. This is
    * streaming exact dedup with BOUNDED state: TTL expiry caps the store
    * at (distinct keys per TTL window), the property that keeps it alive
    * at 100 TB/day key cardinalities where an unbounded "seen" set dies.
    *
    * Requires the RocksDB state store provider
    * (`spark.sql.streaming.stateStore.providerClass`).
    */
  final class FirstSeen[K, V](ttl: TTLConfig)
      extends StatefulProcessor[K, V, V] {
    @transient private var seen: org.apache.spark.sql.streaming.ValueState[Boolean] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      seen = getHandle.getValueState[Boolean]("seen", Encoders.scalaBoolean, ttl)

    override def handleInputRows(key: K, rows: Iterator[V],
                                 timers: TimerValues): Iterator[V] =
      if (seen.exists()) Iterator.empty
      else { seen.update(true); rows.take(1) }
  }

  /** Streaming exact dedup by `key` via [[FirstSeen]]. */
  def firstSeen[K: Encoder, V: Encoder](ds: Dataset[V], key: V => K,
                                        ttl: TTLConfig = TTLConfig.NONE): Dataset[V] =
    ds.groupByKey(key).transformWithState(
      new FirstSeen[K, V](ttl), TimeMode.None(), OutputMode.Update())

  /** Watermark-bounded streaming dedup over the given columns — the
    * built-in form when duplicates arrive within the watermark delay
    * (state evicts with the watermark; the TTL-free bounded alternative
    * to [[firstSeen]]).
    */
  def dedupWithinWatermark(ds: Dataset[org.apache.spark.sql.Row], tsCol: String,
                           delay: String, cols: Seq[String]): Dataset[org.apache.spark.sql.Row] =
    ds.withWatermark(tsCol, delay).dropDuplicatesWithinWatermark(cols)
}
