package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

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
}
