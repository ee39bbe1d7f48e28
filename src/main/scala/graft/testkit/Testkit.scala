package graft.testkit

import graft.core._
import org.apache.spark.sql.DataFrame

import java.util.concurrent.CopyOnWriteArrayList
import java.util.concurrent.atomic.AtomicInteger
import scala.jdk.CollectionConverters._

/** Test/chaos harness, shipped as library code like the reference's
  * `testing/helpers.go` — users build resilience tests against the engine
  * with the same tools the engine tests itself with.
  */

/** MockStage — configurable pass-through recorder
  * (`testing/helpers.go:38-175` MockProcessor analog): counts applications,
  * keeps a history of input schemas, optionally injects a fixed
  * transformation, an exception, or latency.
  */
final class MockStage(
    val id: StageId,
    result: DataFrame => DataFrame = identity,
    failWith: Option[Throwable] = None,
    delayMillis: Long = 0,
    clock: Clock = Clock.System
) extends Stage {
  private val calls = new AtomicInteger(0)
  private val history = new CopyOnWriteArrayList[Seq[String]]()

  def apply(df: DataFrame): DataFrame = {
    calls.incrementAndGet()
    history.add(df.columns.toSeq)
    if (delayMillis > 0) clock.sleep(delayMillis)
    failWith.foreach(t => throw t)
    result(df)
  }

  def callCount: Int = calls.get()
  def inputSchemas: Seq[Seq[String]] = history.asScala.toSeq
  def assertCalled(n: Int): Unit =
    assert(callCount == n, s"${id.name}: expected $n calls, got $callCount")
  def reset(): Unit = { calls.set(0); history.clear() }
}

object MockStage {
  def passthrough(name: String): MockStage = new MockStage(StageId(name))
  def failing(name: String, msg: String = "mock failure"): MockStage =
    new MockStage(StageId(name), failWith = Some(new RuntimeException(msg)))
}

/** ChaosStage — seeded fault injection (`testing/helpers.go:257-385`
  * ChaosProcessor analog): wraps a stage and fails at *apply* time with the
  * configured probability, or deterministically for the first
  * `failFirstN` applications (the Q-C8/9 transient-fault fixture, seed 42).
  */
final class ChaosStage(
    val id: StageId,
    inner: Stage,
    failureRate: Double = 0.0,
    failFirstN: Int = 0,
    latencyMillis: Long = 0,
    seed: Long = 42L,
    clock: Clock = Clock.System
) extends Stage {
  private val rng = new scala.util.Random(seed)
  private val calls = new AtomicInteger(0)

  def apply(df: DataFrame): DataFrame = {
    val n = calls.incrementAndGet()
    if (latencyMillis > 0) clock.sleep(latencyMillis)
    if (n <= failFirstN)
      throw new RuntimeException(s"${id.name}: injected transient fault #$n")
    if (failureRate > 0 && rng.nextDouble() < failureRate)
      throw new RuntimeException(s"${id.name}: injected random fault")
    inner(df)
  }

  def callCount: Int = calls.get()
  override def plan: PlanNode = PlanNode("Chaos", id, Seq(inner.plan))
  override def close(): Unit = inner.close()
}

object ChaosStage {
  def transient(name: String, inner: Stage, failFirstN: Int): ChaosStage =
    new ChaosStage(StageId(name), inner, failFirstN = failFirstN)
}
