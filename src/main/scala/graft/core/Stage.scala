package graft.core

import org.apache.spark.sql.{DataFrame, Dataset, Encoder}

/** The one interface everything implements — the engine's `Chainable[T]`
  * (`api.go:423-428`: Process / Identity / Schema / Close re-expressed for
  * data-parallel tables).
  *
  * A Stage is a *lazy plan transformer*: `apply` only composes Catalyst
  * plans; no action runs until the caller executes one. That preserves the
  * reference's "constant overhead regardless of pipeline length" property
  * (`testing/benchmarks/performance.md:28-34`) — N stages still yield ONE
  * optimized query.
  */
trait Stage { self =>
  def id: StageId

  /** Compose this stage's plan onto `df`. Must be side-effect free and must
    * not trigger Spark actions.
    */
  def apply(df: DataFrame): DataFrame

  /** Descriptive pipeline topology (`schema.go:272-277` analog). */
  def plan: PlanNode = PlanNode(kind, id)

  protected def kind: String = getClass.getSimpleName.stripSuffix("$")

  /** Release resources (caches, streaming queries, sinks). Idempotent,
    * mirrors `sequence.go:332-347`.
    */
  def close(): Unit = ()

  /** Fluent composition: `a andThen b` is a 2-stage Sequence. */
  def andThen(next: Stage): Stage = new Stage {
    val id: StageId = StageId(s"${self.id.name}>>${next.id.name}")
    def apply(df: DataFrame): DataFrame = next(self(df))
    override def plan: PlanNode =
      PlanNode("Sequence", id, Seq(self.plan, next.plan))
    override def close(): Unit = { next.close(); self.close() }
  }
}

object Stage {

  /** Leaf stage from a plain function — the untyped escape hatch. */
  def apply(stageId: StageId)(f: DataFrame => DataFrame): Stage = new Stage {
    val id: StageId = stageId
    def apply(df: DataFrame): DataFrame = f(df)
  }

  def identity(name: String = "identity"): Stage = new Stage {
    val id: StageId = StageId(name)
    def apply(df: DataFrame): DataFrame = df
    override protected def kind: String = "Identity"
  }
}

/** Typed stage over `Dataset[A] => Dataset[B]` for users who want
  * compile-time row types (the reference is fully typed; we offer the typed
  * face where it helps and the `DataFrame` face where schemas are dynamic).
  */
trait TypedStage[A, B] { self =>
  def id: StageId
  def apply(ds: Dataset[A]): Dataset[B]

  def andThen[C](next: TypedStage[B, C]): TypedStage[A, C] =
    new TypedStage[A, C] {
      val id: StageId = StageId(s"${self.id.name}>>${next.id.name}")
      def apply(ds: Dataset[A]): Dataset[C] = next(self(ds))
    }
}

object TypedStage {
  def apply[A, B](stageId: StageId)(f: Dataset[A] => Dataset[B]): TypedStage[A, B] =
    new TypedStage[A, B] {
      val id: StageId = stageId
      def apply(ds: Dataset[A]): Dataset[B] = f(ds)
    }

  /** Lift a pure element function — reference `Transform` for typed rows.
    * Documented slow path: a Scala closure blocks codegen/pushdown; prefer
    * Column-expression stages.
    */
  def map[A, B: Encoder](stageId: StageId)(f: A => B): TypedStage[A, B] =
    apply(stageId)(_.map(f))
}
