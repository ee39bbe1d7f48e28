package graft.stages

import graft.core._
import org.apache.spark.sql.{Dataset, Encoder}
import scala.util.control.NonFatal

/** Executor-side panic recovery for opaque user lambdas — the engine's
  * analog of the reference's per-Process panic guard (`error.go:156-170`):
  * a throwing row never kills the job; it degrades per the chosen policy.
  *
  * This is the documented *slow path* (closures block codegen/pushdown,
  * `SURVEY.md §4`): prefer Column-expression stages (`Apply` + `try_*`)
  * wherever the logic is expressible.
  */
object SafeLambda {

  /** Map with a recovery value per failing row (Enrich-style best-effort:
    * swallow, keep going — `enrich.go:44-47`).
    */
  def mapRecover[A, B: Encoder](id: StageId)(f: A => B)(recover: (A, Throwable) => B): TypedStage[A, B] =
    TypedStage(id)(_.map { a =>
      try f(a)
      catch { case NonFatal(t) => recover(a, t) }
    })

  /** Map splitting success/failure per row: returns Either-like pairs the
    * caller can route (Apply-style dead-lettering for lambdas). The error
    * message is sanitized before it rides along (`error.go:101-147`).
    */
  def mapEither[A, B](id: StageId)(f: A => B)(
      implicit enc: Encoder[(Option[B], Option[String])]): TypedStage[A, (Option[B], Option[String])] =
    TypedStage(id)(_.map { a =>
      try (Some(f(a)), None)
      catch { case NonFatal(t) => (None, Some(sanitize(t))) }
    })

  /** Sanitized failure message: exception class + first line, control
    * characters stripped, bounded length — no stack traces or payload
    * fragments leak into the error channel (`error.go:101-147` analog).
    */
  def sanitize(t: Throwable): String = {
    val raw = s"${t.getClass.getSimpleName}: ${Option(t.getMessage).getOrElse("")}"
    raw.takeWhile(_ != '\n').map(c => if (c < ' ') ' ' else c).take(256)
  }
}
