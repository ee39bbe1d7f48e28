package graft.core

import java.util.UUID

/** Stable identity for a stage: shows up in plan exports, error paths and
  * signal payloads.
  *
  * Mirrors the reference's `Identity` (`api.go:371-386` — uuid, name,
  * description) but is a plain immutable value: Spark plans are immutable so
  * we never need identity-based runtime mutation bookkeeping.
  */
final case class StageId(
    name: String,
    description: String = "",
    uuid: UUID = UUID.randomUUID()
) {
  override def toString: String = name
}

object StageId {
  def apply(name: String): StageId = StageId(name, "")
}
