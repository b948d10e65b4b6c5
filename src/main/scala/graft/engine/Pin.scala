package graft.engine

import org.apache.spark.sql.Dataset
import org.apache.spark.storage.StorageLevel

/** The engine's ONE eager-materialization primitive — every "compute
  * this intermediate once, reuse it everywhere" site goes through
  * [[Pinnable.pinned]] instead of calling `localCheckpoint(true)`
  * directly, so the materialization STRATEGY is a session conf, not 25
  * scattered decisions:
  *
  *   - `spark.graft.pin.mode=localCheckpoint` (default): eager
  *     `localCheckpoint(true)` — fastest locally (blocks land on
  *     executor-local disk, lineage truncated so iterative consumers
  *     never re-derive the subtree; PERF.md finding 9).
  *   - `spark.graft.pin.mode=persist`: eager
  *     `persist(MEMORY_AND_DISK)` — same reuse semantics, but lineage
  *     is KEPT, so on a real cluster a lost executor's blocks are
  *     recomputed and the job survives. Local-checkpointed blocks die
  *     with their executor (Spark fails the job rather than silently
  *     recomputing a truncated lineage) — on a 1000-executor run with
  *     routine churn, `persist` is the right setting; the conf flips
  *     all sites at once.
  *
  * Both modes materialize EAGERLY (a count action) — callers rely on
  * "pinned frames are computed exactly once, before first reuse" for
  * determinism under non-deterministic sources (e.g. the merge-source
  * pin) and for consistent partition layouts (e.g. ExactRank's offsets
  * collect vs its join). The flip side of `persist`'s recoverability:
  * a recomputed block re-evaluates its lineage, so a NON-DETERMINISTIC
  * pinned source can differ after block loss — availability vs
  * pin-determinism is exactly the trade the conf expresses (Delta's
  * merge materialization makes the same choice with
  * `spark.databricks.delta.merge.materializeSource`).
  */
object Pin {

  val ModeKey = "spark.graft.pin.mode"

  implicit final class Pinnable[T](private val ds: Dataset[T])
      extends AnyVal {
    def pinned: Dataset[T] =
      ds.sparkSession.conf.get(Pin.ModeKey, "localCheckpoint") match {
        case "localCheckpoint" => ds.localCheckpoint(true)
        case "persist" =>
          val d = ds.persist(StorageLevel.MEMORY_AND_DISK)
          d.count() // eager, matching localCheckpoint(true)
          d
        case other => throw new IllegalArgumentException(
          s"${Pin.ModeKey} must be localCheckpoint or persist, " +
            s"got '$other'")
      }
  }
}
