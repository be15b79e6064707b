package graft

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.Dataset

/** Release hook for frames the composed dedup operators persist PAST
  * their own return: the removed-id sets stay cached because the
  * caller's anti-join action has not run yet when the operator
  * returns, so the operator cannot unpersist them itself. A short-
  * lived job never notices; a long-lived session (a bench loop, a
  * notebook, a streaming driver) accumulates one small id-frame per
  * operator call unless it drains them.
  *
  * Contract: every such persist is registered here at creation;
  * callers owning long sessions call [[release]] after their action
  * completes (Bench does, between reps). Releasing is always safe —
  * an unpersisted frame recomputes if referenced again — so the hook
  * trades at worst recompute for bounded executor storage.
  */
object CacheRegistry {
  private val tracked = new ConcurrentLinkedQueue[Dataset[_]]()

  /** Register a persisted frame for later [[release]]; returns it. */
  private[graft] def track[T](ds: Dataset[T]): Dataset[T] = {
    tracked.add(ds)
    ds
  }

  /** Unpersist every tracked frame (non-blocking) and clear the
    * registry. Idempotent; concurrent-safe. */
  def release(): Unit = {
    var d = tracked.poll()
    while (d != null) {
      d.unpersist(blocking = false)
      d = tracked.poll()
    }
  }

  /** Frames currently awaiting release — observability for specs. */
  def pending: Int = tracked.size
}
