package graft

import org.apache.spark.sql.DataFrame

/** Registry of frames persisted INSIDE operator builders (today: the
  * sign-LSH band frame in `Ann.lshTopkFrom` / `Dedup.embeddingPairs`,
  * which feeds both sides of a candidate join and would otherwise be
  * recomputed per side).
  *
  * A builder-internal `persist()` has no natural unpersist point —
  * the builder returns a lazy frame and only the CALLER knows when
  * the terminal action has run — so a long-lived session invoking
  * those builders over many inputs would accumulate cache entries for
  * its lifetime. This object is the release path: builders persist
  * via [[persistTracked]], and harnesses call [[release]] after each
  * terminal action (`Verify` after each query dump, `Bench` before
  * each timed run so every measurement is a cold full execution).
  *
  * Scope: the registry is PROCESS-GLOBAL and release() drains all of
  * it — the contract is one harness owning the session's cache
  * lifecycle at a time (Verify, Bench, a driver job). Concurrent
  * independent queries in a shared long-lived session should not
  * interleave release() calls: one caller's release would unpersist
  * another's in-flight band frame (correct, Spark recomputes, but the
  * persist's savings are lost). Such a service should persist and
  * unpersist per-request frames itself.
  */
object Caches {
  private val tracked = new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]()

  /** Persist `df` and remember it for the next [[release]]. */
  private[graft] def persistTracked(df: DataFrame): DataFrame = {
    tracked.add(df.persist())
    df
  }

  /** Unpersist every tracked frame; returns how many were released.
    * Safe to call at any time — unpersisting a frame that was never
    * materialised (or already evicted) is a no-op in Spark. */
  def release(): Int = {
    var n = 0
    var df = tracked.poll()
    while (df != null) {
      df.unpersist(blocking = false)
      n += 1
      df = tracked.poll()
    }
    n
  }
}
