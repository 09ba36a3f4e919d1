package graft

import org.apache.spark.sql.DataFrame

/** Session-scoped registry for caches created inside lazily-returned
  * query DataFrames. `DataFrame.cache()` goes through the CacheManager,
  * which holds a strong reference until `unpersist` — so a cache created
  * while BUILDING a query (e.g. q86's late-lineitem set, q80's recursive
  * scan) would otherwise live for the whole 108-query bench/verify
  * session and accumulate memory pressure. Query builders `track` such
  * frames; Bench/Verify call `drain()` after each query's terminal
  * action, bounding cached blocks to one query's working set.
  *
  * Deliberately NOT used for `HealthcareQueries.perSession` (a
  * cross-query memo by design) or for operator-internal caches whose
  * callers already unpersist in `finally` (Lakehouse, StreamingEtl).
  */
object CacheScope {
  private val live = new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]()

  /** Register a just-cached frame for end-of-query cleanup. Returns it. */
  def track(df: DataFrame): DataFrame = { live.add(df); df }

  /** Unpersist every tracked frame (non-blocking). Safe to call when
    * empty; safe if the frame was never materialized. */
  def drain(): Unit = {
    var df = live.poll()
    while (df != null) { df.unpersist(blocking = false); df = live.poll() }
  }
}
