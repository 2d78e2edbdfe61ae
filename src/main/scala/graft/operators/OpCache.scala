package graft.operators

import org.apache.spark.sql.DataFrame

/**
 * Registry for operator-internal caches (the signature frames the
 * dedup/similarity operators persist because they are referenced by
 * several join sides of one plan).
 *
 * A library operator must not leak cached blocks into a long-lived
 * user session: every internal `.cache()` goes through [[cache]] so
 * the caller — or a loop harness like `graft.Verify`/`graft.Bench` —
 * can drop exactly these frames with [[releaseAll]] once the query's
 * terminal action has run. This is the caller-visible handle: it
 * releases ONLY operator-internal caches, never frames the user
 * cached themselves (unlike `spark.catalog.clearCache()`).
 *
 * The registry is PROCESS-wide (one JVM = one driver); applications
 * running multiple concurrent SparkSessions in a single JVM should
 * serialize releaseAll with their query boundaries.
 */
object OpCache {

  private val frames = new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]()

  /** Cache `df` and track it for later [[releaseAll]]. */
  def cache(df: DataFrame): DataFrame = {
    frames.add(df)
    df.cache()
  }

  /** Unpersist every tracked frame (blocking, so
    * `sparkContext.getPersistentRDDs` is empty on return when no
    * user-level caches exist) and clear the registry. */
  def releaseAll(): Unit = {
    var df = frames.poll()
    while (df != null) {
      df.unpersist(blocking = true)
      df = frames.poll()
    }
  }

  /** Number of currently tracked cached frames (for tests). */
  def trackedCount: Int = frames.size()
}
