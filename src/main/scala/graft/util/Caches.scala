package graft.util

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session-lifetime ownership for every `.persist()` the library takes
  * (round-7 verdict item 3: each persist needs an explicit release path).
  *
  * The library persists small derived relations whose reuse ACROSS queries
  * is load-bearing — d03's MinHash signatures are rebuilt for free by d05
  * because the CacheManager dedups by canonicalized plan — so the persists
  * cannot be scoped `try/finally` inside the operator that takes them: the
  * returned DataFrame is lazy, and the cache must still be alive when the
  * caller finally runs an action, plus for every LATER query that re-derives
  * the same plan. What was missing is the other end of the lifetime: in a
  * long-lived session the tokenized-text cache (full corpus × token arrays)
  * would stay resident forever with no eviction hook.
  *
  * `retain` is therefore the ONLY way library code persists: it registers
  * the frame here, and [[releaseAll]] is the owner's hook — called by
  * Bench/Verify after their run, and by any embedding application when a
  * corpus goes out of scope. Unpersist is non-blocking (Spark drops blocks
  * asynchronously) and idempotent, so releasing twice or releasing frames
  * whose plan was cache-deduped is safe.
  */
object Caches {
  private val retained = ArrayBuffer.empty[DataFrame]

  /** Persist `df` (default MEMORY_AND_DISK) and register it for release. */
  def retain(df: DataFrame): DataFrame = synchronized {
    df.persist()
    retained += df
    df
  }

  /** Release every retained cache. Safe at any time: queries re-derive
    * dropped caches from source on next use (slower, never wrong).
    */
  def releaseAll(): Unit = synchronized {
    retained.foreach(df => try df.unpersist(blocking = false)
      catch { case _: Throwable => () }) // session may already be stopped
    retained.clear()
  }

  def retainedCount: Int = synchronized(retained.size)

  /** True iff the session has no cached plans left (spec hook). */
  def noneCached(s: SparkSession): Boolean =
    s.sharedState.cacheManager.isEmpty
}
