package graft.util

import org.apache.spark.sql.DataFrame

/** Cache registration that tolerates re-derived plans. */
object Caching {

  private val trackers = new ThreadLocal[List[DataFrame => Unit]] {
    override def initialValue: List[DataFrame => Unit] = Nil
  }

  /** Run `body` with `cb` observing every frame [[cacheOnce]] touches
    * on this thread (plan construction is driver-side and
    * single-threaded, so the scope is exact). This is how
    * [[graft.ops.Curation.curate]] takes ownership of the caches its
    * library calls create internally — near-dup signature frames,
    * bounded LSH buckets, LM model frames — so
    * `CurationResult.release()` can drop ALL of them, not only the
    * ones curate registered itself. Nested scopes all observe
    * (double-unpersist of the same frame is a no-op). */
  def tracking[A](cb: DataFrame => Unit)(body: => A): A = {
    trackers.set(cb :: trackers.get)
    try body finally trackers.set(trackers.get.tail)
  }

  /** Cache `df` unless an identical (canonicalized) plan is already
    * resident — `Dataset.storageLevel` consults the session
    * CacheManager, so re-deriving the same frame (bench reps, a second
    * query sharing a subplan, a no-output build rerun) reuses the
    * first derivation's InMemoryRelation instead of re-issuing
    * `cache()` (a no-op that logs `CacheManager: Asked to cache
    * already cached data` and re-analyzes the plan). Execution would
    * use the resident entry either way — CacheManager substitutes any
    * matching plan fragment — so this only skips the redundant
    * registration, never changes what runs. */
  def cacheOnce(df: DataFrame): DataFrame = {
    val c =
      if (df.storageLevel == org.apache.spark.storage.StorageLevel.NONE) df.cache()
      else df
    trackers.get.foreach(cb => cb(c))
    c
  }
}
