package graft.util

import org.apache.spark.sql.DataFrame

/** Cache registration that tolerates re-derived plans. */
object Caching {

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
  def cacheOnce(df: DataFrame): DataFrame =
    if (df.storageLevel == org.apache.spark.storage.StorageLevel.NONE) df.cache() else df
}
