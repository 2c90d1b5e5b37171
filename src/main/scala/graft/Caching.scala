package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/**
 * Idempotent cache: operators that cache a derived index (signatures,
 * shingle sets) are re-invoked with plan-identical inputs across bench
 * runs and notebook cells; a bare `.cache()` then asks the CacheManager
 * to re-register the same plan — a warning and a wasted lookup per
 * call. Checking `storageLevel` first (a CacheManager lookup by plan)
 * makes the operation a clean no-op on the already-cached path.
 */
object Caching {
  def ensureCached(df: DataFrame): DataFrame =
    if (df.storageLevel == StorageLevel.NONE) df.cache() else df
}
