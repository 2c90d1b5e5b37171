package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Explicit Bloom-filter runtime pruning for fact⋈dim joins — the
 * pattern behind engine-internal runtime filters (Spark's own
 * `runtimeFilter.bloomFilter`, openGauss's hash-filter pushdown),
 * surfaced as an operator so a pipeline can prune a 100 TB fact scan
 * BEFORE the shuffle when the optimizer doesn't.
 *
 * Shape: one pass over the (small) dim side builds a Bloom filter
 * (mergeable bit-OR partials — insertion order can't matter), the
 * filter broadcasts (~MBs for 1e8 keys at 1% fpp vs the dim itself),
 * and the fact side drops definite-non-matches map-side. Correctness
 * does not depend on the filter: Bloom has NO false negatives, and a
 * verifying semi-join runs after the prune — the filter only cuts
 * shuffle volume, so the result provably equals the plain semi-join
 * (which is exactly what the gate checks).
 *
 * The probe is a broadcast-variable UDF — the same justified trade as
 * IVF's broadcast-centroid routing (a codegen'd literal of the filter
 * bits would bloat the plan by the filter size).
 */
object BloomJoin {

  /** Fact rows whose `factKey` appears in `dim.dimKey` — a semi-join
    * with a Bloom pre-prune on the fact side. `expectedItems`/`fpp`
    * size the filter (defaults suit a ≤1e7-key dim). */
  def prunedSemiJoin(fact: DataFrame, factKey: String, dim: DataFrame,
      dimKey: String, expectedItems: Long = 1000000L,
      fpp: Double = 0.01): DataFrame = {
    import org.apache.spark.sql.types._
    // dim.stat.bloomFilter hashes the column's NATIVE type, so the probe
    // must dispatch on the same dtype: a long probe against a
    // string-built filter would hash differently (or null out on the
    // cast) and silently DROP matching fact rows — breaking the
    // no-false-negative guarantee. Integral keys probe via
    // mightContainLong; strings via mightContainString; anything else
    // fails loudly rather than corrupting.
    val keyType = fact.schema(factKey).dataType
    val dimType = dim.schema(dimKey).dataType
    require(keyType == dimType,
      s"prunedSemiJoin key dtypes differ: $factKey is $keyType, $dimKey is $dimType")
    val integral = keyType match {
      case ByteType | ShortType | IntegerType | LongType => true
      case StringType => false
      case t => throw new IllegalArgumentException(
        s"prunedSemiJoin supports integral or string keys, got $t for $factKey")
    }
    val bf = dim.stat.bloomFilter(dimKey, expectedItems, fpp)
    val bc = fact.sparkSession.sparkContext.broadcast(bf)
    val pruned =
      if (integral) {
        val mightContain =
          udf((k: java.lang.Long) => k != null && bc.value.mightContainLong(k))
        fact.filter(mightContain(col(factKey).cast("long")))
      } else {
        val mightContain =
          udf((k: String) => k != null && bc.value.mightContainString(k))
        fact.filter(mightContain(col(factKey)))
      }
    pruned.join(dim.select(col(dimKey)), col(factKey) === col(dimKey), "left_semi")
  }
}
