package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, XxHash64}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

/**
 * Explicit Bloom-filter runtime pruning for fact⋈dim joins — the
 * pattern behind engine-internal runtime filters (Spark's own
 * `runtimeFilter.bloomFilter`, openGauss's hash-filter pushdown),
 * surfaced as an operator so a pipeline can prune a 100 TB fact scan
 * BEFORE the shuffle when the optimizer doesn't.
 *
 * Shape: one pass over the (small) dim side builds a Bloom filter
 * (mergeable bit-OR partials — insertion order can't matter), the
 * serialized bits ride the fact stage's ONE broadcast task binary
 * (~MBs for 1e8 keys at 1% fpp vs the dim itself), and the fact side
 * drops definite-non-matches map-side. Correctness does not depend on
 * the filter: Bloom has NO false negatives, and a verifying semi-join
 * runs after the prune — the filter only cuts shuffle volume, so the
 * result provably equals the plain semi-join (which is exactly what
 * the gate checks).
 *
 * Build and probe are Spark's OWN runtime-filter expressions — the
 * exact pair `InjectRuntimeFilter` plants (`BloomFilterAggregate`
 * over `xxhash64(key)` on the build side, `BloomFilterMightContain`
 * over `xxhash64(key)` on the probe side), so the hot map-side filter
 * is a codegen'd static call on unboxed longs, not a boxed ScalaUDF.
 * Both sides hash the key's NATIVE type (xxhash64 is typed: INT 7
 * and BIGINT 7 hash differently), which the dtype-equality guard
 * below makes consistent by construction.
 */
object BloomJoin {

  /** Fact rows whose `factKey` appears in `dim.dimKey` — a semi-join
    * with a Bloom pre-prune on the fact side. `expectedItems`/`fpp`
    * size the filter (defaults suit a ≤1e7-key dim). */
  def prunedSemiJoin(fact: DataFrame, factKey: String, dim: DataFrame,
      dimKey: String, expectedItems: Long = 1000000L,
      fpp: Double = 0.01): DataFrame = {
    val keyType = fact.schema(factKey).dataType
    val dimType = dim.schema(dimKey).dataType
    require(keyType == dimType,
      s"prunedSemiJoin key dtypes differ: $factKey is $keyType, $dimKey is $dimType")
    keyType match {
      case ByteType | ShortType | IntegerType | LongType | StringType => ()
      case t => throw new IllegalArgumentException(
        s"prunedSemiJoin supports integral or string keys, got $t for $factKey")
    }
    val numBits = org.apache.spark.util.sketch.BloomFilter
      .optimalNumOfBits(expectedItems, fpp)
    val buildAgg = new BloomFilterAggregate(
      new XxHash64(Seq(Bridge.expression(dim(dimKey)))),
      Literal(expectedItems), Literal(numBits)).toAggregateExpression()
    val bits = dim.filter(col(dimKey).isNotNull)
      .select(Bridge.column(buildAgg).as("bf"))
      .head().getAs[Array[Byte]](0)
    val probe = BloomFilterMightContain(
      Literal(bits, BinaryType),
      new XxHash64(Seq(Bridge.expression(fact(factKey)))))
    // might_contain(null-hash) is null → filter drops null fact keys,
    // same as the semi-join would
    val pruned = fact.filter(Bridge.column(probe))
    pruned.join(dim.select(col(dimKey)), col(factKey) === col(dimKey), "left_semi")
  }
}
