package graft

import graft.operators.BloomJoin
import org.apache.spark.sql.functions._

class BloomJoinSpec extends SparkSpec {
  import spark.implicits._

  test("pruned semi-join equals plain semi-join on long keys") {
    val fact = (1L to 5000L).map(i => (i % 997, i)).toDF("fk", "v")
    val dim = (0L to 996L by 3).toDF("dk")
    val plain = fact.join(dim, $"fk" === $"dk", "left_semi")
      .agg(count(lit(1)), sum($"v")).as[(Long, Long)].head()
    val pruned = BloomJoin.prunedSemiJoin(fact, "fk", dim, "dk",
        expectedItems = 1000L)
      .agg(count(lit(1)), sum($"v")).as[(Long, Long)].head()
    assert(pruned == plain)
  }

  test("pruned semi-join equals plain semi-join on STRING keys") {
    // r9 ADVICE: the probe used to cast every key to long and call
    // mightContainLong against a filter built on the native type — for
    // string keys the cast nulls out and ALL matching rows were
    // silently dropped. The dtype-dispatched probe must not lose rows.
    val fact = (1 to 5000).map(i => (s"key_${i % 997}", i)).toDF("fk", "v")
    val dim = (0 to 996 by 3).map(i => s"key_$i").toDF("dk")
    val plain = fact.join(dim, $"fk" === $"dk", "left_semi")
      .agg(count(lit(1)), sum($"v")).as[(Long, Long)].head()
    val pruned = BloomJoin.prunedSemiJoin(fact, "fk", dim, "dk",
        expectedItems = 1000L)
      .agg(count(lit(1)), sum($"v")).as[(Long, Long)].head()
    assert(pruned == plain)
    assert(plain._1 > 0, "string-key semi-join matched nothing — bad fixture")
  }

  test("probe is Spark's codegen'd might_contain, not a boxed ScalaUDF") {
    // r13 VERDICT: the map-side hot filter ran as a boxed Scala UDF
    // outside codegen. The probe must be the catalyst runtime-filter
    // expression (BloomFilterMightContain over xxhash64), same pair
    // InjectRuntimeFilter plants. Real source (spark.range), not a
    // LocalRelation, so the Filter survives into the executed plan.
    val fact = spark.range(10000)
      .select((col("id") % 997).as("fk"), col("id").as("v"))
    val dim = spark.range(0, 997, 3).select(col("id").as("dk"))
    val df = BloomJoin.prunedSemiJoin(fact, "fk", dim, "dk",
      expectedItems = 1000L)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("might_contain"),
      "probe is no longer the catalyst runtime-filter expression")
    assert(p.contains("xxhash64"), "probe lost its typed xxhash64 key")
    assert(!p.contains("UDF"), "boxed ScalaUDF resurfaced in the probe")
  }

  test("mismatched or unsupported key dtypes fail loudly") {
    val fact = (1 to 100).map(i => (s"k$i", i)).toDF("fk", "v")
    val dimL = (1L to 50L).toDF("dk")
    intercept[IllegalArgumentException] {
      BloomJoin.prunedSemiJoin(fact, "fk", dimL, "dk")
    }
    val factD = (1 to 100).map(i => (i.toDouble, i)).toDF("fk", "v")
    val dimD = (1 to 50).map(_.toDouble).toDF("dk")
    intercept[IllegalArgumentException] {
      BloomJoin.prunedSemiJoin(factD, "fk", dimD, "dk")
    }
  }
}
