package graft

import graft.operators.Skew
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("salted join equals plain join on skewed data") {
    // 90% of fact rows share one hot key
    val fact = (1 to 10000).map(i => (if (i % 10 == 0) i.toLong % 100 else 7L, i))
      .toDF("k", "v")
    val dim = (0L to 99L).map(k => (k, s"dim_$k")).toDF("dk", "name")

    val plain = fact.join(dim, $"k" === $"dk")
      .agg(count(lit(1)), sum($"v")).as[(Long, Long)].head()
    val salted = Skew.saltedJoin(fact, dim, "k", "dk", salts = 8)
      .agg(count(lit(1)), sum($"v")).as[(Long, Long)].head()
    assert(salted == plain)

    // the salt column spreads the hot key across partitions
    val spread = Skew.saltedJoin(fact, dim, "k", "dk", 8)
      .filter($"k" === 7L).count()
    assert(spread == fact.filter($"k" === 7L).count())
  }

  test("salt is a pure function of the input set, not partition layout") {
    // monotonically_increasing_id-derived salts differ run-to-run with
    // partition layout; the whole-row-hash salt must not: the same rows
    // under three different layouts get byte-identical salt assignments
    val fact = (1 to 5000).map(i => (if (i % 10 == 0) i.toLong % 100 else 7L, i))
      .toDF("k", "v")
    def salts(df: org.apache.spark.sql.DataFrame): Seq[(Long, Int, Int)] =
      df.withColumn("_s", Skew.saltColumn(df, 8))
        .select($"k", $"v", $"_s").as[(Long, Int, Int)]
        .collect().toSeq.sorted
    val base = salts(fact)
    assert(salts(fact.repartition(17)) == base)
    assert(salts(fact.repartition(1)) == base)
    // and the salt actually SPREADS the hot key across sub-keys
    val hotSalts = base.filter(_._1 == 7L).map(_._3).distinct
    assert(hotSalts.size > 1, s"hot key not spread: $hotSalts")
  }
}
