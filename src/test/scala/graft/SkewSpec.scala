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
}
