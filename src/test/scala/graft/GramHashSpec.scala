package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Bridge

/**
 * The compiled gram-hash kernels agree with Spark's own multi-child
 * xxhash64 chaining — the property that lets their keys join against
 * any xxhash64-keyed table — and with each other.
 */
class GramHashSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq("the quick brown fox", "a b", "one", "",
    "x  y", "Spark SPARK spark").toDF("text")

  test("GramKeyHashes(n) == xxhash64 over the n split tokens") {
    for (n <- 1 to 3) {
      val toks = split(lower(col("text")), " ")
      val viaHof = when(size(toks) >= n,
        transform(sequence(lit(1), size(toks) - (n - 1)), i =>
          xxhash64((0 until n).map(k => element_at(toks, i + k)): _*)))
        .otherwise(array().cast("array<bigint>"))
      val mine = Bridge.column(
        graft.functions.GramKeyHashes(Bridge.expression(col("text")), n))
      val bad = docs.select(viaHof.as("a"), mine.as("b"))
        .filter(col("a") =!= col("b")).count()
      assert(bad == 0, s"GramKeyHashes($n) diverges from xxhash64 chaining")
    }
  }

  test("TrigramProbeHashes and TaggedGramHashes agree with GramKeyHashes") {
    def arr(n: Int) = Bridge.column(
      graft.functions.GramKeyHashes(Bridge.expression(col("text")), n))
    val probe = Bridge.column(
      graft.functions.TrigramProbeHashes(Bridge.expression(col("text"))))
    val d2 = docs.select(probe.as("p"), arr(3).as("g3"), arr(2).as("g2"),
      arr(1).as("g1"))
    assert(d2.filter(expr("transform(p, x -> x.h123)") =!= col("g3")).count() == 0)
    // aligned lookups: h12 = bigram at i, h23 = bigram at i+1,
    // h2/h3 = unigrams at i+1 / i+2
    assert(d2.filter(expr("transform(p, (x, i) -> x.h12)") =!=
      expr("slice(g2, 1, greatest(size(g2) - 1, 0))")).count() == 0)
    assert(d2.filter(expr("transform(p, (x, i) -> x.h23)") =!=
      expr("slice(g2, 2, greatest(size(g2) - 1, 0))")).count() == 0)
    val tagged = Bridge.column(
      graft.functions.TaggedGramHashes(Bridge.expression(col("text"))))
    val d3 = docs.select(tagged.as("t"), arr(1).as("g1"), arr(2).as("g2"),
      arr(3).as("g3"))
    for (n <- 1 to 3)
      assert(d3.filter(
        expr(s"transform(filter(t, x -> x.cls = $n), x -> x.h)") =!=
          col(s"g$n")).count() == 0, s"TaggedGramHashes class $n diverges")
  }
}
