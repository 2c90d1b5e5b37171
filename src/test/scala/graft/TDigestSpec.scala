package graft

import graft.functions.{TDigest, TDigestBuffer}
import org.apache.spark.sql.functions._

/**
 * t-digest contracts: rank-error bound against the exact sorted order,
 * invariance of that bound under arbitrary repartitioning (mergeable
 * partials), and the flat serialize round-trip.
 */
class TDigestSpec extends SparkSpec {
  import spark.implicits._

  private val ps = Seq(0.25, 0.5, 0.75, 0.95, 0.99)

  /** |rank(estimate)/N - q| for each requested quantile. */
  private def rankErrors(values: Array[Double], est: Seq[Double]): Seq[Double] = {
    val sorted = values.sorted
    ps.zip(est).map { case (q, e) =>
      // rank = count of values <= estimate (upper bound rank)
      val r = {
        var idx = java.util.Arrays.binarySearch(sorted, e)
        if (idx < 0) idx = -idx - 1
        else { while (idx < sorted.length && sorted(idx) <= e) idx += 1 }
        idx
      }
      math.abs(r.toDouble / sorted.length - q)
    }
  }

  test("rank error <= 0.02 on uniform and heavy-tailed data") {
    val rnd = new scala.util.Random(7)
    val uniform = Array.fill(60000)(rnd.nextDouble() * 1000)
    val lognorm = Array.fill(60000)(math.exp(rnd.nextGaussian() * 2))
    for (data <- Seq(uniform, lognorm)) {
      val est = data.toSeq.toDF("v")
        .agg(TDigest.percentilesApprox(col("v"), ps).as("qs"))
        .select(explode(col("qs"))).as[Double].collect().toSeq
      val errs = rankErrors(data, est)
      assert(errs.forall(_ <= 0.02), s"rank errors $errs")
    }
  }

  test("bound holds under arbitrary repartitioning (mergeable partials)") {
    val rnd = new scala.util.Random(11)
    val data = Array.fill(50000)(rnd.nextGaussian() * 50 + 200)
    for (parts <- Seq(1, 7, 64)) {
      val est = data.toSeq.toDF("v").repartition(parts)
        .agg(TDigest.percentilesApprox(col("v"), ps).as("qs"))
        .select(explode(col("qs"))).as[Double].collect().toSeq
      val errs = rankErrors(data, est)
      assert(errs.forall(_ <= 0.02), s"parts=$parts rank errors $errs")
    }
  }

  test("misra-gries: frequent items survive any partitioning; two-pass topk exact") {
    import graft.functions.HeavyHitters
    // Zipfian stream with distinct >> k: item i has weight ~ 1/(i+1)
    val rnd = new scala.util.Random(13)
    val data = Array.fill(80000) {
      val r = rnd.nextDouble()
      // inverse-CDF-ish Zipf over 5000 items
      val i = math.min(4999, math.floor(math.exp(r * math.log(5000.0))).toLong - 1)
      s"item_$i"
    }
    val exact = data.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val top20 = exact.toSeq.sortBy { case (t, n) => (-n, t) }.take(20)
    for (parts <- Seq(1, 13)) {
      val toks = data.toSeq.toDF("tok").repartition(parts)
      val cands = toks.agg(HeavyHitters.sketch(col("tok"), 256).as("hh"))
        .select(explode(col("hh")).as("e")).select(col("e.item").as("tok"))
      val candSet = cands.as[String].collect().toSet
      assert(candSet.size <= 256)
      // guarantee: every item with freq > 2n/k is a candidate
      val mustHave = exact.filter(_._2 > 2.0 * data.length / 256).keySet
      assert(mustHave.subsetOf(candSet),
        s"parts=$parts missing=${mustHave -- candSet}")
      // the full two-pass query is EXACT
      val got = toks.join(broadcast(cands), Seq("tok"))
        .groupBy(col("tok")).agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("tok")).limit(20)
        .as[(String, Long)].collect().toSeq
      assert(got == top20, s"parts=$parts got=$got")
    }
  }

  test("buffer serialize round-trips and merges; tails are exact") {
    val a = new TDigestBuffer(100.0)
    val b = new TDigestBuffer(100.0)
    (1 to 10000).foreach(i => a.add(i.toDouble))
    (10001 to 20000).foreach(i => b.add(i.toDouble))
    a.mergeFrom(b)
    assert(a.total == 20000.0)
    assert(a.quantile(0.0) == 1.0 && a.quantile(1.0) <= 20000.0)
    val mid = a.quantile(0.5)
    assert(math.abs(mid - 10000.0) < 200, s"median=$mid")
    // digest stays compact regardless of input size
    assert(a.means.length < 200, s"centroids=${a.means.length}")
  }
}
