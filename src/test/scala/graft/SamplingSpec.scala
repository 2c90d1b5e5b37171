package graft

import graft.operators.Sampling
import org.apache.spark.sql.functions._

/**
 * Sampling contracts: both forms are pure functions of the input set
 * (partitioning-invariant), stratifiedExactN caps every stratum at n,
 * and hashFraction is a map-only plan with the expected keep rate.
 */
class SamplingSpec extends SparkSpec {

  private lazy val docs =
    spark.read.parquet(s"$sfDir/documents.parquet").select("doc_id", "lang")

  test("stratifiedExactN: exact cap, determinism under repartition") {
    val s1 = Sampling.stratifiedExactN(docs, "lang", "doc_id", 10)
    val perStratum = s1.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val sizes = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    sizes.foreach { case (l, n) =>
      assert(perStratum(l) == math.min(10L, n), s"stratum $l")
    }
    val a = s1.collect().map(r => (r.getLong(0), r.getInt(2))).toSet
    val b = Sampling.stratifiedExactN(docs.repartition(7), "lang", "doc_id", 10)
      .collect().map(r => (r.getLong(0), r.getInt(2))).toSet
    assert(a == b, "sample must not depend on physical partitioning")
  }

  test("mixBySource: sqrt quotas flatten the mixture, deterministic") {
    import org.apache.spark.sql.functions.count
    val mixed = Sampling.mixBySource(docs, "lang", "doc_id")
    val kept = mixed.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val sizes = docs.groupBy("lang").agg(count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    sizes.foreach { case (l, n) =>
      val quota = math.round(math.sqrt(n.toDouble) * 5.0)
      assert(kept(l) == math.min(quota, n), s"lang $l: ${kept(l)} vs $quota")
    }
    // flattening: the biggest source keeps a SMALLER share than the
    // smallest one
    val (big, small) = (sizes.maxBy(_._2)._1, sizes.minBy(_._2)._1)
    if (sizes(big) > sizes(small)) {
      assert(kept(big).toDouble / sizes(big) < kept(small).toDouble / sizes(small))
    }
    // pure function of the input set
    val a = mixed.collect().map(r => (r.getLong(1), r.getInt(2))).toSet
    val b = Sampling.mixBySource(docs.repartition(9), "lang", "doc_id")
      .collect().map(r => (r.getLong(1), r.getInt(2))).toSet
    assert(a == b)
  }

  test("hashFraction: map-only plan, deterministic, ~frac keep rate") {
    val s = Sampling.hashFraction(docs, "doc_id", 0.2)
    val plan = s.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"sampling filter must not shuffle:\n$plan")
    val n = docs.count().toDouble
    val kept = s.count().toDouble
    assert(math.abs(kept / n - 0.2) < 0.1, s"keep rate ${kept / n}")
    // deterministic: same rows on re-run and under repartition
    val a = s.collect().map(_.getLong(0)).toSet
    val b = Sampling.hashFraction(docs.repartition(5), "doc_id", 0.2)
      .collect().map(_.getLong(0)).toSet
    assert(a == b)
    // nested property: a 0.1 sample is a subset of the 0.2 sample
    // (threshold filters nest), which is what makes sample sizes
    // adjustable without resampling churn
    val c = Sampling.hashFraction(docs, "doc_id", 0.1)
      .collect().map(_.getLong(0)).toSet
    assert(c.subsetOf(a))
  }

  test("shuffleBatches: dense global positions, exact batch sizes, " +
      "partitioning-invariant, epochs differ") {
    val n = docs.count()
    val sb = Sampling.shuffleBatches(docs.select("doc_id"), "doc_id", 64)
    val rows = sb.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // positions are a permutation of [0, n)
    assert(rows.map(_._2).sorted.toSeq == (0L until n).toSeq)
    // every batch except the last is exactly 64 docs
    val byBatch = rows.groupBy(_._3).view.mapValues(_.length).toMap
    val lastBatch = byBatch.keys.max
    byBatch.foreach { case (b, c) =>
      if (b < lastBatch) assert(c == 64, s"batch $b has $c docs")
    }
    assert(byBatch(lastBatch) == (if (n % 64 == 0) 64 else n % 64))
    // batch is position div 64
    rows.foreach { case (_, p, b) => assert(b == p / 64) }
    // pure function of the input set
    val again = Sampling.shuffleBatches(
        docs.select("doc_id").repartition(11), "doc_id", 64)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(rows.toSet == again)
    // a different epoch is a genuinely different permutation
    val e1 = Sampling.shuffleBatches(docs.select("doc_id"), "doc_id", 64,
        epoch = 1).collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val e0 = rows.map(r => (r._1, r._2)).toMap
    assert(e0.count { case (id, p) => e1(id) != p } > n / 2)
    // plan contract: no RangePartitioning (a global orderBy would
    // sample-and-double-execute the child), exactly one Window sort
    val plan = sb.queryExecution.executedPlan.toString
    assert(!plan.contains("rangepartitioning"), plan)
  }

  test("oversample: floor+frac copies, deterministic, map-only") {
    import spark.implicits._
    val df = (0L until 2000L).toDF("id")
    // integer weight: exactly w copies each, copy_id 0..w-1
    val w2 = Sampling.oversample(df, "id", lit(2.0))
    assert(w2.count() == 4000L)
    assert(w2.groupBy("id").count().filter(col("count") =!= 2).count() == 0)
    // fractional weight: every row has 1 or 2 copies, mean ≈ 1.25
    val w125 = Sampling.oversample(df, "id", lit(1.25))
    val n125 = w125.count()
    assert(n125 >= 2400 && n125 <= 2600, s"1.25x realized $n125 / 2000")
    // w < 1 downsamples; w = 0 drops everything
    val w04 = Sampling.oversample(df, "id", lit(0.4)).count()
    assert(w04 >= 700 && w04 <= 900, s"0.4x realized $w04 / 2000")
    assert(Sampling.oversample(df, "id", lit(0.0)).count() == 0L)
    // deterministic per epoch; different epochs pick different extras
    val a = Sampling.oversample(df, "id", lit(1.5), epoch = 3)
      .select("id", "copy_id").as[(Long, Long)].collect().toSet
    val b = Sampling.oversample(df, "id", lit(1.5), epoch = 3)
      .select("id", "copy_id").as[(Long, Long)].collect().toSet
    val c = Sampling.oversample(df, "id", lit(1.5), epoch = 4)
      .select("id", "copy_id").as[(Long, Long)].collect().toSet
    assert(a == b && a != c)
    // map-only: no shuffle anywhere in the plan
    assert(!Sampling.oversample(df, "id", lit(1.5))
      .queryExecution.executedPlan.toString.contains("Exchange"))
  }

  test("weightedSampleK: equals local A-Res order statistics, heap plan") {
    import spark.implicits._
    val rows = (1 to 500).map(i => (i.toLong, (i % 37 + 1).toDouble))
    val df = rows.toDF("id", "w")
    // deterministic u from a splitmix-style integer mix, computed both
    // locally and as a column with identical arithmetic
    def uOf(id: Long): Double =
      (((id * 2654435761L) % 4294967296L) + 1).toDouble / 4294967297.0
    val uCol = (org.apache.spark.sql.functions.pmod(
      col("id") * lit(2654435761L), lit(4294967296L)) + 1L)
      .cast("double") / 4294967297.0
    val k = 40
    val got = Sampling.weightedSampleK(df, uCol, col("w"), k)
      .select("id").as[Long].collect().toSet
    val want = rows.sortBy { case (id, w) => -math.log(uOf(id)) / w }
      .take(k).map(_._1).toSet
    assert(got == want)
    // heavier items are over-represented vs uniform: mean selected
    // weight must exceed the population mean (E-S property smoke)
    val meanSel = rows.filter(r => got(r._1)).map(_._2).sum / k
    val meanAll = rows.map(_._2).sum / rows.size
    assert(meanSel > meanAll)
    // bounded-heap plan: TakeOrdered, no global Sort exchange
    val p = Sampling.weightedSampleK(df, uCol, col("w"), k)
      .queryExecution.executedPlan.toString
    assert(p.contains("TakeOrderedAndProject"), p)
  }
}
