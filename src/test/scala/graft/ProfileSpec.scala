package graft

import graft.operators.Profile
import org.apache.spark.sql.functions._

/**
 * Profile contracts: the exact and approx regimes agree on everything
 * but the distinct estimator, and the approx plan drops the Expand
 * (the c× row multiplication exactness costs).
 */
class ProfileSpec extends SparkSpec {

  private lazy val ev = spark.read.parquet(s"$sfDir/events.parquet")
  private val cols = Seq("event_id", "user_id", "event_type", "value")

  test("exact vs approx: identical except the distinct estimate") {
    val e = Profile.profile(ev, cols, exact = true).orderBy("col_name").collect()
    val a = Profile.profile(ev, cols, exact = false).orderBy("col_name").collect()
    e.zip(a).foreach { case (re, ra) =>
      assert(re.getString(0) == ra.getString(0))
      assert(re.getLong(1) == ra.getLong(1) && re.getLong(2) == ra.getLong(2))
      // HLL estimate within its documented error band
      val (de, da) = (re.getLong(3).toDouble, ra.getLong(3).toDouble)
      assert(math.abs(da - de) / de < 0.1, s"${re.getString(0)}: $da vs $de")
      assert(re.get(4) == ra.get(4) && re.get(5) == ra.get(5))
    }
  }

  test("neither regime plans an Expand; exact is per-column branches") {
    // a single wide aggregate with c count_distincts makes Spark plan
    // an Expand ((c+1)× every row through the shuffle — measured 2×
    // the union's cost at c=5); the per-column union keeps each branch
    // a pruned single-column scan with the single-distinct rewrite
    val exact = Profile.profile(ev, cols, exact = true)
      .queryExecution.executedPlan.toString
    val approx = Profile.profile(ev, cols, exact = false)
      .queryExecution.executedPlan.toString
    assert(!exact.contains("Expand"),
      "exact profile must union per-column branches, not Expand")
    assert(!approx.contains("Expand"),
      "HLL profile must be a single pass with no row multiplication")
    assert(approx.contains("Union") == false, "approx is one aggregate")
    assert(exact.contains("Union"), "exact unions one branch per column")
  }

  test("null accounting: planted nulls are counted, not distinct-inflated") {
    import spark.implicits._
    val df = Seq((Some(1), "a"), (None, "b"), (None, "a"), (Some(2), null))
      .toDF("x", "s")
    val p = Profile.profile(df, Seq("x", "s")).orderBy("col_name").collect()
    val s = p(0); val x = p(1)
    assert(s.getString(0) == "s" && s.getLong(2) == 1 && s.getLong(3) == 2)
    assert(s.getString(6) == "a" && s.getString(7) == "b")
    assert(x.getString(0) == "x" && x.getLong(2) == 2 && x.getLong(3) == 2)
    assert(x.getDouble(4) == 1.0 && x.getDouble(5) == 2.0)
  }

  test("heavyKeys: top-k per column, count-desc with value tiebreak") {
    import spark.implicits._
    val df = Seq("a", "a", "a", "b", "b", "c", "d").toDF("k")
      .withColumn("n2", org.apache.spark.sql.functions.lit(1))
    val got = Profile.heavyKeys(df, Seq("k"), k = 3)
      .as[(String, String, Long)].collect().toSeq
    // ties at count 1 break on the value string: c before d
    assert(got == Seq(("k", "a", 3L), ("k", "b", 2L), ("k", "c", 1L)))
    // bounded: TakeOrdered, never a global sort of all groups
    val plan = Profile.heavyKeys(df, Seq("k"), k = 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }
}
