package graft

import graft.operators.AutoExplain
import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

/**
 * auto_explain contracts (contrib/auto_explain/auto_explain.cpp):
 * capture fires iff duration ≥ log_min_duration (< 0 disables),
 * log_analyze carries the actual result row count, the rendered plan
 * names real operators, uninstall stops capture, and capture windows
 * are session-isolated (a listener never sees another session's
 * statements).
 */
class AutoExplainSpec extends SparkSpec with Matchers {
  import spark.implicits._

  private def waitQuiet(l: AutoExplain.Listener, ms: Long = 500): Unit = {
    // bus is async: give in-flight events time to land before
    // asserting on ABSENCE
    val until = System.nanoTime() + ms * 1000000L
    while (System.nanoTime() < until) Thread.sleep(20)
  }

  test("captures plan + analyze row count for every statement at threshold 0") {
    val sess = spark.newSession()
    val ae = AutoExplain.install(sess, minDurationUs = 0L)
    try {
      // a local Seq would constant-fold into LocalTableScan; range is
      // a real physical source so the Filter survives into the plan
      sess.range(1, 101).filter(col("id") % 7 === 0).collect()
      assert(AutoExplain.awaitEntries(ae, 1))
      val e = ae.entries.head
      assert(e.outRows.contains(14L)) // 7,14,...,98
      assert(e.plan.contains("Filter") || e.plan.contains("filter"))
      assert(e.durationUs >= 0L)
      assert(e.action.nonEmpty)
    } finally AutoExplain.uninstall(sess, ae)
  }

  test("log_min_duration: a huge threshold captures nothing; -1 disables") {
    val sess = spark.newSession()
    val hi = AutoExplain.install(sess, minDurationUs = Long.MaxValue)
    val off = AutoExplain.install(sess, minDurationUs = -1L)
    try {
      import sess.implicits._
      Seq(1, 2, 3).toDF("x").collect()
      waitQuiet(hi)
      assert(hi.size === 0)
      assert(off.size === 0)
    } finally {
      AutoExplain.uninstall(sess, hi); AutoExplain.uninstall(sess, off)
    }
  }

  test("log_analyze off: no row counts; formatted mode renders numbered plan") {
    val sess = spark.newSession()
    val ae = AutoExplain.install(sess, analyze = false, mode = "formatted")
    try {
      import sess.implicits._
      Seq((1, "a"), (2, "b")).toDF("k", "v").collect()
      assert(AutoExplain.awaitEntries(ae, 1))
      val e = ae.entries.head
      assert(e.outRows.isEmpty)
      assert(e.plan.contains("(1)")) // formatted explain numbers nodes
    } finally AutoExplain.uninstall(sess, ae)
    intercept[IllegalArgumentException] {
      AutoExplain.install(sess, mode = "bogus")
    }
  }

  test("uninstall stops capture; entries as a relation") {
    val sess = spark.newSession()
    val ae = AutoExplain.install(sess)
    import sess.implicits._
    Seq(1L, 2L).toDF("x").collect()
    assert(AutoExplain.awaitEntries(ae, 1))
    val n = ae.size
    AutoExplain.uninstall(sess, ae)
    Seq(3L).toDF("x").collect()
    waitQuiet(ae)
    assert(ae.size === n)
    val rel = AutoExplain.log(spark, ae)
    assert(rel.columns.toSeq ===
      Seq("seq", "action", "duration_us", "out_rows", "plan"))
    assert(rel.count() === n.toLong)
  }

  test("capture windows are session-isolated") {
    val sess = spark.newSession()
    val ae = AutoExplain.install(sess)
    try {
      // a PARENT-session statement must not land in the child window
      Seq(1, 2, 3, 4).toDF("x").collect()
      waitQuiet(ae)
      assert(ae.size === 0)
      import sess.implicits._
      Seq(5, 6).toDF("x").collect()
      assert(AutoExplain.awaitEntries(ae, 1))
      assert(ae.size === 1)
    } finally AutoExplain.uninstall(sess, ae)
  }
}
