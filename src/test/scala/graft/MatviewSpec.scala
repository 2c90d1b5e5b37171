package graft

import graft.operators.Matview
import org.apache.spark.sql.functions._

/**
 * IVM contracts: signed-delta maintenance equals full recompute, group
 * lifecycle (create / decrement / drop-at-zero) is exact, and the
 * merge is view-sized (union + re-aggregate, never a join or a base
 * re-scan).
 */
class MatviewSpec extends SparkSpec {
  import spark.implicits._

  test("inserts create, deletes decrement, zero-count groups drop") {
    val view = Seq(("a", 2L, 30L), ("b", 1L, 5L)).toDF("k", "n", "s")
    val delta = Seq(
      ("a", 10L, -1), // delete one 'a' row worth 10
      ("b", 5L, -1),  // delete b's only row → the group drops
      ("c", 7L, 1), ("c", 8L, 1) // a brand-new group from inserts
    ).toDF("k", "s", "op")
    val got = Matview.applyDelta(view, delta, Seq("k"), "n", Seq("s"), "op")
      .orderBy("k").as[(String, Long, Long)].collect().toSeq
    assert(got == Seq(("a", 1L, 20L), ("c", 2L, 15L)))
  }

  test("delta apply equals full recompute on events") {
    val cents = "CAST(round(value * 100, 0) AS BIGINT)"
    val ev = Tables(spark, sfDir, "events")
    val base = ev.filter(col("event_id") % 2 === 0)
    val view = base.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(expr(cents)).as("c"))
    val inserts = ev.filter(col("event_id") % 2 === 1)
      .select(col("event_type"), expr(cents).as("c"), lit(1).as("op"))
    val deletes = base.filter(col("event_id") % 14 === 0)
      .select(col("event_type"), expr(cents).as("c"), lit(-1).as("op"))
    val got = Matview.applyDelta(view, inserts.unionByName(deletes),
        Seq("event_type"), "n", Seq("c"), "op")
      .orderBy("event_type").as[(String, Long, Long)].collect().toSeq
    val want = ev.filter(col("event_id") % 2 === 1 ||
        col("event_id") % 14 =!= 0)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(expr(cents)).as("c"))
      .orderBy("event_type").as[(String, Long, Long)].collect().toSeq
    assert(got.nonEmpty && got == want)
  }

  test("applyInserts: min/max fold equals recompute; no-delete by construction") {
    val cents = "CAST(round(value * 100, 0) AS BIGINT)"
    val ev = Tables(spark, sfDir, "events")
    val base = ev.filter(col("event_id") % 3 === 0)
    val view = base.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(expr(cents)).as("c"),
        min(expr(cents)).as("lo"), max(expr(cents)).as("hi"))
    val ins = ev.filter(col("event_id") % 3 =!= 0)
      .select(col("event_type"), expr(cents).as("c"),
        expr(cents).as("lo"), expr(cents).as("hi"))
    val got = Matview.applyInserts(view, ins, Seq("event_type"),
        "n", Seq("c"), Seq("lo"), Seq("hi"))
      .orderBy("event_type")
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    val want = ev.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(expr(cents)).as("c"),
        min(expr(cents)).as("lo"), max(expr(cents)).as("hi"))
      .orderBy("event_type")
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(got.nonEmpty && got == want)
    // the API carries no op column — deletes are unrepresentable
    intercept[IllegalArgumentException](Matview.applyInserts(
      view, ins, Seq("event_type"), "n", Seq("c"), Seq("c"), Seq("hi")))
  }

  test("maintenance is a union + re-aggregate: no join in the plan") {
    val view = Seq(("a", 1L, 2L)).toDF("k", "n", "s")
    val delta = Seq(("a", 3L, 1)).toDF("k", "s", "op")
    val plan = Matview.applyDelta(view, delta, Seq("k"), "n", Seq("s"), "op")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"IVM merge must not join:\n$plan")
  }
}
