package graft

import graft.operators.{Flashback, Upsert}
import org.apache.spark.sql.functions._

/**
 * TIMECAPSULE contracts (reference behavior pinned by
 * src/test/regress/input/timecapsule_version_test_*.source): snapshot
 * reconstruction at a version cut, per-version validity intervals,
 * and the restore law — applying the compensation delta to the
 * current snapshot reproduces the flashback target exactly.
 */
class FlashbackSpec extends SparkSpec {
  import spark.implicits._

  // change log for one key's lifecycle + a second stable key:
  //   k=1: insert v1, update v2, DELETE v3, re-insert v4
  //   k=2: insert v1 only
  private def log = Seq(
    (1L, 1L, "U", 10.0), (1L, 2L, "U", 20.0),
    (1L, 3L, "D", 0.0), (1L, 4L, "U", 40.0),
    (2L, 1L, "U", 99.0)
  ).toDF("k", "csn", "op", "val")

  test("asOf reconstructs the snapshot at each version cut") {
    def snap(n: Long): Map[Long, Double] =
      Flashback.asOf(log, "k", Seq("csn"), "op", col("csn") <= n)
        .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(snap(1) === Map(1L -> 10.0, 2L -> 99.0))
    assert(snap(2) === Map(1L -> 20.0, 2L -> 99.0))
    assert(snap(3) === Map(2L -> 99.0)) // tombstone hides k=1
    assert(snap(4) === Map(1L -> 40.0, 2L -> 99.0)) // re-insert resurfaces
  }

  test("asOf is an aggregate, not a window sort") {
    val p = Flashback.asOf(log, "k", Seq("csn"), "op", lit(true))
      .queryExecution.executedPlan.toString
    assert(!p.contains("Window"), "asOf must stay a max_by aggregate")
    assert(p.contains("HashAggregate") || p.contains("SortAggregate"))
  }

  test("versionsBetween: delete closes the interval, open version has null valid_to") {
    val v = Flashback.versionsBetween(log, "k", Seq("csn"), "op", "csn",
        lit(0L), lit(99L))
      .collect().map(r => (r.getLong(0), r.getAs[Long]("valid_from"),
        Option(r.getAs[Any]("valid_to")), r.getDouble(2))).toSet
    assert(v === Set(
      (1L, 1L, Some(2L), 10.0),
      (1L, 2L, Some(3L), 20.0), // the DELETE at csn=3 closes this
      (1L, 4L, None, 40.0),
      (2L, 1L, None, 99.0)))
    // window [2,2] keeps only versions whose validity intersects it
    val mid = Flashback.versionsBetween(log, "k", Seq("csn"), "op", "csn",
        lit(2L), lit(2L))
      .collect().map(r => (r.getLong(0), r.getAs[Long]("valid_from"))).toSet
    assert(mid === Set((1L, 2L), (2L, 1L)))
  }

  test("restore law: delta applied to current == flashback target") {
    val cur = Flashback.asOf(log, "k", Seq("csn"), "op", lit(true))
      .select("k", "val")
    for (cut <- 1L to 4L) {
      val tgt = Flashback.asOf(log, "k", Seq("csn"), "op", col("csn") <= cut)
        .select("k", "val")
      val delta = Flashback.restoreDelta(cur, tgt, "k")
      val upserts = delta.filter(col("op2") =!= "D").select("k", "val")
      val dels = delta.filter(col("op2") === "D").select("k")
      val restored = Upsert.delete(
        Upsert.merge(cur, upserts, "k"), dels, "k")
      val a = restored.collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
      val b = tgt.collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
      assert(a === b, s"restore to cut $cut diverged")
    }
  }

  test("restoreDelta is minimal: identical snapshots yield an empty delta") {
    val cur = Flashback.asOf(log, "k", Seq("csn"), "op", lit(true))
      .select("k", "val")
    assert(Flashback.restoreDelta(cur, cur, "k").count() === 0L)
  }

  test("restoreDelta null-safe payload compare: NULL→value flip is a U") {
    val a = Seq((1L, Option.empty[Double]), (2L, Some(5.0)))
      .toDF("k", "val")
    val b = Seq((1L, Some(3.0)), (2L, Some(5.0))).toDF("k", "val")
    val d = Flashback.restoreDelta(a, b, "k").collect()
    assert(d.map(r => (r.getString(0), r.getLong(1))).toSeq === Seq(("U", 1L)))
  }
}
