package graft

import graft.operators.TemporalJoin
import org.apache.spark.sql.functions._

/**
 * Temporal-join contracts: the window-form AS-OF join equals a
 * driver-side brute-force pick (including duplicate-timestamp ties and
 * no-match NULLs), and the banded range join equals the naive
 * range-condition join exactly while planning as a pure equi-join.
 */
class TemporalJoinSpec extends SparkSpec {
  import spark.implicits._

  private def tsCol(us: Long) = timestamp_micros(lit(us))

  test("asOf equals brute force on random data, ties to greatest ord") {
    val rnd = new scala.util.Random(17)
    val left = (0 until 300).map { i =>
      (i.toLong, (i % 7).toLong, 1000L + rnd.nextInt(500).toLong)
    } // (id, key, ts_us)
    val right = (0 until 400).map { j =>
      (1000L + j, (j % 7).toLong, 1000L + rnd.nextInt(500).toLong,
        rnd.nextInt(100).toDouble)
    } // (id, key, ts_us, v) — duplicate (key, ts) pairs are likely
    val lDf = left.toDF("event_id", "k", "us")
      .select(col("event_id"), col("k"), timestamp_micros(col("us")).as("ts"))
    val rDf = right.toDF("event_id", "k", "us", "v")
      .select(col("event_id"), col("k"), timestamp_micros(col("us")).as("ts"), col("v"))
    val got = TemporalJoin.asOf(lDf, rDf, "k", "ts", "ts", "event_id",
        Seq("event_id", "v"))
      .select(col("event_id"), col("asof_event_id"), col("asof_v"))
      .as[(Long, Option[Long], Option[Double])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    left.foreach { case (id, k, us) =>
      val cands = right.filter(r => r._2 == k && r._3 <= us)
      val expect =
        if (cands.isEmpty) (None, None)
        else {
          val best = cands.maxBy(c => (c._3, c._1)) // max ts, then max ord
          (Some(best._1), Some(best._4))
        }
      assert(got(id) == expect, s"left id=$id")
    }
  }

  test("asOfForward and asOfNearest equal brute force, documented ties") {
    val rnd = new scala.util.Random(23)
    val left = (0 until 300).map { i =>
      (i.toLong, (i % 7).toLong, 1000L + rnd.nextInt(500).toLong)
    }
    val right = (0 until 400).map { j =>
      (1000L + j, (j % 7).toLong, 1000L + rnd.nextInt(500).toLong,
        rnd.nextInt(100).toDouble)
    }
    val lDf = left.toDF("event_id", "k", "us")
      .select(col("event_id"), col("k"), timestamp_micros(col("us")).as("ts"))
    val rDf = right.toDF("event_id", "k", "us", "v")
      .select(col("event_id"), col("k"), timestamp_micros(col("us")).as("ts"), col("v"))
    val fwd = TemporalJoin.asOfForward(lDf, rDf, "k", "ts", "ts", "event_id",
        Seq("event_id", "v"))
      .select(col("event_id"), col("fwd_event_id"))
      .as[(Long, Option[Long])].collect().toMap
    val near = TemporalJoin.asOfNearest(lDf, rDf, "k", "ts", "ts", "event_id",
        Seq("event_id", "v"))
      .select(col("event_id"), col("near_event_id"))
      .as[(Long, Option[Long])].collect().toMap
    left.foreach { case (id, k, us) =>
      val fw = right.filter(r => r._2 == k && r._3 >= us)
      val fexp = if (fw.isEmpty) None
        else Some(fw.minBy(c => (c._3, c._1))._1) // min ts, then MIN ord
      assert(fwd(id) == fexp, s"forward left id=$id")
      val bw = right.filter(r => r._2 == k && r._3 <= us)
      val bexp = if (bw.isEmpty) None
        else Some(bw.maxBy(c => (c._3, c._1)))
      val nexp = (bexp, fexp.map(f => fw.filter(_._1 == f).head)) match {
        case (None, None) => None
        case (Some(b), None) => Some(b._1)
        case (None, Some(f)) => Some(f._1)
        // equal distance resolves BACKWARD (documented tie rule)
        case (Some(b), Some(f)) =>
          if (us - b._3 <= f._3 - us) Some(b._1) else Some(f._1)
      }
      assert(near(id) == nexp, s"nearest left id=$id")
    }
  }

  test("asOfNearest picks by distance; equal ts matches both directions") {
    val lDf = Seq((1L, 1L, 10L), (2L, 1L, 100L)).toDF("event_id", "k", "us")
      .select(col("event_id"), col("k"), timestamp_micros(col("us")).as("ts"))
    // for left ts=10: right at 7 (d=3) and 12 (d=2) → forward wins;
    // for left ts=100: right at 98 (d=2) and 102 (d=2) → tie → backward
    val rDf = Seq((100L, 1L, 7L), (200L, 1L, 12L), (300L, 1L, 98L),
        (400L, 1L, 102L)).toDF("event_id", "k", "us")
      .select(col("event_id"), col("k"), timestamp_micros(col("us")).as("ts"))
    val got = TemporalJoin.asOfNearest(lDf, rDf, "k", "ts", "ts",
        "event_id", Seq("event_id"))
      .select(col("event_id"), col("near_event_id"))
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 200L, 2L -> 300L))
    // forward is INCLUSIVE at equal timestamps
    val eq = TemporalJoin.asOfForward(lDf,
        Seq((500L, 1L, 10L)).toDF("event_id", "k", "us")
          .select(col("event_id"), col("k"),
            timestamp_micros(col("us")).as("ts")),
        "k", "ts", "ts", "event_id", Seq("event_id"))
      .select(col("event_id"), col("fwd_event_id"))
      .as[(Long, Option[Long])].collect().toMap
    assert(eq(1L) == Some(500L))
  }

  test("asOf attaches all payload columns from the SAME right row") {
    // right row at ts=10 has v null; row at ts=5 has v set — a per-column
    // last(ignoreNulls) would stitch (id from ts=10, v from ts=5)
    val lDf = Seq((1L, 1L)).toDF("event_id", "k")
      .select(col("event_id"), col("k"), tsCol(20L).as("ts"))
    val rDf = Seq((100L, 1L, 5L, Some(7.0)), (200L, 1L, 10L, None))
      .toDF("event_id", "k", "us", "v")
      .select(col("event_id"), col("k"), timestamp_micros(col("us")).as("ts"), col("v"))
    val row = TemporalJoin.asOf(lDf, rDf, "k", "ts", "ts", "event_id", Seq("event_id", "v"))
      .select(col("asof_event_id"), col("asof_v")).head()
    assert(row.getLong(0) == 200L && row.isNullAt(1),
      "payload must come atomically from the latest row, nulls included")
  }

  test("rangeJoin equals the naive range-condition join on events") {
    val ev = Tables(spark, sfDir, "events")
    val l = ev.filter(col("event_type") === "error")
      .select(col("event_id"), col("user_id"), col("ts"))
    val r = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("ru"), col("ts").as("rts"), col("value"))
    val got = TemporalJoin.rangeJoin(l, r.select(col("ru").as("user_id"),
        col("rts").as("ts"), col("value")), "user_id", "ts", "ts",
        0L, 3600000000L)
      .select(col("event_id"), col("r_value"))
      .as[(Long, Double)].collect().sorted.toSeq
    val naive = l.join(r, col("user_id") === col("ru") &&
        unix_micros(col("rts")) >= unix_micros(col("ts")) &&
        unix_micros(col("rts")) < unix_micros(col("ts")) + 3600000000L)
      .select(col("event_id"), col("value"))
      .as[(Long, Double)].collect().sorted.toSeq
    assert(got.nonEmpty && got == naive)
  }

  test("range join plans as an equi-join, never a nested loop") {
    val q = SparkEntry.queries("range_join")(spark, sfDir)
    val p = q.queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"range join regressed to a nested loop:\n$p")
  }

  test("asOf window edges: exact-equal timestamp matches (>= semantics)") {
    val lDf = Seq((1L, 1L)).toDF("event_id", "k")
      .select(col("event_id"), col("k"), tsCol(100L).as("ts"))
    val rDf = Seq((9L, 1L, 100L, 3.5), (8L, 1L, 101L, 9.9))
      .toDF("event_id", "k", "us", "v")
      .select(col("event_id"), col("k"), timestamp_micros(col("us")).as("ts"), col("v"))
    val row = TemporalJoin.asOf(lDf, rDf, "k", "ts", "ts", "event_id", Seq("v"))
      .select(col("asof_v")).head()
    assert(row.getDouble(0) == 3.5, "equal-ts right row must match; later row must not")
  }
}
