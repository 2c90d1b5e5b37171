package graft

import graft.operators.Upsert
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** MERGE semantics: matched keys take the delta row wholesale,
  * unmatched rows on both sides survive, deletes anti-join, and
  * mismatched schemas are rejected. */
class UpsertSpec extends SparkSpec {
  import spark.implicits._

  test("merge: update wins, insert appears, carry-over intact") {
    val base = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("k", "name", "v")
    val delta = Seq((2L, "b2", 99.0), (4L, "d", 40.0)).toDF("k", "name", "v")
    val got = Upsert.merge(base, delta, "k").orderBy("k")
      .as[(Long, String, Double)].collect().toSeq
    assert(got == Seq((1L, "a", 10.0), (2L, "b2", 99.0),
      (3L, "c", 30.0), (4L, "d", 40.0)))
    val afterDelete = Upsert.delete(Upsert.merge(base, delta, "k"),
        Seq(Tuple1(1L), Tuple1(4L)).toDF("k"), "k")
      .orderBy("k").as[(Long, String, Double)].collect().toSeq
    assert(afterDelete == Seq((2L, "b2", 99.0), (3L, "c", 30.0)))
  }

  test("merge: a matched delta row with NULL payload nulls the base value") {
    // WHEN MATCHED UPDATE takes the delta row ENTIRELY — a per-column
    // coalesce would silently keep base's "b"/20.0 here
    val base = Seq((1L, Some("a"), Some(10.0)), (2L, Some("b"), Some(20.0)))
      .toDF("k", "name", "v")
    val delta = Seq((2L, None: Option[String], None: Option[Double]))
      .toDF("k", "name", "v")
    val got = Upsert.merge(base, delta, "k").orderBy("k")
      .as[(Long, Option[String], Option[Double])].collect().toSeq
    assert(got == Seq((1L, Some("a"), Some(10.0)), (2L, None, None)))
  }

  test("merge rejects mismatched column sets") {
    val base = Seq((1L, "a")).toDF("k", "name")
    val bad = Seq((1L, 2.0)).toDF("k", "v")
    val e = intercept[IllegalArgumentException] {
      Upsert.merge(base, bad, "k")
    }
    assert(e.getMessage.contains("identical column sets"))
  }

  test("applyCdc: out-of-order + duplicated changes, tombstone tie wins") {
    val base = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    val changes = Seq(
      (1L, "a2", 2L, "U"),   // delivered before the older...
      (1L, "a1", 1L, "U"),   // ...v1 update: v2 must win
      (2L, "b9", 5L, "U"),   // same version as...
      (2L, "bX", 5L, "D"),   // ...a delete: delete wins the tie
      (4L, "d", 1L, "U"),    // insert
      (1L, "a2", 2L, "U"))   // duplicate delivery
      .toDF("k", "v", "ver", "op")
    val got = Upsert.applyCdc(base, changes, "k", "ver", "op")
      .orderBy("k").as[(Long, String)].collect().toSeq
    assert(got == Seq((1L, "a2"), (3L, "c"), (4L, "d")))
    // idempotent: applying the changes to the already-applied state
    // (as fresh base) yields the same state
    val again = Upsert.applyCdc(
        Upsert.applyCdc(base, changes, "k", "ver", "op"),
        changes, "k", "ver", "op")
      .orderBy("k").as[(Long, String)].collect().toSeq
    assert(again == got)
  }

  test("streaming CDC: foreachBatch incremental applies converge to batch") {
    // the production streaming shape: a change feed lands in
    // micro-batches, each foreachBatch applies its slice onto the
    // running snapshot. applyCdc's max-(version, op) semantics make the
    // fold ORDER-FREE across slices — the final snapshot equals one
    // batch apply of the whole feed, whatever the slicing.
    val base = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    val changes = Seq(
      (1L, "a2", 2L, "U"), (1L, "a1", 1L, "U"), (2L, "bX", 5L, "D"),
      (4L, "d", 1L, "U"), (4L, "d2", 2L, "U"), (3L, "c9", 7L, "U"),
      (1L, "a2", 2L, "U"), (2L, "b7", 4L, "U"))
    val expect = Upsert.applyCdc(base,
        changes.toDF("k", "v", "ver", "op"), "k", "ver", "op")
      .orderBy("k").as[(Long, String)].collect().toSeq

    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, String, Long, String)]
    // the running snapshot must keep surviving versions so a LATER
    // slice with an older version cannot resurrect: carry (k, v, ver,
    // op) through the fold and strip at the end
    var snapshot = base
      .withColumn("ver", lit(Long.MinValue)).withColumn("op", lit("U"))
    val q = mem.toDF().toDF("k", "v", "ver", "op")
      .writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val merged = snapshot.unionByName(batch)
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("k")).orderBy(col("ver").desc, col("op").asc)
        snapshot = merged.withColumn("_rn", row_number().over(w))
          .filter(col("_rn") === 1).drop("_rn")
          .collect() // pin each fold step (a real pipeline writes a table)
          .toSeq match { case rows =>
            spark.createDataFrame(
              spark.sparkContext.parallelize(rows), merged.schema)
          }
      }.start()
    try {
      changes.grouped(3).foreach { slice =>
        mem.addData(slice); q.processAllAvailable()
      }
    } finally q.stop()
    val got = snapshot.filter(col("op") === "U").select("k", "v")
      .orderBy("k").as[(Long, String)].collect().toSeq
    assert(got == expect, s"got=$got expect=$expect")
  }

  test("merge is idempotent: re-applying the same delta changes nothing") {
    val base = Seq((1L, "a", 10.0), (2L, "b", 20.0)).toDF("k", "name", "v")
    val delta = Seq((2L, "b2", 99.0)).toDF("k", "name", "v")
    val once = Upsert.merge(base, delta, "k")
    val twice = Upsert.merge(once, delta, "k")
    assert(once.orderBy("k").collect().toSeq ==
      twice.orderBy("k").collect().toSeq)
  }
}
