package graft

import graft.operators.Upsert
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

  test("merge rejects mismatched column sets") {
    val base = Seq((1L, "a")).toDF("k", "name")
    val bad = Seq((1L, 2.0)).toDF("k", "v")
    val e = intercept[IllegalArgumentException] {
      Upsert.merge(base, bad, "k")
    }
    assert(e.getMessage.contains("identical column sets"))
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
