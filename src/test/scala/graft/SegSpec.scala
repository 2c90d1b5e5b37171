package graft

import graft.operators.{Ranges, Seg}
import org.apache.spark.sql.functions._

/**
 * contrib/seg contracts beyond the seg_ops gate: segs are CLOSED
 * intervals (touching endpoints overlap — the exact place they differ
 * from the half-open Ranges machinery), and the text forms parse /
 * render per seg_in/seg_out (`x`, `x .. y`, `>x`, `<x`, `~` ignored).
 */
class SegSpec extends SparkSpec {
  import spark.implicits._

  test("closed-endpoint semantics: touching segs overlap; Ranges' half-open don't") {
    val df = Seq((0.0, 5.0, 5.0, 9.0)).toDF("alo", "ahi", "blo", "bhi")
    val r = df.select(
      Seg.overlaps(col("alo"), col("ahi"), col("blo"), col("bhi")).as("seg"),
      Ranges.overlaps(col("alo"), col("ahi"), col("blo"), col("bhi")).as("rng"))
      .head()
    assert(r.getBoolean(0) === true)   // seg: [0,5] && [5,9] touch at 5
    assert(r.getBoolean(1) === false)  // range: [0,5) && [5,9) do not
  }

  test("operator table matches seg.cpp on pinned pairs") {
    // a=[2,4], b=[4,7]: left F (4 !< 4), overlap T, over_left T (4<=7)
    // a=[2,4], b=[5,7]: left T; right of course F
    val rows = Seq((2.0, 4.0, 4.0, 7.0), (2.0, 4.0, 5.0, 7.0), (5.0, 7.0, 2.0, 4.0))
      .toDF("alo", "ahi", "blo", "bhi")
      .select(Seg.left(col("ahi"), col("blo")).as("l"),
        Seg.right(col("alo"), col("bhi")).as("r"),
        Seg.overLeft(col("ahi"), col("bhi")).as("ol"),
        Seg.overRight(col("alo"), col("blo")).as("or"),
        Seg.overlaps(col("alo"), col("ahi"), col("blo"), col("bhi")).as("ov"))
      .collect().map(r => (r.getBoolean(0), r.getBoolean(1), r.getBoolean(2),
        r.getBoolean(3), r.getBoolean(4)))
    assert(rows(0) === ((false, false, true, false, true)))
    assert(rows(1) === ((true, false, true, false, false)))
    assert(rows(2) === ((false, true, false, true, false)))
  }

  test("parse handles point, range, open and approximate forms; render inverts") {
    val parsed = Seq("5.5", "2 .. 9", ">3", "<8", "~4.5", "6.25 .. 6.50", "junk")
      .toDF("t").select(col("t"), Seg.parse(col("t")).as("s"))
      .select(col("t"), col("s.lo"), col("s.hi")).collect()
      .map(r => r.getString(0) ->
        (Option(r.get(1)).map(_.asInstanceOf[Double]),
          Option(r.get(2)).map(_.asInstanceOf[Double]))).toMap
    assert(parsed("5.5") === ((Some(5.5), Some(5.5))))
    assert(parsed("2 .. 9") === ((Some(2.0), Some(9.0))))
    assert(parsed(">3") === ((Some(3.0), None)))
    assert(parsed("<8") === ((None, Some(8.0))))
    assert(parsed("~4.5") === ((Some(4.5), Some(4.5)))) // ~ stored-but-ignored
    assert(parsed("6.25 .. 6.50") === ((Some(6.25), Some(6.5))))
    assert(parsed("junk") === ((None, None)))

    val rendered = Seq((5.5, 5.5), (2.0, 9.0)).toDF("lo", "hi")
      .select(Seg.render(col("lo"), col("hi"))).as[String].collect()
    assert(rendered(0) === "5.5")
    assert(rendered(1) === "2.0 .. 9.0")
    val open = Seq((Some(3.0), Option.empty[Double]),
      (Option.empty[Double], Some(8.0))).toDF("lo", "hi")
      .select(Seg.render(col("lo"), col("hi"))).as[String].collect()
    assert(open(0) === ">3.0")
    assert(open(1) === "<8.0")
  }

  test("parse rejects malformed numerics with a NULL struct, never struct(null, null)") {
    // the reject contract is s.isNull — a permissive numeric class
    // would match "3-4", cast to null, and emit a NON-null
    // struct(null, null) that sails past callers filtering on
    // parse(t).isNull
    val bad = Seq("3-4", "1.2.3", "1e", "--5", "2..3..4", "1 .. x", "")
    val good = Seq("1e5 .. 2e5", "-3.5", ".5 .. 1.", ">+2e-1")
    val out = (bad ++ good).toDF("t")
      .select(col("t"), Seg.parse(col("t")).isNull.as("rejected"))
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    bad.foreach(t => assert(out(t), s"'$t' must reject to a null struct"))
    good.foreach(t => assert(!out(t), s"'$t' must parse"))
  }
}
