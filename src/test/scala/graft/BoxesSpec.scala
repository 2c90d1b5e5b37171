package graft

import graft.operators.Boxes
import graft.functions.Uuids
import org.apache.spark.sql.functions._

/**
 * cube semantics (contrib/cube) pinned on documented behaviors:
 * corner normalization, containment/overlap, inter staying inverted
 * when disjoint, and gap distance; plus uuid v3 shape invariants.
 */
class BoxesSpec extends SparkSpec {
  import spark.implicits._

  private def arr(xs: Double*) = array(xs.map(lit): _*)

  private def b[T](c: org.apache.spark.sql.Column): T =
    Seq(1).toDF("x").select(c.as("r")).collect().head.getAs[T]("r")

  private def bs(c: org.apache.spark.sql.Column): Seq[Double] =
    Seq(1).toDF("x").select(c.as("r")).collect().head
      .getSeq[Double](0).toList

  test("contains / overlaps with corner normalization") {
    // '(0,0),(1,1)' @> '(0.5,0.5)'
    assert(b[Boolean](Boxes.contains(arr(0, 0), arr(1, 1), arr(0.5, 0.5), arr(0.5, 0.5))))
    // corners given in any order normalize first
    assert(b[Boolean](Boxes.contains(arr(1, 1), arr(0, 0), arr(0.5, 0.5), arr(0.5, 0.5))))
    assert(!b[Boolean](Boxes.contains(arr(0, 0), arr(1, 1), arr(0.5, 0.5), arr(2, 2))))
    assert(b[Boolean](Boxes.overlaps(arr(0, 0), arr(2, 2), arr(2, 2), arr(3, 3)))) // closed: touch counts
    assert(!b[Boolean](Boxes.overlaps(arr(0, 0), arr(1, 1), arr(2, 2), arr(3, 3))))
  }

  test("union expands, inter stays inverted when disjoint (cube_inter)") {
    val (ull, uur) = Boxes.union(arr(0, 0), arr(1, 1), arr(2, 2), arr(3, 3))
    assert(bs(ull) == Seq(0.0, 0.0) && bs(uur) == Seq(3.0, 3.0))
    val (ill, iur) = Boxes.inter(arr(0, 0), arr(1, 1), arr(2, 2), arr(3, 3))
    // max(ll) > min(ur): inverted result, NOT canonicalized — like the ref
    assert(bs(ill) == Seq(2.0, 2.0) && bs(iur) == Seq(1.0, 1.0))
  }

  test("distance is the per-dimension gap norm; 0 when overlapping") {
    // cube docs: cube_distance('(0,0)', '(3,4)') = 5
    assert(b[Double](Boxes.distance(arr(0, 0), arr(0, 0), arr(3, 4), arr(3, 4))) == 5.0)
    assert(b[Double](Boxes.distance(arr(0, 0), arr(2, 2), arr(1, 1), arr(3, 3))) == 0.0)
    // one-dim gap only: boxes offset in x, overlapping in y
    assert(b[Double](Boxes.distance(arr(0, 0), arr(1, 5), arr(4, 2), arr(6, 3))) == 3.0)
  }

  test("xpath_* family matches from_xml on the gate's document shape") {
    // the gate runs from_xml (one parse per row); the xpath_* family
    // is semantics-pinned here on a small corpus — at sf0.1 the
    // per-call re-parse costs 72 s vs ~2 s for from_xml
    val df = Seq((7L, 3L, "O"), (8L, 12L, "F")).toDF("k", "c", "st")
      .selectExpr("k", "concat('<o><k>', k, '</k><st>', st, " +
        "'</st><ls><l>', c % 10, '</l><l>', c % 7, '</l></ls></o>') AS x")
    val r = df.selectExpr(
      "xpath_long(x, '/o/k') AS xk",
      "xpath_string(x, '/o/st') AS xst",
      "xpath_boolean(x, '/o/ls') AS has_ls",
      "xpath_boolean(x, '/o/nope') AS has_nope",
      "array_join(xpath(x, '/o/ls/l/text()'), ',') AS xls",
      "xpath_int(x, 'count(/o/ls/l)') AS xn",
      "from_xml(x, 'k LONG, st STRING, ls STRUCT<l: ARRAY<LONG>>') AS p")
      .collect()
    r.foreach { row =>
      val p = row.getStruct(6)
      assert(row.getLong(0) == p.getLong(0))          // k
      assert(row.getString(1) == p.getString(1))      // st
      assert(row.getBoolean(2) && !row.getBoolean(3)) // ls exists, nope doesn't
      assert(row.getInt(5) == 2)
      assert(row.getString(4) ==
        p.getStruct(2).getSeq[Long](0).mkString(","))
    }
  }

  test("uuid v3: deterministic, versioned, variant in [89ab]") {
    val got = Seq("a", "b", "a").toDF("n")
      .select(Uuids.uuidV3(Uuids.NS_DNS, col("n")).as("u")).as[String].collect()
    assert(got(0) == got(2) && got(0) != got(1))
    got.foreach { u =>
      assert(u.matches("[0-9a-f]{8}-[0-9a-f]{4}-3[0-9a-f]{3}-[89ab][0-9a-f]{3}-[0-9a-f]{12}"), u)
    }
  }
}
