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

  test("uuid v3: deterministic, versioned, variant in [89ab]") {
    val got = Seq("a", "b", "a").toDF("n")
      .select(Uuids.uuidV3(Uuids.NS_DNS, col("n")).as("u")).as[String].collect()
    assert(got(0) == got(2) && got(0) != got(1))
    got.foreach { u =>
      assert(u.matches("[0-9a-f]{8}-[0-9a-f]{4}-3[0-9a-f]{3}-[89ab][0-9a-f]{3}-[0-9a-f]{12}"), u)
    }
  }
}
