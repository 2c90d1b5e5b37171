package graft

import graft.operators.Agglom
import org.apache.spark.sql.functions._

/**
 * Agglomerative clustering contracts beyond the ml_agglom gate (which
 * pins the planted-band recovery hash-exact vs DuckDB):
 *  - single vs complete linkage split the classic chain set
 *    differently (the textbook case where linkages disagree);
 *  - weighted micro-cells are EXACT: clustering duplicated points
 *    equals clustering the distinct points, label for label;
 *  - cosine affinity groups by direction, not magnitude;
 *  - reference-pinned validation (ward ⇒ euclidean, linkage set) and
 *    the O(m²) driver guard raise instead of degrading.
 */
class AgglomSpec extends SparkSpec {
  import spark.implicits._

  private def oneD(vals: Seq[Double]) =
    vals.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "x")

  private def labelsOf(df: org.apache.spark.sql.DataFrame): Map[Long, Int] =
    df.collect().map(r => r.getAs[Long]("id") -> r.getAs[Int]("label")).toMap

  test("single vs complete linkage disagree on the chain set") {
    // 1, 2, 4, 5, 7.5 with k=2:
    //  single: d({1,2},{4,5}) = 2 < d({4,5},{7.5}) = 2.5 → {1,2,4,5} | {7.5}
    //  complete: d({1,2},{4,5}) = 4 > d({4,5},{7.5}) = 3.5 → {1,2} | {4,5,7.5}
    val df = oneD(Seq(1, 2, 4, 5, 7.5))
    val sgl = labelsOf(Agglom.cluster(df, Seq(col("x")), col("id"), 2, "single"))
    assert(sgl(0) === sgl(1) && sgl(1) === sgl(2) && sgl(2) === sgl(3))
    assert(sgl(4) !== sgl(0))
    val cpl = labelsOf(Agglom.cluster(df, Seq(col("x")), col("id"), 2, "complete"))
    assert(cpl(0) === cpl(1)); assert(cpl(0) !== cpl(2))
    assert(cpl(2) === cpl(3) && cpl(3) === cpl(4))
  }

  test("weighted cells are exact: duplicates don't move the hierarchy") {
    // average linkage where sizes matter: 0 (×3), 4, 10 — the merge
    // d({0³,4}, 10) must be the size-weighted (3·10 + 1·6)/4 = 9,
    // identical to running on the exploded points
    val dup = Seq(0.0, 0.0, 0.0, 4.0, 10.0)
    val df = dup.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "x")
    val lbl = labelsOf(Agglom.cluster(df, Seq(col("x")), col("id"), 2, "average"))
    assert(lbl(0) === lbl(1) && lbl(1) === lbl(2) && lbl(2) === lbl(3))
    assert(lbl(4) !== lbl(0))
    // all three duplicate rows got the same label as each other (cell join)
    assert(lbl.values.toSet.size === 2)
  }

  test("ward prices weighted cells at point level, not cell level") {
    // 0.0 ×1000, 1.0 ×1000, 10.0, 12.0 with k=2. Point-level ward:
    // merging the two heavy cells costs 2·10⁶/2000·1 = 1000, while
    // C,D merge at 4 and B absorbs {C,D} at ~399 — so the answer is
    // {A} | {B,C,D}. An UNWEIGHTED d² seed would see d(A,B) = 1 as
    // the cheapest merge and wrongly output {A,B} | {C,D}.
    val rows = (0 until 1000).map(i => (i.toLong, 0.0)) ++
      (0 until 1000).map(i => (1000L + i, 1.0)) ++
      Seq((2000L, 10.0), (2001L, 12.0))
    val df = rows.toDF("id", "x")
    val lbl = labelsOf(Agglom.cluster(df, Seq(col("x")), col("id"), 2, "ward"))
    assert(lbl(0L) !== lbl(1000L))        // A alone, B split from A
    assert(lbl(1000L) === lbl(2000L))     // B with C
    assert(lbl(2000L) === lbl(2001L))     // and D
  }

  test("merge ties resolve by coordinate order, not shuffle layout") {
    // cells {0, 1, 2}, single linkage, k=2: d(0,1) = d(1,2) = 1 is a
    // tie; cells are sorted by coordinate before the merge loop, so
    // the smallest-(i,j) rule always picks (0,1) → {0,1} | {2},
    // regardless of how the groupBy collect order shifts with the
    // partition layout.
    for (parts <- Seq(1, 3, 7)) {
      val df = oneD(Seq(2.0, 0.0, 1.0)).repartition(parts)
      val lbl = labelsOf(Agglom.cluster(df, Seq(col("x")), col("id"), 2, "single"))
      assert(lbl(1) === lbl(2), s"parts=$parts")  // x=0 with x=1
      assert(lbl(0) !== lbl(1), s"parts=$parts")  // x=2 alone
    }
  }

  test("ward recovers planted 2-d blobs; labels follow lex-min order") {
    val blobs = for {
      (cx, cy, b) <- Seq((0.0, 0.0, 0), (50.0, 0.0, 1), (100.0, 30.0, 2))
      i <- 0 until 8
    } yield (b * 8L + i, cx + i % 3, cy + i / 3, b)
    val df = blobs.toDF("id", "x", "y", "band")
    val out = Agglom.cluster(df, Seq(col("x"), col("y")), col("id"), 3, "ward")
    val joined = out.join(df.select("id", "band"), "id")
    // exact recovery AND deterministic numbering: label == band index
    // because bands ascend in x (lex-min member order)
    assert(joined.filter(col("label") =!= col("band")).count() === 0)
  }

  test("cosine affinity clusters by direction, not magnitude") {
    val pts = Seq(
      (0L, 1.0, 0.1), (1L, 10.0, 1.0), (2L, 100.0, 10.0), // along (1, .1)
      (3L, 0.1, 1.0), (4L, 1.0, 10.0), (5L, 10.0, 100.0)  // along (.1, 1)
    ).toDF("id", "x", "y")
    val lbl = labelsOf(Agglom.cluster(
      pts, Seq(col("x"), col("y")), col("id"), 2, "average", "cosine"))
    assert(lbl(0) === lbl(1) && lbl(1) === lbl(2))
    assert(lbl(3) === lbl(4) && lbl(4) === lbl(5))
    assert(lbl(0) !== lbl(3))
  }

  test("reference validation + O(m^2) guard raise") {
    val df = oneD(Seq(1, 2, 3, 4))
    intercept[IllegalArgumentException] {
      Agglom.cluster(df, Seq(col("x")), col("id"), 2, "centroid")
    }
    intercept[IllegalArgumentException] { // ward ⇒ euclidean (ref :52-53)
      Agglom.cluster(df, Seq(col("x")), col("id"), 2, "ward", "cosine")
    }
    intercept[IllegalArgumentException] { // driver state bound
      Agglom.cluster(df, Seq(col("x")), col("id"), 2, "single", maxReps = 3)
    }
    intercept[IllegalArgumentException] { // fewer cells than clusters
      Agglom.cluster(df, Seq(col("x")), col("id"), 5, "single")
    }
  }
}
