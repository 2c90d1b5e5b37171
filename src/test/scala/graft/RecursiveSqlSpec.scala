package graft

import graft.operators.RecursiveSql
import org.apache.spark.sql.functions._

/**
 * SQL-surface recursion contracts: the UNION (distinct) linear-recursion
 * rewrite terminates on cyclic graphs and matches a driver-side closure;
 * UNION ALL and plain SQL delegate to the native parser; the column-list
 * rename applies; divergence throws instead of looping forever.
 */
class RecursiveSqlSpec extends SparkSpec {

  test("UNION-distinct recursion computes transitive closure on a CYCLIC graph") {
    import spark.implicits._
    // ring 0-1-2-3-0 plus a separate edge 10-11; symmetrized edges are
    // cyclic, so UNION ALL recursion would never terminate — UNION must
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 0L), (10L, 11L))
    edges.toDF("ea", "eb")
      .select(col("ea").as("a"), col("eb").as("b"))
      .union(edges.toDF("ea", "eb").select(col("eb").as("a"), col("ea").as("b")))
      .createOrReplaceTempView("rs_edges")
    val got = RecursiveSql.sql(spark,
      """WITH RECURSIVE reach(a, b) AS (
        |  SELECT a, b FROM rs_edges
        |  UNION
        |  SELECT r.a, e.b FROM reach r JOIN rs_edges e ON r.b = e.a)
        |SELECT DISTINCT a AS id_a, b AS id_b FROM reach WHERE a < b
        |ORDER BY id_a, id_b""".stripMargin)
      .as[(Long, Long)].collect().toSet
    // closure of the 4-ring is all ordered pairs within {0,1,2,3}
    // (self-pairs excluded by a < b); the 2-component contributes one
    val ring = for (i <- 0L to 3L; j <- i + 1 to 3L) yield (i, j)
    assert(got == ring.toSet + ((10L, 11L)))
  }

  test("UNION ALL recursion and plain SQL delegate to the native parser") {
    import spark.implicits._
    val nums = RecursiveSql.sql(spark,
      "WITH RECURSIVE t(n) AS (SELECT 1 UNION ALL SELECT n+1 FROM t WHERE n < 5) " +
        "SELECT * FROM t ORDER BY n").as[Int].collect().toSeq
    assert(nums == (1 to 5))
    assert(RecursiveSql.sql(spark, "SELECT 2 + 2").head().getInt(0) == 4)
  }

  test("column list renames the CTE's output columns") {
    import spark.implicits._
    Seq((1L, 2L), (2L, 3L)).toDF("x", "y").createOrReplaceTempView("rs_cl")
    val got = RecursiveSql.sql(spark,
      """WITH RECURSIVE hop(src, dst) AS (
        |  SELECT x, y FROM rs_cl
        |  UNION
        |  SELECT h.src, e.y FROM hop h JOIN rs_cl e ON h.dst = e.x)
        |SELECT src, dst FROM hop ORDER BY src, dst""".stripMargin)
      .as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 2L), (1L, 3L), (2L, 3L)))
  }

  test("trailing CTEs after the recursive one are honored") {
    import spark.implicits._
    Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("x", "y")
      .createOrReplaceTempView("rs_multi")
    val got = RecursiveSql.sql(spark,
      """WITH RECURSIVE hop(src, dst) AS (
        |  SELECT x, y FROM rs_multi
        |  UNION
        |  SELECT h.src, e.y FROM hop h JOIN rs_multi e ON h.dst = e.x),
        |far AS (SELECT src, max(dst) AS m FROM hop GROUP BY src)
        |SELECT src, m FROM far ORDER BY src""".stripMargin)
      .as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 4L), (2L, 4L), (3L, 4L)))
  }

  test("comments and quoted literals inside the CTE body don't corrupt the split") {
    import spark.implicits._
    Seq((1L, 2L), (2L, 3L)).toDF("x", "y").createOrReplaceTempView("rs_cm")
    val got = RecursiveSql.sql(spark,
      """WITH RECURSIVE hop(src, dst) AS (
        |  -- base case ) UNION (this comment must be skipped
        |  SELECT x, y FROM rs_cm /* ) another UNION trap */
        |  UNION
        |  SELECT h.src, e.y -- it''s the step
        |  FROM hop h JOIN rs_cm e ON h.dst = e.x)
        |SELECT src, dst FROM hop ORDER BY src, dst""".stripMargin)
      .as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 2L), (1L, 3L), (2L, 3L)))
  }

  test("non-linear recursion (two self-references) is rejected, not miscomputed") {
    import spark.implicits._
    Seq((1L, 2L)).toDF("x", "y").createOrReplaceTempView("rs_nl")
    val e = intercept[IllegalArgumentException] {
      RecursiveSql.sql(spark,
        """WITH RECURSIVE r(a, b) AS (
          |  SELECT x, y FROM rs_nl
          |  UNION
          |  SELECT r1.a, r2.b FROM r r1 JOIN r r2 ON r1.b = r2.a)
          |SELECT * FROM r""".stripMargin)
    }
    assert(e.getMessage.contains("more than once"))
  }

  test("a pre-existing temp view with the CTE's name is shadowed, not clobbered") {
    import spark.implicits._
    Seq(Tuple1(99L)).toDF("marker").createOrReplaceTempView("shadowed")
    Seq((1L, 2L)).toDF("x", "y").createOrReplaceTempView("rs_sh")
    val got = RecursiveSql.sql(spark,
      """WITH RECURSIVE shadowed(a, b) AS (
        |  SELECT x, y FROM rs_sh
        |  UNION
        |  SELECT s.a, e.y FROM shadowed s JOIN rs_sh e ON s.b = e.x)
        |SELECT a, b FROM shadowed""".stripMargin)
      .as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 2L)))
    // the outer view survives the query untouched
    assert(spark.table("shadowed").as[Long].head() == 99L)
  }

  test("a first CTE that never references itself delegates to the native parser") {
    import spark.implicits._
    Seq((1L, 2L)).toDF("x", "y").createOrReplaceTempView("rs_nr")
    val got = RecursiveSql.sql(spark,
      """WITH RECURSIVE t(a) AS (SELECT x FROM rs_nr UNION SELECT y FROM rs_nr)
        |SELECT a FROM t ORDER BY a""".stripMargin)
      .as[Long].collect().toSeq
    assert(got == Seq(1L, 2L))
  }

  test("a non-recursive CTE BEFORE the recursive one is honored") {
    import spark.implicits._
    Seq((1L, 2L), (2L, 3L), (8L, 9L)).toDF("x", "y")
      .createOrReplaceTempView("rs_lead")
    val got = RecursiveSql.sql(spark,
      """WITH RECURSIVE small AS (SELECT x, y FROM rs_lead WHERE x < 5),
        |hop(src, dst) AS (
        |  SELECT x, y FROM small
        |  UNION
        |  SELECT h.src, e.y FROM hop h JOIN small e ON h.dst = e.x)
        |SELECT src, dst FROM hop ORDER BY src, dst""".stripMargin)
      .as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 2L), (1L, 3L), (2L, 3L)))
  }

  test("two independent recursive CTEs in one list, the second reading the first") {
    import spark.implicits._
    Seq((1L, 2L), (2L, 3L)).toDF("x", "y").createOrReplaceTempView("rs_two")
    val got = RecursiveSql.sql(spark,
      """WITH RECURSIVE hop(src, dst) AS (
        |  SELECT x, y FROM rs_two
        |  UNION
        |  SELECT h.src, e.y FROM hop h JOIN rs_two e ON h.dst = e.x),
        |cnt(src, n) AS (
        |  SELECT src, CAST(1 AS BIGINT) FROM hop WHERE src = 1
        |  UNION
        |  SELECT src, n + 1 FROM cnt WHERE n < 3)
        |SELECT src, max(n) AS m FROM cnt GROUP BY src""".stripMargin)
      .as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 3L)))
  }

  test("UNION ALL recursion inside a list with UNION-distinct recursion") {
    import spark.implicits._
    val got = RecursiveSql.sql(spark,
      """WITH RECURSIVE ser(n) AS (
        |  SELECT 1 UNION ALL SELECT n + 1 FROM ser WHERE n < 4),
        |dbl(n) AS (
        |  SELECT n * 2 FROM ser
        |  UNION
        |  SELECT n + 2 FROM dbl WHERE n < 10)
        |SELECT n FROM dbl ORDER BY n""".stripMargin)
      .as[Int].collect().toSeq
    // base {2,4,6,8}; step adds 2 while n < 10 → closure {2,4,6,8,10}
    assert(got == Seq(2, 4, 6, 8, 10))
  }

  test("self-reference in the non-recursive term is rejected") {
    import spark.implicits._
    Seq((1L, 2L)).toDF("x", "y").createOrReplaceTempView("rs_bt")
    val e = intercept[IllegalArgumentException] {
      RecursiveSql.sql(spark,
        """WITH RECURSIVE r(a, b) AS (
          |  SELECT x, y FROM r
          |  UNION
          |  SELECT a, b FROM r WHERE a < 5)
          |SELECT * FROM r""".stripMargin)
    }
    assert(e.getMessage.contains("non-recursive term"))
  }

  test("fixpoint closure equals a driver BFS closure on random graphs") {
    import spark.implicits._
    val rnd = new scala.util.Random(41)
    for (trial <- 0 until 3) {
      val n = 12 + trial * 4
      val edges = (0 until n * 2).map(_ => (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter(e => e._1 != e._2).distinct
      edges.toDF("a", "b").createOrReplaceTempView("rs_rand")
      val got = RecursiveSql.sql(spark,
        """WITH RECURSIVE r(a, b) AS (
          |  SELECT a, b FROM rs_rand
          |  UNION
          |  SELECT r.a, e.b FROM r JOIN rs_rand e ON r.b = e.a)
          |SELECT a, b FROM r""".stripMargin)
        .as[(Long, Long)].collect().toSet
      // reference closure: directed reachability in >= 1 hops
      val adj = edges.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      def reach(s: Long): Set[Long] = {
        var seen = Set.empty[Long]
        var frontier = adj.getOrElse(s, Set.empty)
        while (frontier.nonEmpty) {
          seen ++= frontier
          frontier = frontier.flatMap(v => adj.getOrElse(v, Set.empty)) -- seen
        }
        seen
      }
      val expect = adj.keySet.flatMap(s => reach(s).map(t => (s, t)))
      assert(got == expect, s"trial $trial: closure mismatch")
    }
  }

  test("UNION DISTINCT is accepted as the explicit spelling of UNION") {
    import spark.implicits._
    Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("x", "y")
      .createOrReplaceTempView("rs_ud")
    val got = RecursiveSql.sql(spark,
      """WITH RECURSIVE hop(src, dst) AS (
        |  SELECT x, y FROM rs_ud
        |  UNION DISTINCT
        |  SELECT h.src, e.y FROM hop h JOIN rs_ud e ON h.dst = e.x)
        |SELECT DISTINCT src, dst FROM hop WHERE src < dst
        |ORDER BY src, dst""".stripMargin)
      .as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 2L), (1L, 3L), (2L, 3L)))
  }

  test("an alias sharing the CTE's name is shadowing, not self-reference") {
    import spark.implicits._
    // PostgreSQL scoping: inside CTE r, `FROM rs_sh r` binds r to the
    // TABLE ALIAS — the CTE is not referenced, so this is a plain
    // non-recursive CTE and must not be rejected or routed through the
    // fixpoint. Pre-r8 counting flagged the alias (and the bare column
    // named r) as self-references.
    Seq((1L, 5L), (2L, 6L)).toDF("k", "r").createOrReplaceTempView("rs_sh")
    val got = RecursiveSql.sql(spark,
      """WITH RECURSIVE r AS (
        |  SELECT r.k, r FROM rs_sh r
        |  UNION
        |  SELECT k + 10, r FROM rs_sh)
        |SELECT k FROM r ORDER BY k""".stripMargin)
      .as[Long].collect().toSet
    assert(got == Set(1L, 2L, 11L, 12L))
  }

  test("reference counting is positional: FROM-list commas count, SELECT-list commas don't") {
    assert(RecursiveSql.countRefs("SELECT a, r FROM t", "r") == 0)
    assert(RecursiveSql.countRefs("SELECT x FROM t, r", "r") == 1)
    assert(RecursiveSql.countRefs("SELECT x FROM r JOIN r ON 1=1", "r") == 2)
    assert(RecursiveSql.countRefs("SELECT x FROM t WHERE y IN (SELECT z FROM r)", "r") == 1)
    // GROUP BY commas are outside the FROM list; qualifiers/schema refs don't count
    assert(RecursiveSql.countRefs("SELECT a, count(*) FROM t GROUP BY a, r", "r") == 0)
    assert(RecursiveSql.countRefs("SELECT r.x FROM t r WHERE r.x > 0", "r") == 0)
    assert(RecursiveSql.countRefs("SELECT x FROM r.t", "r") == 0)
    // a subquery's SELECT list never inherits the outer FROM state
    assert(RecursiveSql.countRefs("SELECT x FROM t, (SELECT a, r FROM u) s", "r") == 0)
    // parenthesized join trees: the first identifier inside '(' after
    // FROM/JOIN/comma is still in table position (legal PG syntax)
    assert(RecursiveSql.countRefs("SELECT x FROM (r JOIN e ON r.k = e.k)", "r") == 1)
    assert(RecursiveSql.countRefs("SELECT x FROM ((r JOIN e ON 1=1) JOIN f ON 1=1)", "r") == 1)
    assert(RecursiveSql.countRefs("SELECT x FROM t, (r JOIN e ON 1=1)", "r") == 1)
    assert(RecursiveSql.countRefs("SELECT x FROM t JOIN (r JOIN e ON 1=1) ON 1=1", "r") == 1)
    // ...but a derived table's SELECT list still doesn't count, and a
    // scalar paren (not in table position) is unaffected
    assert(RecursiveSql.countRefs("SELECT x FROM (SELECT a, r FROM u) s", "r") == 0)
    assert(RecursiveSql.countRefs("SELECT x FROM t WHERE y = (1 + 2)", "r") == 0)
    assert(RecursiveSql.countRefs("SELECT x FROM (VALUES (1), (2)) v(r)", "r") == 0)
  }

  test("divergent recursion throws at maxIter instead of running forever") {
    import spark.implicits._
    Seq(Tuple1(0L)).toDF("n").createOrReplaceTempView("rs_div")
    val e = intercept[IllegalStateException] {
      RecursiveSql.sql(spark,
        """WITH RECURSIVE t(n) AS (
          |  SELECT n FROM rs_div
          |  UNION
          |  SELECT n + 1 FROM t)
          |SELECT count(*) AS c FROM t""".stripMargin, maxIter = 5)
    }
    assert(e.getMessage.contains("WITH RECURSIVE t"))
  }
}
