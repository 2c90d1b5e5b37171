package graft

import graft.operators.Hierarchy
import org.apache.spark.sql.functions._

/**
 * CONNECT BY contracts: Oracle row-per-path semantics on a hand-built
 * forest, cycle detection, and driver-fast-path / distributed-loop
 * parity (the same spec-forced discipline as CC/BFS/PageRank).
 */
class HierarchySpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(Long, Long)], roots: Set[Long],
      maxDepth: Int = 64) =
    Hierarchy.connectBy(rows.toDF("id", "parent"), "id", "parent",
        startWith = col("id").isInCollection(roots), maxDepth)
      .select("id", "level", "root_id", "path", "is_leaf")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getString(3),
        r.getBoolean(4))).toSet

  //     1          2
  //    / \
  //   10  11
  //   |
  //  100
  private val forest = Seq((1L, 0L), (2L, 0L), (10L, 1L), (11L, 1L), (100L, 10L))

  test("levels, roots, paths and leaves on a hand-built forest") {
    assert(run(forest, Set(1L, 2L)) == Set(
      (1L, 1, 1L, "/1", false),
      (2L, 1, 2L, "/2", true),
      (10L, 2, 1L, "/1/10", false),
      (11L, 2, 1L, "/1/11", true),
      (100L, 3, 1L, "/1/10/100", true)))
  }

  test("a node reachable twice yields one row per path (Oracle semantics)") {
    // node 7 attaches under BOTH 1 and 2 (duplicate id rows with
    // different parents)
    val rows = Seq((1L, 0L), (2L, 0L), (7L, 1L), (7L, 2L))
    assert(run(rows, Set(1L, 2L)) == Set(
      (1L, 1, 1L, "/1", false),
      (2L, 1, 2L, "/2", false),
      (7L, 2, 1L, "/1/7", true),
      (7L, 2, 2L, "/2/7", true)))
  }

  test("cycles throw instead of hanging") {
    val cyc = Seq((1L, 0L), (2L, 1L), (1L, 2L)) // 1 -> 2 -> 1
    val e = intercept[IllegalStateException](run(cyc, Set(1L), maxDepth = 10))
    assert(e.getMessage.contains("maxDepth"))
  }

  test("distributed loop matches the driver fast path bit-for-bit") {
    val key = "graft.fixpoint.localEdgeThreshold"
    val fast = run(forest, Set(1L, 2L))
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "0")
    try assert(run(forest, Set(1L, 2L)) == fast)
    finally prev.fold(spark.conf.unset(key))(spark.conf.set(key, _))
  }

  test("distributed parity on a real slice (customer digit forest)") {
    // single-digit keys take a sentinel parent: custkey 0 is its own
    // div-10 parent (a genuine self-loop the cycle guard catches)
    val cust = spark.read.parquet(s"$sfDir/customer.parquet")
      .select(col("c_custkey"), expr(
        "CASE WHEN c_custkey <= 9 THEN -1 ELSE c_custkey DIV 10 END")
        .as("c_parent"))
    def go() = Hierarchy.connectBy(cust, "c_custkey", "c_parent",
        startWith = col("c_custkey") <= 9)
      .select("id", "level", "root_id", "path", "is_leaf")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getString(3),
        r.getBoolean(4))).toSet
    val fast = go()
    assert(fast.nonEmpty && fast.exists(_._2 > 1))
    // every customer key is reachable from the single-digit roots
    assert(fast.size == cust.count())
    val key = "graft.fixpoint.localEdgeThreshold"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "0")
    try assert(go() == fast)
    finally prev.fold(spark.conf.unset(key))(spark.conf.set(key, _))
  }
}
