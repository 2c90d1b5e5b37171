package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Hierarchical (START WITH ... CONNECT BY PRIOR) queries — openGauss
 * ships Oracle-compatible hierarchical SQL (the kernel grammar accepts
 * START WITH / CONNECT BY / LEVEL / SYS_CONNECT_BY_PATH /
 * CONNECT_BY_ROOT / CONNECT_BY_ISLEAF; ref:
 * src/common/backend/parser/gram.y `start_with_clause` /
 * `connect_by_clause`). The batch analogue is a level-synchronous BFS
 * expansion of the parent equi-join.
 *
 * Semantics (CONNECT BY PRIOR id = parent):
 *  - START WITH rows seed the forest at LEVEL 1;
 *  - each round attaches rows whose `parentCol` equals a frontier id
 *    at LEVEL+1 — a node with several matching parent rows (or
 *    reachable from several roots) yields several output rows, exactly
 *    Oracle's row-per-path semantics;
 *  - output columns: id, level (LEVEL), root_id (CONNECT_BY_ROOT id),
 *    path (SYS_CONNECT_BY_PATH(id, '/')), is_leaf
 *    (CONNECT_BY_ISLEAF: no output row attaches under this row);
 *  - cycles: expansion past `maxDepth` throws — Oracle errors on
 *    cycles without NOCYCLE; a bounded-depth guard is the batch
 *    equivalent (reported depth, not a hang).
 *
 * Scale shape: each round equi-joins the edge table against the
 * CURRENT FRONTIER only (never the accumulated result), so total join
 * work across the run is O(edges × avg multiplicity); rounds = tree
 * depth; per-round states are lineage-truncated (Iterate.truncate).
 * Broadcast-small hierarchies (≤ Iterate.localEdgeThreshold nodes)
 * take the shared driver fast path — the same contract as CC/BFS/
 * PageRank — with spec-forced parity against the distributed loop.
 */
object Hierarchy {

  def connectBy(nodes: DataFrame, idCol: String, parentCol: String,
      startWith: Column, maxDepth: Int = 64): DataFrame = {
    require(maxDepth >= 1, "connectBy needs maxDepth >= 1")
    val spark = nodes.sparkSession
    val pairs = nodes.select(col(idCol).cast("long").as("c_id"),
      col(parentCol).cast("long").as("c_parent"))
    val cached = pairs.cache()
    try {
      val roots = nodes.filter(startWith).select(col(idCol).cast("long").as("id"))
      Iterate.collectIfSmall(cached) match {
        case Some(edges) =>
          localConnectBy(spark, edges, roots.collect().map(_.getLong(0)), maxDepth)
        case None => distributed(cached, roots, maxDepth)
      }
    } finally { cached.unpersist(blocking = false); () }
  }

  /** Level-synchronous distributed expansion; `edges` is (c_id, c_parent). */
  private def distributed(edges: DataFrame, roots: DataFrame,
      maxDepth: Int): DataFrame = {
    val base = Iterate.truncate(roots.select(col("id"),
      lit(1).as("level"), col("id").as("root_id"),
      concat(lit("/"), col("id").cast("string")).as("path"),
      lit(null).cast("long").as("parent")))
    val parts = scala.collection.mutable.ArrayBuffer(base)
    var frontier = base
    var depth = 1
    while (!frontier.isEmpty) {
      if (depth > maxDepth)
        throw new IllegalStateException(
          s"graft: connectBy exceeded maxDepth=$maxDepth (cycle, or raise maxDepth)")
      val next = Iterate.truncate(
        edges.join(frontier, edges("c_parent") === frontier("id"))
          .select(edges("c_id").as("id"),
            (frontier("level") + 1).as("level"),
            frontier("root_id"),
            concat(frontier("path"), lit("/"),
              edges("c_id").cast("string")).as("path"),
            edges("c_parent").as("parent")))
      parts += next
      frontier = next
      depth += 1
    }
    val acc = parts.reduce(_ unionByName _)
    // CONNECT_BY_ISLEAF: nothing in the RESULT attaches under the row
    val inner = acc.filter(col("level") > 1)
      .select(col("parent").as("pid")).distinct()
    acc.join(inner, acc("id") === inner("pid"), "left")
      .select(acc("id"), acc("level"), acc("root_id"), acc("path"),
        col("pid").isNull.as("is_leaf"))
  }

  /** Driver replica: same expansion order-insensitively, one pass. */
  private def localConnectBy(spark: SparkSession, edges: Array[(Long, Long)],
      roots: Array[Long], maxDepth: Int): DataFrame = {
    import spark.implicits._
    val children: Map[Long, Array[Long]] =
      edges.groupBy(_._2).map { case (p, a) => (p, a.map(_._1)) }
    final case class It(id: Long, level: Int, root: Long, path: String)
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Int, Long, String, Boolean)]
    var frontier: Array[It] = roots.map(r => It(r, 1, r, s"/$r"))
    var depth = 1
    while (frontier.nonEmpty) {
      if (depth > maxDepth)
        throw new IllegalStateException(
          s"graft: connectBy exceeded maxDepth=$maxDepth (cycle, or raise maxDepth)")
      val next = scala.collection.mutable.ArrayBuffer.empty[It]
      frontier.foreach { it =>
        val kids = children.getOrElse(it.id, Array.empty[Long])
        out += ((it.id, it.level, it.root, it.path, kids.isEmpty))
        kids.foreach(k => next += It(k, it.level + 1, it.root, it.path + "/" + k))
      }
      frontier = next.toArray
      depth += 1
    }
    out.toSeq.toDF("id", "level", "root_id", "path", "is_leaf")
  }
}
