package graft.operators

import graft.functions.{TopKPairsAgg, VectorFunctions => VF}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Bridge

/**
 * Exact KNN operators (reference: contrib/datavec/src/ivfscan.cpp exact
 * path — `ORDER BY embedding <-> q LIMIT k`).
 *
 * Scale design (SURVEY §5):
 *  - single-query top-k compiles to TakeOrderedAndProject: per-partition
 *    O(k) heap, driver merge of #partitions × k rows — no shuffle, no sort.
 *  - knn join broadcasts the query side and aggregates a bounded heap per
 *    query id: map-side partial heaps mean the shuffle carries at most
 *    k rows per (query, partition), never the corpus.
 */
object Knn {

  /** Single-query exact top-k: (id, dist) ascending, ties broken on id. */
  def exactTopK(corpus: DataFrame, vecCol: String, idCol: String,
      query: Array[Float], k: Int,
      dist: (Column, Column) => Column = VF.l2Distance): DataFrame =
    corpus
      .select(col(idCol), round(dist(col(vecCol), lit(query)), 6).as("dist"))
      .orderBy(col("dist"), col(idCol))
      .limit(k)

  /**
   * Bounded top-k aggregate over (id, dist) pairs: a Catalyst
   * TypedImperativeAggregate on primitive-array heaps (see TopKPairsAgg).
   * Partial (map-side) aggregation ships at most k pairs per partition
   * per group, as a flat 16-bytes-per-entry blob.
   */
  def topKPairs(idCol: Column, distCol: Column, k: Int): Column =
    Bridge.column(TopKPairsAgg(Bridge.expression(idCol),
      Bridge.expression(distCol), k).toAggregateExpression())

  /** [[topKPairs]] with a long payload column riding along each entry
    * (see [[graft.functions.TopKPayloadAgg]]) — for rankings that must
    * emit an auxiliary per-candidate aggregate without re-joining the
    * ranked rows back to the scored set. */
  def topKPayloadPairs(idCol: Column, distCol: Column, payloadCol: Column,
      k: Int): Column =
    Bridge.column(graft.functions.TopKPayloadAgg(Bridge.expression(idCol),
      Bridge.expression(distCol), Bridge.expression(payloadCol),
      k).toAggregateExpression())

  /**
   * Expand the array<struct<nid,dist>> produced by [[topKPairs]] into
   * (qid, rank, nid, dist) rows.
   */
  def explodeTopK(df: DataFrame): DataFrame =
    df.select(col("qid"), posexplode(col("nn")).as(Seq("pos", "e")))
      .select(col("qid"), (col("pos") + 1).as("rank"),
        col("e.nid").as("nid"), col("e.dist").as("dist"))

  /**
   * KNN join: for every row of `queries`, the k nearest rows of `corpus`.
   * Output: (qid, rank, id, dist). `queries` must be small enough to
   * broadcast (the common shape: |Q| ≪ |corpus|).
   */
  def knnJoin(queries: DataFrame, qVecCol: String, qIdCol: String,
      corpus: DataFrame, vecCol: String, idCol: String, k: Int,
      dist: (Column, Column) => Column = VF.l2Distance): DataFrame = {
    val q = broadcast(queries.select(col(qIdCol).as("qid"), col(qVecCol).as("qv")))
    val pairs = corpus.crossJoin(q)
      .select(col("qid"), col(idCol).cast("long").as("nid"),
        round(dist(col(vecCol), col("qv")), 6).as("dist"))
    explodeTopK(pairs
      .groupBy(col("qid"))
      .agg(topKPairs(col("nid"), col("dist"), k).as("nn")))
  }
}
