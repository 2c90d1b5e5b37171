package graft.operators

import graft.functions.{VectorFunctions => VF}
import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

import scala.collection.mutable

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

  /** Heap entry ordering: worst (largest dist, then largest id) at head. */
  private implicit val ord: Ordering[(Double, Long)] =
    Ordering.Tuple2(Ordering.Double.TotalOrdering, Ordering.Long)

  /**
   * Bounded top-k aggregator over (id, dist) pairs. The buffer is a
   * max-heap capped at k entries, so partial (map-side) aggregation ships
   * at most k pairs per partition per group.
   */
  final class TopKAgg(k: Int)
      extends Aggregator[(Long, Double), mutable.PriorityQueue[(Double, Long)], Seq[(Long, Double)]] {
    override def zero: mutable.PriorityQueue[(Double, Long)] =
      mutable.PriorityQueue.empty[(Double, Long)]
    override def reduce(h: mutable.PriorityQueue[(Double, Long)],
        a: (Long, Double)): mutable.PriorityQueue[(Double, Long)] = {
      h.enqueue((a._2, a._1))
      if (h.size > k) h.dequeue()
      h
    }
    override def merge(x: mutable.PriorityQueue[(Double, Long)],
        y: mutable.PriorityQueue[(Double, Long)]): mutable.PriorityQueue[(Double, Long)] = {
      y.foreach { e => x.enqueue(e); if (x.size > k) x.dequeue() }
      x
    }
    override def finish(h: mutable.PriorityQueue[(Double, Long)]): Seq[(Long, Double)] =
      h.dequeueAll[(Double, Long)].reverse.map(e => (e._2, e._1)).toIndexedSeq
    override def bufferEncoder: Encoder[mutable.PriorityQueue[(Double, Long)]] =
      Encoders.kryo[mutable.PriorityQueue[(Double, Long)]]
    override def outputEncoder: Encoder[Seq[(Long, Double)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Long, Double)]]()
  }

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
    // bounded-heap partial aggregate per query id
    val topk = udaf(new TopKAgg(k))
    pairs
      .groupBy(col("qid"))
      .agg(topk(col("nid"), col("dist")).as("nn"))
      .select(col("qid"), posexplode(col("nn")).as(Seq("pos", "e")))
      .select(col("qid"), (col("pos") + 1).as("rank"),
        col("e._1").as("nid"), col("e._2").as("dist"))
  }
}
