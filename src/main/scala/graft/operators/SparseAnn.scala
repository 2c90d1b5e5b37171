package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Sparse-vector top-k retrieval via INVERTED POSTINGS — the batch
 * analogue of the reference's sparsevec index search
 * (contrib/datavec/sql/datavec--0.7.2.sql:348 hnsw_sparsevec_support;
 * sparsevec.cpp's merge-scan distance is the exact kernel this must
 * agree with).
 *
 * Scale shape (the reason postings beat per-pair merge scans at
 * 100 TB): the corpus explodes ONCE into (index, value) postings; the
 * query entries — tiny — broadcast; an equi-join on the dimension
 * index produces exactly the nonzero partial products, map-side
 * combined per (qid, doc); ranking is the bounded-heap top-k
 * aggregate (k·16 bytes per query crosses the shuffle, never the
 * candidate set). No crossJoin, no per-qid window sort, no dense
 * densification.
 *
 * Determinism: values are scalar-quantized to milli-units with
 * `floor(v·1000)` — floor of an exactly-computed double is
 * unambiguous in every engine (no round-half ties) — so partial
 * products and their sums are exact LONG integer arithmetic: the
 * result is a pure function of the input set, bit-identical to a
 * dense/merge-scan oracle using the same quantization.
 *
 * Retrieval semantics: a document is a candidate iff it shares ≥ 1
 * stored dimension with the query (the inverted-index contract);
 * `n_common` reports that overlap. Scores are inner products,
 * descending (pgvector `<#>` negates; we keep the raw dot).
 */
object SparseAnn {

  /** floor-quantize to milli-units as LONG (exact, tie-free). */
  private def quant(v: Column): Column =
    floor(v.cast("double") * lit(1000)).cast("long")

  /** (id, i, qv) postings from a sparse (indices, values) column pair,
    * quantized, zero entries dropped. */
  private def postings(df: DataFrame, idCol: String, idName: String,
      idxCol: String, valCol: String, valName: String): DataFrame =
    df.select(col(idCol).cast("long").as(idName),
        explode(arrays_zip(col(idxCol).as("i"), col(valCol).as("v"))).as("e"))
      .select(col(idName), col("e.i").as("i"), quant(col("e.v")).as(valName))
      .filter(col(valName) =!= 0L)

  /**
   * Top-k corpus rows per query by quantized inner product.
   * `corpus`: (idCol, idxCol array<int>, valCol array<numeric>);
   * `queries`: same sparse shape, small enough to broadcast.
   * Output: (qid, rank, id, n_common, score) — rank 1..k by
   * (score desc, id asc), score = dot in original units (micro-exact).
   */
  def topKInnerProduct(corpus: DataFrame, idCol: String, idxCol: String,
      valCol: String, queries: DataFrame, qidCol: String, qIdxCol: String,
      qValCol: String, k: Int): DataFrame = {
    require(k >= 1, "topKInnerProduct needs k >= 1")
    val post = postings(corpus, idCol, "id", idxCol, valCol, "cv")
    val qpost = postings(queries, qidCol, "qid", qIdxCol, qValCol, "qv")
    val partial = post.join(broadcast(qpost), "i")
      .groupBy(col("qid"), col("id"))
      // exact LONG micro^2-unit dot + overlap count, map-side combined
      .agg(sum(col("cv") * col("qv")).as("dot"),
        count(lit(1)).as("n_common"))
    // bounded payload heap: ascending (-dot, id) == (dot desc, id asc);
    // |dot| < 2^53 so the long->double carry is lossless. n_common
    // rides as the heap payload — no join back to the scored set.
    partial
      .groupBy(col("qid"))
      .agg(Knn.topKPayloadPairs(col("id"), negate(col("dot")).cast("double"),
        col("n_common"), k).as("tk"))
      .select(col("qid"), posexplode(col("tk")).as(Seq("i", "e")))
      .select(col("qid"), (col("i") + 1).as("rank"), col("e.nid").as("id"),
        col("e.payload").as("n_common"),
        (col("e.dist") / lit(-1000000.0)).as("score"))
  }
}
