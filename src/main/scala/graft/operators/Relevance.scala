package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Corpus relevance scoring — Okapi BM25 (Robertson & Spärck Jones;
 * the ranking function behind PG/openGauss full-text `ts_rank`-style
 * retrieval, re-expressed for a batch corpus scan).
 *
 * Shape chosen for 100 TB: the query term list is tiny and KNOWN, so
 * nothing per-document ever shuffles —
 *   pass 1: one map-side-combinable global aggregate produces the ONLY
 *           coordination state: N, Σdl, and one document-frequency
 *           counter per term (a single 1-row result);
 *   pass 2: map-only scoring — per-doc tf_t comes from
 *           `size(filter(tokens, = term))` (codegen'd, no explode, no
 *           groupBy), the 1-row stats frame rides a broadcast join.
 * Contrast with the naive explode→groupBy(doc,term)→join plan, which
 * shuffles one row per (doc, term) occurrence — O(corpus tokens) —
 * for the same answer.
 *
 * Determinism: tf/df/dl/N are integers, Σdl an integer sum, and the
 * per-doc score sums the per-term weights in the FIXED order of
 * `terms` (a literal expression chain, not a float aggregation), so
 * the result is a pure function of the input set — no
 * aggregation-order float drift, which is what lets the gate be
 * hash-exact at round(6).
 */
object Relevance {

  /**
   * BM25 scores for every document matching at least one query term.
   * Output: (id, n_hits, score) where n_hits = total query-term
   * occurrences and score = Σ_t idf(t) · tf·(k1+1)/(tf + k1·(1−b+b·dl/avgdl)),
   * idf(t) = ln((N − df + 0.5)/(df + 0.5) + 1).
   */
  def bm25(docs: DataFrame, idCol: String, textCol: String,
      terms: Seq[String], k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "bm25 needs at least one query term")
    val toks = TextAnalysis.tokens(col(textCol))
    def tfCol(i: Int) = col(s"tf_$i")
    // single map-only pass: doc length + one tf counter per term
    val base = docs.select(
      col(idCol).as("id") +: size(toks).cast("long").as("dl") +:
        terms.zipWithIndex.map { case (t, i) =>
          size(filter(toks, x => x === lit(t))).cast("long").as(s"tf_$i")
        }: _*)
    // the ONLY aggregate: 1 row, map-side combinable, integer-exact
    val aggs = count(lit(1)).as("n") +: sum(col("dl")).as("sumdl") +:
      terms.indices.map(i => sum((tfCol(i) > 0L).cast("long")).as(s"df_$i"))
    val stats = base.agg(aggs.head, aggs.tail: _*)
    val avgdl = col("sumdl").cast("double") / col("n").cast("double")
    def weight(i: Int): Column = {
      val tf = tfCol(i).cast("double")
      val dfT = col(s"df_$i").cast("double")
      val idf = log((col("n").cast("double") - dfT + lit(0.5)) /
        (dfT + lit(0.5)) + lit(1.0))
      idf * (tf * lit(k1 + 1.0)) /
        (tf + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl").cast("double") / avgdl))
    }
    // fixed-order chain: term 0 + term 1 + ... — deterministic fp sum
    val score = terms.indices.map(weight).reduce(_ + _)
    val hits = terms.indices.map(tfCol(_)).reduce(_ + _)
    base.join(broadcast(stats))
      .filter(hits > 0L)
      .select(col("id"), hits.as("n_hits"), round(score, 6).as("score"))
  }

  /**
   * BM25 RETRIEVAL: top-k documents per query for a query TABLE — the
   * batch search surface over [[bm25]]'s scoring (a user of the
   * reference's full-text retrieval runs many queries, not one
   * literal term list).
   *
   * Scale asymmetry (the decontaminate/eval-set shape): queries are
   * tiny, the corpus is 100 TB. The query vocabulary BROADCASTS; the
   * corpus tokenizes once and explodes ONLY tokens that survive the
   * broadcast semi-join — the (doc, term) shuffle is bounded by
   * query-vocabulary hits, not corpus tokens. Stats stay 1-row (N,
   * Σdl) + per-term df (vocabulary-sized, broadcast back).
   *
   * Determinism: per-(doc, term) BM25 weights are double expressions
   * (fixed form, no accumulation), ROUNDED to 6dp and summed as
   * DECIMAL(18,6) — exact and order-invariant, unlike a double SUM
   * whose partial order differs per engine. Ranking orders by the
   * exact decimal score (doc id tiebreak), so top-k sets match the
   * oracle bit-for-bit.
   *
   * Ranking device: the bounded PAYLOAD heap aggregate, not a
   * row_number window — with common query terms the per-query
   * candidate set grows with the corpus, and a window would sort all
   * of it per qid to keep k rows (see the in-method comment).
   *
   * Output: (qid, rank 1..k, doc_id, n_terms, score DOUBLE).
   */
  def searchTopK(docs: DataFrame, idCol: String, textCol: String,
      queries: DataFrame, qidCol: String, qtextCol: String, k: Int,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(k >= 1, "searchTopK needs k >= 1")
    val qterms = queries.select(col(qidCol).as("qid"),
        explode(array_distinct(filter(
          TextAnalysis.tokens(col(qtextCol)), t => t =!= ""))).as("term"))
    val vocab = qterms.select(col("term")).distinct()
    val base = docs.select(col(idCol).as("id"),
      TextAnalysis.tokens(col(textCol)).as("toks"))
    // 1-row global stats: integer-exact, map-side combinable
    val stats = base.agg(count(lit(1)).as("n"),
      sum(size(col("toks")).cast("long")).as("sumdl"))
    // corpus explode survives only through the broadcast vocabulary
    val tf = base
      .select(col("id"), size(col("toks")).cast("long").as("dl"),
        explode(col("toks")).as("term"))
      .join(broadcast(vocab), "term")
      .groupBy(col("id"), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val df_ = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val scored = tf
      .join(broadcast(df_), "term")
      .join(broadcast(stats))
      .select(col("id"), col("term"), {
        val tfD = col("tf").cast("double")
        val dfD = col("df").cast("double")
        val nD = col("n").cast("double")
        val avgdl = col("sumdl").cast("double") / nD
        val idf = log((nD - dfD + lit(0.5)) / (dfD + lit(0.5)) + lit(1.0))
        val w = idf * (tfD * lit(k1 + 1.0)) /
          (tfD + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl").cast("double") / avgdl))
        round(w, 6).cast("decimal(18,6)").as("w")
      })
    val perQuery = scored
      .join(broadcast(qterms), "term")
      .groupBy(col("qid"), col("id"))
      .agg(sum(col("w")).as("sw"), count(lit(1)).as("n_terms"))
    // Per-query top-k via the BOUNDED HEAP aggregate, not a row_number
    // window: with common query terms the per-qid candidate set grows
    // with the corpus, and a window sorts ALL of it to keep k rows. The
    // heap keeps k*(24 bytes) per qid, map-side partials ship at most k
    // entries per partition — the shuffle never carries the candidates.
    // Order equivalence with the old (sw DESC, id ASC) window: sw is an
    // exact DECIMAL(·,6), so sw*1e6 is an exact integer long; negating
    // it makes the heap's ascending (dist, id) order exactly (sw desc,
    // id asc). |sw|*1e6 < 2^53 so the long→double carry is lossless,
    // and score = dist / -1e6 is the same correctly-rounded double as
    // the old sw.cast(double).
    val negMicros = (col("sw") * lit(-1000000)).cast("long").cast("double")
    perQuery
      .groupBy(col("qid"))
      .agg(Knn.topKPayloadPairs(col("id").cast("long"), negMicros,
        col("n_terms"), k).as("tk"))
      .select(col("qid"), posexplode(col("tk")).as(Seq("i", "e")))
      .select(col("qid"), (col("i") + 1).as("rank"), col("e.nid").as("doc_id"),
        col("e.payload").as("n_terms"),
        (col("e.dist") / lit(-1000000.0)).as("score"))
  }

  /**
   * Reciprocal-rank fusion (Cormack, Clarke & Buettcher, SIGIR 2009)
   * of per-query ranked lists — the HYBRID retrieval shape: fuse a
   * dense (vector KNN) and a lexical (BM25) ranking without score
   * calibration, rrf(d) = Σ_lists 1/(kRrf + rank_list(d)). This is
   * how pgvector deployments combine `ORDER BY embedding <=> q` with
   * full-text ranking, re-expressed for batch query tables.
   *
   * Inputs: each list is (qid, rank, doc_id) with rank 1-based; a doc
   * missing from a list contributes nothing (standard RRF).
   *
   * Scale shape: the inputs are ALREADY top-k bounded (k·|queries|
   * rows each — the expensive corpus passes happened inside the
   * rankers), so fusion touches no corpus-sized data: one union, one
   * (qid, doc) aggregate over ≤ Σk rows per query, and the bounded
   * payload heap for the final order. Nothing here grows with corpus
   * size.
   *
   * Determinism: each contribution 1/(kRrf+rank) is one IEEE divide of
   * small integers (identical in any engine), rounded to 6dp and
   * summed as DECIMAL(18,6) — order-invariant — and the final
   * (rrf desc, doc_id) order rides the exact decimal through the
   * heap's integer-micros key, the same device as [[searchTopK]].
   *
   * Output: (qid, rank 1..k, doc_id, n_lists, rrf DOUBLE).
   */
  def rrfFuse(lists: Seq[DataFrame], k: Int, kRrf: Int = 60): DataFrame = {
    require(lists.nonEmpty, "rrfFuse needs at least one ranked list")
    require(k >= 1, "rrfFuse needs k >= 1")
    require(kRrf >= 1, "rrfFuse needs kRrf >= 1")
    val contribs = lists.map(_.select(col("qid"), col("doc_id"),
      round(lit(1.0) / (lit(kRrf.toDouble) + col("rank").cast("double")), 6)
        .cast("decimal(18,6)").as("c")))
    val fused = contribs.reduce(_ unionByName _)
      .groupBy(col("qid"), col("doc_id"))
      .agg(sum(col("c")).as("sc"), count(lit(1)).as("n_lists"))
    // exact decimal micros → the ascending (dist, id) heap order is
    // exactly (rrf desc, doc_id asc); see searchTopK for the argument
    val negMicros = (col("sc") * lit(-1000000)).cast("long").cast("double")
    fused.groupBy(col("qid"))
      .agg(Knn.topKPayloadPairs(col("doc_id").cast("long"), negMicros,
        col("n_lists"), k).as("tk"))
      .select(col("qid"), posexplode(col("tk")).as(Seq("i", "e")))
      .select(col("qid"), (col("i") + 1).as("rank"),
        col("e.nid").as("doc_id"), col("e.payload").as("n_lists"),
        (col("e.dist") / lit(-1000000.0)).as("rrf"))
  }
}
