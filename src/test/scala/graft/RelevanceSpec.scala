package graft

import graft.operators.Relevance
import org.apache.spark.sql.functions._

/**
 * BM25 contracts: the operator's scores equal a hand-computed closed
 * form on a tiny corpus, and the standard ranking invariants hold
 * (rare terms outweigh common ones; more occurrences never score less;
 * longer documents are penalized at equal tf).
 */
class RelevanceSpec extends SparkSpec {
  import spark.implicits._

  test("bm25 equals the closed form on a 4-doc corpus") {
    // corpus: N=4, terms 'x' (df=1, rare) and 'y' (df=3, common)
    val docs = Seq(
      (0L, "x y a b"),   // tf_x=1 tf_y=1 dl=4
      (1L, "y y a b c"), // tf_x=0 tf_y=2 dl=5
      (2L, "y a"),       // tf_x=0 tf_y=1 dl=2
      (3L, "a b c d e")  // no hits — must be absent from the output
    ).toDF("id", "text")
    val got = Relevance.bm25(docs, "id", "text", Seq("x", "y"))
      .orderBy("id").collect()
    assert(got.map(_.getLong(0)).toSeq == Seq(0L, 1L, 2L))

    val n = 4.0; val sumdl = 16.0; val avgdl = sumdl / n
    val k1 = 1.2; val b = 0.75
    def idf(df: Double) = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
    def w(tf: Double, df: Double, dl: Double) =
      idf(df) * (tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + b * dl / avgdl))
    def score(tfx: Double, tfy: Double, dl: Double) =
      math.rint((w(tfx, 1.0, dl) + w(tfy, 3.0, dl)) * 1e6) / 1e6
    val want = Seq(score(1, 1, 4), score(0, 2, 5), score(0, 1, 2))
    got.map(_.getDouble(2)).zip(want).foreach { case (g, e) =>
      assert(math.abs(g - e) < 1e-9, s"got $g want $e")
    }
    // n_hits counts occurrences, not matched terms
    assert(got.map(_.getLong(1)).toSeq == Seq(2L, 2L, 1L))
  }

  test("bm25 ranking invariants on the documents table") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val scored = Relevance.bm25(docs, "doc_id", "text", Seq("dup", "spark"))
      .cache()
    try {
      // a doc containing the rare term must outrank every doc with the
      // same dl and only the common term — check the top-1 has 'dup'
      val top = scored.orderBy(col("score").desc).limit(1)
        .join(docs, col("id") === col("doc_id")).select("text")
        .as[String].head()
      assert(top.split(" ").contains("dup"),
        "rare-term doc should take the top BM25 slot")
      // every score is positive and every output doc has a hit
      assert(scored.filter(col("score") <= 0 || col("n_hits") <= 0).isEmpty)
    } finally scored.unpersist()
  }

  test("searchTopK: a query that IS a document retrieves it in the top k") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").limit(300).cache()
    // query text = doc 7's full text: doc 7 matches every query term,
    // so it must appear in its own top-5 (exact rank 1 is not a BM25
    // guarantee — a denser doc can outrank the source)
    val q = docs.filter(col("doc_id") === 7)
      .select(col("doc_id").as("qid"), col("text").as("qtext"))
    val hits = Relevance.searchTopK(docs, "doc_id", "text", q, "qid", "qtext",
      k = 5).collect()
    assert(hits.length == 5)
    assert(hits.map(_.getInt(1)).toSeq.sorted == Seq(1, 2, 3, 4, 5))
    assert(hits.exists(_.getLong(2) == 7L),
      s"self-query missed doc 7: ${hits.map(_.getLong(2)).toSeq}")
    // scores are positive and non-increasing in rank
    val scores = hits.sortBy(_.getInt(1)).map(_.getDouble(4))
    assert(scores.forall(_ > 0))
    assert(scores.sliding(2).forall(p => p(0) >= p(1)))
  }

  test("searchTopK plan: query vocabulary broadcasts, corpus never does") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val q = docs.filter(col("doc_id") < 3)
      .select(col("doc_id").as("qid"), col("text").as("qtext"))
    val plan = Relevance.searchTopK(docs, "doc_id", "text", q, "qid", "qtext",
      k = 5).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastExchange"))
    // the exploded corpus side must reach the vocab via broadcast hash
    // join — a sort-merge join would shuffle O(corpus tokens)
    assert(!plan.contains("SortMergeJoin"),
      "corpus-side token join must not sort-merge")
  }

  test("bm25 plan: one broadcast of the 1-row stats, no wide shuffle") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val plan = Relevance.bm25(docs, "doc_id", "text", Seq("dup"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastExchange"),
      "stats row should broadcast to the scoring pass")
    assert(!plan.contains("SortMergeJoin"),
      "per-doc scoring must never sort-merge join")
  }

  test("rrfFuse equals hand-computed reciprocal-rank fusion") {
    // query 0: doc 10 ranks 1 in BOTH lists; doc 11 only lexical (2);
    // doc 12 only dense (2). query 1: disjoint docs.
    val lex = Seq((0L, 1, 10L), (0L, 2, 11L), (1L, 1, 20L))
      .toDF("qid", "rank", "doc_id")
    val den = Seq((0L, 1, 10L), (0L, 2, 12L), (1L, 1, 21L))
      .toDF("qid", "rank", "doc_id")
    val got = Relevance.rrfFuse(Seq(lex, den), k = 10)
      .orderBy("qid", "rank")
      .select("qid", "rank", "doc_id", "n_lists", "rrf").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toSeq
    def c(rank: Int): BigDecimal =
      BigDecimal(math.round(1.0 / (60 + rank) * 1e6)) / 1e6
    val both = (c(1) + c(1)).toDouble
    val one2 = c(2).toDouble
    assert(got == Seq(
      (0L, 1, 10L, 2L, both),
      (0L, 2, 11L, 1L, one2), // ties with doc 12 — doc_id breaks the tie
      (0L, 3, 12L, 1L, one2),
      (1L, 1, 20L, 1L, c(1).toDouble),
      (1L, 2, 21L, 1L, c(1).toDouble)))
  }

  test("rrfFuse plan: fusion is heap-ranked, no per-qid window sort") {
    val l = Seq((0L, 1, 10L), (0L, 2, 11L)).toDF("qid", "rank", "doc_id")
    val plan = Relevance.rrfFuse(Seq(l, l), k = 5)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), "rrf ranking must not window-sort")
    assert(!plan.contains("CartesianProduct"))
  }
}
