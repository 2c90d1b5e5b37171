package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * BPE-style merge training over a tokenized corpus (Sennrich et al.
 * 2016 — the tokenizer-training pass of an LLM data pipeline, here at
 * word level: each round fuses the globally most frequent adjacent
 * token pair into one symbol).
 *
 * Scale shape per round: pair counting is posexplode + one map-side-
 * combinable count (pairs shuffle as 16-byte hashes of (a,b), never
 * documents); the winning pair is a 1-row driver decision (the ONLY
 * driver state — k rounds → k tiny collects); the merge itself is a
 * pure codegen'd `aggregate` fold over each document's token array —
 * map-only, no shuffle, documents never leave their partitions.
 *
 * Determinism: the winner ties break lexicographically on (a, b); the
 * greedy left-to-right merge is a pure function of the token array
 * (the fold carries (out, pending) so an overlapping occurrence —
 * possible only when a = b — is consumed exactly like sequential BPE).
 * Merged symbols join with '+': merging ("fast", "sort") yields
 * "fast+sort", which can itself win a later round (phrases grow).
 */
object Bpe {

  /** (a, b, n) counts of ALL adjacent token pairs (overlapping runs
    * count every adjacency, standard BPE counting). The pair array is
    * built FIRST (zip-with-next, O(n) per doc) and then exploded —
    * exploding positions while carrying the full token array would
    * ship O(n²) bytes per document. */
  def pairCounts(docs: DataFrame, toksCol: String): DataFrame = {
    val t = col(toksCol)
    // sequence(1, n-1) DECREASES when n < 2 — guard the short docs
    val pairs = when(size(t) >= 2,
      transform(sequence(lit(1), size(t) - 1), i =>
        struct(element_at(t, i).as("a"), element_at(t, i + 1).as("b"))))
      .otherwise(array().cast("array<struct<a:string,b:string>>"))
    docs.select(explode(pairs).as("p"))
      .select(col("p.a"), col("p.b"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("n"))
  }

  /** Greedy left-to-right merge of adjacent (a, b) into a+"+"+b — one
    * codegen'd fold, no shuffle. */
  def mergeOnce(toks: Column, a: String, b: String): Column = {
    val stateType = "struct<out:array<string>,pend:string>"
    val init = struct(array().cast("array<string>").as("out"),
      lit(null).cast("string").as("pend"))
    val folded = aggregate(toks, init.cast(stateType),
      (st, x) => {
        val out = st.getField("out"); val pend = st.getField("pend")
        when(pend === lit(a) && x === lit(b),
          struct(concat(out, array(lit(a + "+" + b))).as("out"),
            lit(null).cast("string").as("pend")))
        .otherwise(struct(
          when(pend.isNull, out).otherwise(concat(out, array(pend))).as("out"),
          x.as("pend")))
      })
    when(folded.getField("pend").isNull, folded.getField("out"))
      .otherwise(concat(folded.getField("out"),
        array(folded.getField("pend"))))
  }

  /** One training round: returns the winning pair and the corpus with
    * it merged, or None when no adjacent pair is left. */
  def step(docs: DataFrame, toksCol: String): Option[((String, String, Long), DataFrame)] = {
    val top = pairCounts(docs, toksCol)
      .orderBy(col("n").desc, col("a"), col("b")).limit(1).collect()
    if (top.isEmpty) None
    else {
      val (a, b, n) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
      Some(((a, b, n),
        docs.withColumn(toksCol, mergeOnce(col(toksCol), a, b))))
    }
  }

  /** k rounds of merge training. Returns the merge table (in rank
    * order) and the final corpus. Each round's frame is CACHED before
    * the pair-count pass (which would otherwise re-run every prior
    * round's merge fold) and the previous round's cache is dropped
    * once the next is built — O(1) cached frames, lineage bounded by
    * one fold per round; for very large k add Iterate.fixpoint-style
    * checkpoints. */
  def train(docs: DataFrame, toksCol: String, rounds: Int)
      : (Seq[(String, String, Long)], DataFrame) = {
    var cur = docs.cache()
    var prev: DataFrame = null
    val merges = Seq.newBuilder[(String, String, Long)]
    var r = 0
    var continue = true
    while (r < rounds && continue) {
      step(cur, toksCol) match {
        case Some((m, next)) =>
          merges += m
          if (prev != null) prev.unpersist()
          prev = cur
          cur = next.cache()
        case None => continue = false
      }
      r += 1
    }
    if (prev != null) prev.unpersist()
    (merges.result(), cur)
  }

  /**
   * ENCODE with a trained merge table (rank order) — the inference
   * side of [[train]], i.e. the actual tokenize step of the data
   * pipeline: each merge is the same greedy left-to-right fold
   * training used, applied in training order, so encoding a corpus
   * reproduces exactly the symbols training would have produced.
   *
   * Scale shape: the merge table is a driver-side constant and each
   * merge compiles to one codegen'd `aggregate` fold — the whole
   * encode is a map-only column rewrite chain, no shuffle, documents
   * never move. (A production tokenizer ships ~30-50k merges; at that
   * size batch non-interacting merges into single passes rather than
   * 50k chained folds — the per-merge fold here matches the training
   * fold bit-for-bit, which is what the gate proves.)
   */
  def encode(docs: DataFrame, toksCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    require(merges.nonEmpty, "encode needs at least one merge")
    merges.foldLeft(docs) { case (d, (a, b)) =>
      d.withColumn(toksCol, mergeOnce(col(toksCol), a, b))
    }
  }
}
