package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Late-interaction (ColBERT-style) retrieval: documents and queries
 * are bags of per-token embeddings; the score is MaxSim —
 * Σ_q max_t ⟨q, t⟩ (Khattab & Zaharia, ColBERT, SIGIR 2020). This is
 * the retrieval model a multi-vector extension of the reference's
 * datavec surface serves (one vector PER TOKEN instead of per doc).
 *
 * Spark shape (the part that must survive 100 TB):
 *  1. doc → DISTINCT tokens (max over duplicate tokens is the same
 *     max — dedup first, explode once);
 *  2. token embeddings come from a VOCAB TABLE joined by token — the
 *     embedding lookup is an equi-join (broadcast when the vocab is
 *     small, shuffle otherwise), never recomputed per occurrence;
 *  3. the ≤Q query vectors ride as LITERALS into a codegen'd
 *     per-row dot product (no crossJoin, no UDF);
 *  4. per-doc max/sum is one partial-aggregating groupBy — map-side
 *     combine bounds shuffle rows at |docs|, not |tokens|.
 *
 * The deterministic pseudo-embedding (md5-derived int8 values) stands
 * in for a real model's vectors — the PLUMBING (vocab join, literal
 * query vectors, max/sum aggregate) is the operator; swap
 * [[tokenEmbedding]] for a real embedding table and nothing else
 * changes. Integer arithmetic end-to-end keeps the gate hash-exact.
 */
object LateInteraction {
  val DIM = 8

  /** Per-dimension int in [-4,4] derived from md5(tok || "_" || d) —
    * the two leading hex chars' ASCII codes, (a*16+b) % 9 - 4. md5 is
    * engine-independent, so any SQL engine rebuilds the same table. */
  def tokenEmbedding(tok: Column): Column =
    array((0 until DIM).map { d =>
      val h = md5(concat(tok, lit("_"), lit(d.toString)))
      (ascii(substring(h, 1, 1)) * 16 + ascii(substring(h, 2, 1))) % 9 - 4
    }: _*)

  /** Same function driver-side, for query literals + oracle sharing. */
  def embedLocal(tok: String): Seq[Int] = {
    val mdInst = java.security.MessageDigest.getInstance("MD5")
    (0 until DIM).map { d =>
      val hex = mdInst.digest(s"${tok}_$d".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      (hex(0).toInt * 16 + hex(1).toInt) % 9 - 4
    }
  }

  /**
   * MaxSim scores for every document against `queryTokens`. Returns
   * (doc_id, m_0..m_{Q-1}, maxsim) — per-query-token max dot and the
   * sum. Documents with no tokens produce no row.
   */
  def maxsim(docs: DataFrame, idCol: String, textCol: String,
             queryTokens: Seq[String]): DataFrame = {
    val toks = docs.select(col(idCol),
        explode(array_distinct(filter(split(lower(col(textCol)), " "),
          t => length(t) > 0))).as("tok"))
    val vocab = toks.select(col("tok")).distinct()
      .withColumn("e", tokenEmbedding(col("tok")))
    val withE = toks.join(broadcast(vocab), "tok")
    val qEmbs = queryTokens.map(embedLocal)
    val dots = qEmbs.zipWithIndex.map { case (q, i) =>
      (0 until DIM).map(d => element_at(col("e"), d + 1) * q(d))
        .reduce(_ + _).cast("long").as(s"d_$i")
    }
    val scored = withE.select(col(idCol) +: dots: _*)
    val maxes = qEmbs.indices.map(i => max(col(s"d_$i")).as(s"m_$i"))
    scored.groupBy(col(idCol))
      .agg(maxes.head, maxes.tail: _*)
      .withColumn("maxsim", qEmbs.indices.map(i => col(s"m_$i")).reduce(_ + _))
  }

  /** The oracle-side embedding literal for one query token, as a SQL
    * list (shared verbatim so both engines use identical vectors). */
  def embLiteralSql(tok: String): String =
    embedLocal(tok).mkString("[", ",", "]")
}
