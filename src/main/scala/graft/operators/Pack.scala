package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Sequence packing for LLM training-data preparation: bin documents
 * into fixed token-budget training sequences (the step between curation
 * and batch assembly — every pretraining pipeline packs documents into
 * context-window-sized rows; the reference has no analogue, this is
 * part of the mandated pipeline extension).
 *
 * Semantics are DETERMINISTIC GREEDY SEQUENTIAL packing: documents are
 * assigned to `nGroups` streams by id hash (pmod), each stream is
 * walked in ascending id order, and a document starts a new sequence
 * exactly when it would push the running fill past `budget` (a single
 * document larger than the budget gets a sequence of its own). The
 * id-order walk makes the output a pure function of the input set —
 * independent of partitioning, parallelism, or input order — which is
 * what lets a SQL engine recompute it row for row (the driver oracle
 * marches the same walk as a recursive CTE).
 *
 * Scale shape: streams pack independently (one shuffle on the group
 * key), so parallelism = nGroups — size it like shuffle partitions.
 * A stream's (id, tok) pairs must fit in one task (16 bytes/doc; 10M
 * docs/stream = 160MB — the same per-group residency contract as the
 * NSW shard build). First-fit-decreasing would pack ~1% tighter but is
 * order-dependent within a bin; greedy-by-id keeps the exact-oracle
 * property, which is worth more here than the last percent of fill.
 */
object Pack {

  /**
   * Context-window chunking — the other half of sequence assembly:
   * split each document into consecutive ≤`budget`-token chunks
   * (whitespace tokens, same tokenization as TextAnalysis.wsTokenCount's
   * oracle). Pure declarative plan: sequence + explode + slice, no
   * state, fully codegen'd — chunk boundaries are fixed offsets so the
   * whole operator is closed-form SQL.
   * Output: (doc_id, chunk_idx, n_tokens, chunk_text).
   */
  def chunkByTokens(df: DataFrame, idCol: String, textCol: String,
      budget: Int): DataFrame = {
    require(budget > 0, "budget must be positive")
    df.select(col(idCol).cast("long").as("doc_id"),
        split(lower(col(textCol)), " ").as("toks"))
      .select(col("doc_id"), col("toks"),
        explode(sequence(lit(0),
          ceil(size(col("toks")).cast("double") / budget).cast("int") - 1))
          .as("chunk_idx"))
      .select(col("doc_id"), col("chunk_idx"),
        slice(col("toks"), col("chunk_idx") * budget + 1, lit(budget)).as("ctoks"))
      .select(col("doc_id"), col("chunk_idx"),
        size(col("ctoks")).cast("long").as("n_tokens"),
        array_join(col("ctoks"), " ").as("chunk_text"))
  }

  /** Pack to (doc_id, seq_id, n_tokens); seq_id encodes the stream in
   *  its high digits so sequences are globally unique. */
  def packGreedy(df: DataFrame, idCol: String, tokCol: String,
      budget: Long, nGroups: Int): DataFrame = {
    require(budget > 0 && nGroups > 0, "budget and nGroups must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("id"),
        col(tokCol).cast("long").as("tok"),
        pmod(col(idCol).cast("long"), lit(nGroups)).cast("int").as("g"))
      .as[(Long, Long, Int)]
      .groupByKey(_._3)
      .flatMapGroups { (g, it) =>
        val rows = it.toArray.sortBy(_._1)
        var fill = 0L
        var seq = 0L
        var first = true
        rows.iterator.map { case (id, tok, _) =>
          if (first) { fill = tok; first = false }
          else if (fill + tok > budget) { seq += 1; fill = tok }
          else fill += tok
          (id, g.toLong * 1000000000L + seq, tok)
        }
      }
      .toDF("doc_id", "seq_id", "n_tokens")
  }
}
