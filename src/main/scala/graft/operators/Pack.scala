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
 * The id-order walk is realized as `repartition(g)` +
 * `sortWithinPartitions(g, id)` + a streaming `mapPartitions`, so the
 * ordering runs through Spark's external (spillable) sort and the task
 * itself carries only O(1) running state per stream — (group, fill,
 * seq), 24 bytes — never the stream's rows. A 100 TB corpus therefore
 * costs one shuffle plus a disk-backed sort; no task ever materializes
 * a stream. First-fit-decreasing would pack ~1% tighter but is
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
      .repartition(col("g"))
      .sortWithinPartitions(col("g"), col("id"))
      .as[(Long, Long, Int)]
      .mapPartitions { it =>
        // Rows arrive clustered by g and id-sorted within each g (one g
        // never spans partitions under hash repartition), so a stream's
        // walk is a pure scan: reset the running state on group change.
        var curG = -1
        var fill = 0L
        var seq = 0L
        it.map { case (id, tok, g) =>
          if (g != curG) { curG = g; seq = 0L; fill = tok }
          else if (fill + tok > budget) { seq += 1; fill = tok }
          else fill += tok
          (id, g.toLong * 1000000000L + seq, tok)
        }
      }
      .toDF("doc_id", "seq_id", "n_tokens")
  }
}
