package graft.streaming

import graft.operators.Dedup
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/**
 * Streaming near-dup candidate filtering over a document stream
 * (SURVEY §10.6): every document explodes into its MinHash LSH band
 * buckets; per-bucket state remembers the PIONEER (minimum sequence
 * number ever seen in that bucket), and a document is flagged a
 * near-dup candidate iff some bucket of its has a pioneer strictly
 * before it. Because the state is a min — not an arrival order — the
 * verdicts are deterministic under any micro-batch slicing of an
 * in-order stream, which is what the stream==batch spec asserts.
 *
 * This is the candidate stage only (same contract as batch
 * minhashPairs before verification): flagged docs go to an exact
 * verify against the retained corpus downstream; unflagged docs are
 * guaranteed novel at the banding's recall.
 */
object StreamDedup {

  final case class BandHit(bucket_key: Long, seq: Long, doc_id: Long)
  final case class BandVerdict(doc_id: Long, seq: Long, dup_band: Boolean)

  /**
   * Explode documents into (bucket_key, seq, doc_id) band-bucket rows.
   * `seqCol` must be monotone with stream order (an ingest sequence).
   */
  def bandHits(docs: DataFrame, textCol: String, idCol: String, seqCol: String,
      numHashes: Int = 64, bands: Int = 16): DataFrame = {
    val r = numHashes / bands
    docs.select(col(idCol).cast("long").as("doc_id"),
        col(seqCol).cast("long").as("seq"),
        Dedup.minhashSignatureFromHashes(
          Dedup.hashedWordShingles(col(textCol)), numHashes).as("sig"))
      .select(col("doc_id"), col("seq"),
        posexplode(Dedup.minhashBands(col("sig"), bands, r)).as(Seq("band", "bv")))
      // one state key per (band, bucket-value): fold band into the key
      .select(xxhash64(col("band"), col("bv")).as("bucket_key"),
        col("seq"), col("doc_id"))
  }

  /** Per-bucket pioneer state: emits one verdict row per (doc, band). */
  private def verdictPerBucket(key: Long, it: Iterator[BandHit],
      state: GroupState[Long]): Iterator[BandVerdict] = {
    val hits = it.toArray.sortBy(h => (h.seq, h.doc_id))
    var pioneer = state.getOption.getOrElse(Long.MaxValue)
    val out = hits.map { h =>
      val dup = pioneer < h.seq
      if (h.seq < pioneer) pioneer = h.seq
      BandVerdict(h.doc_id, h.seq, dup)
    }
    state.update(pioneer)
    out.iterator
  }

  /**
   * Stateful band verdicts for a (possibly streaming) band-hit set;
   * aggregate with [[verdicts]] to a per-doc flag.
   */
  def bandVerdicts(hits: DataFrame): Dataset[BandVerdict] = {
    val spark = hits.sparkSession
    import spark.implicits._
    hits.as[BandHit]
      .groupByKey(_.bucket_key)
      .flatMapGroupsWithState(
        org.apache.spark.sql.streaming.OutputMode.Append(),
        GroupStateTimeout.NoTimeout())(verdictPerBucket)
  }

  /** Per-doc verdict: near-dup candidate iff ANY band flagged it. */
  def verdicts(bandVerdicts: DataFrame): DataFrame =
    bandVerdicts.groupBy(col("doc_id"))
      .agg(max(col("dup_band")).as("near_dup_candidate"))

  /**
   * Batch reference: the same verdicts from a global min-seq per
   * bucket — what the streaming state converges to.
   */
  def batchVerdicts(docs: DataFrame, textCol: String, idCol: String,
      seqCol: String, numHashes: Int = 64, bands: Int = 16): DataFrame = {
    val hits = bandHits(docs, textCol, idCol, seqCol, numHashes, bands)
    val pioneers = hits.groupBy(col("bucket_key"))
      .agg(min(col("seq")).as("pioneer"))
    hits.join(pioneers, "bucket_key")
      .groupBy(col("doc_id"))
      .agg(max(col("pioneer") < col("seq")).as("near_dup_candidate"))
  }
}
