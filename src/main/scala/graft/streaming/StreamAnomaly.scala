package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/**
 * ONLINE rolling-z anomaly flags over per-key hourly event counts —
 * the streaming sibling of [[graft.operators.Seasonal.anomalies]]
 * (reference: the dbmind kernel's metric anomaly detector is an
 * online monitor by nature; prophet/madlib give it the batch shape).
 *
 * Semantics are the BATCH operator's, incrementalized: per key, the
 * dense hourly grid spans [first observed bucket, last observed
 * bucket] with zero-filled gaps; each finalized bucket is tested
 * against the `lookback` fully-observed buckets strictly before it
 * with the exact-integer k-sigma test (no sqrt, no float state).
 *
 * State per key (flatMapGroupsWithState): pending per-bucket counts
 * not yet passed by the event-time watermark, the ring of the last
 * `lookback` finalized (hour, y), and the finalize cursor — O(pending
 * hours + lookback) per key, independent of event volume. A bucket
 * finalizes when the watermark passes its end; zero-gap buckets
 * finalize alongside (they are grid rows, exactly as in batch).
 *
 * The batch path (`streaming = false`) runs the SAME fold per key
 * with an unbounded watermark — bit-identical to the batch operator,
 * which is what the driver gate pins against the SQL oracle;
 * StreamingSpec slices the stream and asserts emitted ⊆ batch with
 * high recall on watermark-closed buckets.
 *
 * One deliberate online-vs-batch divergence: the STREAM keeps
 * emitting zero-count buckets for a key that has gone silent while
 * the watermark advances (silence IS monitor data — exactly when a
 * count detector should fire low-side), whereas the batch grid stops
 * at the key's last observed bucket. Inside the batch span the two
 * agree row for row. Mechanically this requires EventTimeTimeout:
 * with NoTimeout the function only runs for keys present in the
 * micro-batch, so a silent key would never finalize again — each
 * invocation re-arms a timer for the close of the key's next grid
 * bucket, and the timeout invocation folds with empty counts, which
 * emits exactly the newly watermark-closed zero buckets.
 */
object StreamAnomaly {

  case class Flag(key: String, bucket: java.sql.Timestamp, y: Long,
      mean: Double, is_anom: Boolean)

  case class St(pending: Map[Long, Long], ring: List[(Long, Long)],
      lastFinal: Long, started: Boolean)

  private def emptySt = St(Map.empty, Nil, -1L, started = false)

  /** Fold new per-hour counts into the state, finalizing every grid
    * hour ≤ upTo; returns (emitted flags, next state). `extend` keeps
    * the grid growing past the key's last observed bucket (the stream
    * mode, where the watermark alone closes zero buckets); batch mode
    * stops at the last observation, like the batch operator's grid. */
  private def fold(st: St, newCounts: Map[Long, Long], upTo: Long,
      lookback: Int, k: Int, extend: Boolean): (List[Flag], St) = {
    val pending = newCounts.foldLeft(st.pending) { case (m, (h, c)) =>
      m.updated(h, m.getOrElse(h, 0L) + c)
    }
    if (!st.started && pending.isEmpty) return (Nil, st)
    val firstHour =
      if (st.started) st.lastFinal + 1
      else pending.keys.min // the grid starts at the key's first bucket
    val hi =
      if (extend) upTo
      else math.min(upTo,
        if (pending.nonEmpty) pending.keys.max else st.lastFinal)
    if (hi < firstHour) return (Nil, st.copy(pending = pending))

    var ring = st.ring
    var pend = pending
    val out = List.newBuilder[Flag]
    var h = firstHour
    while (h <= hi) {
      val y = pend.getOrElse(h, 0L)
      pend = pend - h
      if (ring.length == lookback) {
        val s = ring.iterator.map(_._2).sum
        val q = ring.iterator.map(v => v._2 * v._2).sum
        val l = lookback.toLong
        val dev = l * y - s
        out += Flag(null, new java.sql.Timestamp(h * 3600000L), y,
          s.toDouble / lookback.toDouble,
          dev * dev > k.toLong * k * (l * q - s * s))
      }
      // newest-first; the z-test is order-free, only eviction matters
      ring = ((h, y) :: ring).take(lookback)
      h += 1
    }
    (out.result(), St(pend, ring, hi, started = true))
  }

  /**
   * Anomaly flags over `events` (streaming or batch): one row per
   * finalized grid bucket with a full trailing window —
   * (key, bucket, y, mean, is_anom), the batch operator's schema.
   */
  def flags(events: DataFrame, keyCol: String, tsCol: String,
      lookback: Int = 24, k: Int = 3,
      streaming: Boolean = false): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val keyed = events
      .select(col(keyCol).cast("string").as("key"),
        expr(s"unix_timestamp($tsCol) DIV 3600").as("h"))
      .groupByKey(_.getString(0))

    def countsOf(rows: Iterator[org.apache.spark.sql.Row]): Map[Long, Long] =
      rows.foldLeft(Map.empty[Long, Long]) { (m, r) =>
        val h = r.getLong(1); m.updated(h, m.getOrElse(h, 0L) + 1L)
      }

    val flagged: Dataset[Flag] =
      if (!streaming) {
        keyed.flatMapGroups { (key, rows) =>
          fold(emptySt, countsOf(rows), Long.MaxValue, lookback, k,
            extend = false)._1.map(_.copy(key = key)).iterator
        }
      } else {
        val withWm = events
          .withWatermark(tsCol, "1 second")
          .select(col(keyCol).cast("string").as("key"),
            col(tsCol).as("ts"),
            expr(s"unix_timestamp($tsCol) DIV 3600").as("h"))
          .groupByKey(_.getString(0))
        withWm.flatMapGroupsWithState(
            OutputMode.Append(), GroupStateTimeout.EventTimeTimeout) {
          (key: String, rows: Iterator[org.apache.spark.sql.Row],
              state: GroupState[St]) =>
            val counts = rows.foldLeft(Map.empty[Long, Long]) { (m, r) =>
              val h = r.getLong(2); m.updated(h, m.getOrElse(h, 0L) + 1L)
            }
            // bucket h is closed once the watermark passes its end
            val upTo = state.getCurrentWatermarkMs() / 3600000L - 1L
            val (flags, next) = fold(
              state.getOption.getOrElse(emptySt), counts, upTo, lookback, k,
              extend = true)
            state.update(next)
            // re-arm for the close of the key's next grid bucket: the
            // timeout invocation (empty rows) finalizes zero buckets
            // for silent keys off the watermark alone. The target is
            // provably > the current watermark: lastFinal ≥ upTo =
            // wm/3600000 − 1 once started, and an unstarted key's min
            // pending bucket has upTo < minPending.
            val nextHour =
              if (next.started) next.lastFinal + 1
              else if (next.pending.nonEmpty) next.pending.keys.min
              else Long.MinValue
            if (nextHour != Long.MinValue)
              state.setTimeoutTimestamp((nextHour + 1) * 3600000L)
            flags.map(_.copy(key = key)).iterator
        }
      }
    flagged.toDF()
  }
}
