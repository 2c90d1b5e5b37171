package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/**
 * Sessionization (SURVEY §2 E2): group events per user, close a session
 * when the gap to the next event exceeds `gapMinutes`.
 *
 * Two interchangeable implementations:
 *  - `batchSessions`: declarative gaps-and-islands (lag + running sum) —
 *    the SQL-oracle-checkable batch path;
 *  - `statefulSessions`: `flatMapGroupsWithState` keeping one open
 *    session per user with event-time timeout — the streaming path
 *    (also runs on batch frames, where each group arrives complete).
 */
object Sessionize {

  final case class Ev(user_id: Long, ts: java.sql.Timestamp, event_id: Long) {
    /** exact microseconds (Timestamp.getTime would truncate to ms). */
    def tsUs: Long = {
      val i = ts.toInstant
      i.getEpochSecond * 1000000L + i.getNano / 1000L
    }
  }
  final case class Session(user_id: Long, n_events: Long,
      start_us: Long, end_us: Long)
  final case class OpenSession(n: Long, start: Long, last: Long)

  /** Gaps-and-islands: new session when gap > threshold; 1-based index. */
  def batchSessions(events: DataFrame, gapMinutes: Int): DataFrame = {
    val gapUs = gapMinutes * 60L * 1000000L
    val byUser = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
    events
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"), col("event_id"))
      .withColumn("prev", lag(col("ts_us"), 1).over(byUser))
      .withColumn("new_sess",
        when(col("prev").isNull || col("ts_us") - col("prev") > gapUs, 1).otherwise(0))
      .withColumn("session_idx",
        sum(col("new_sess")).over(byUser.rowsBetween(Long.MinValue, 0)).cast("int"))
      .groupBy(col("user_id"), col("session_idx"))
      .agg(count(lit(1)).as("n_events"),
        min(col("ts_us")).as("start_us"), max(col("ts_us")).as("end_us"))
  }

  /** Session assembly for one user's time-sorted events. Sessions are
    * identified by their start time (ordinals are a batch-side window
    * function, so a timeout-closed session never perturbs numbering). */
  private def fold(sorted: Seq[Ev], gapUs: Long,
      open: Option[OpenSession]): (Seq[Session], Option[OpenSession]) = {
    var sessions = Vector.empty[Session]
    var cur = open
    sorted.foreach { e =>
      val us = e.tsUs
      cur match {
        case Some(s) if us - s.last <= gapUs =>
          cur = Some(s.copy(n = s.n + 1, last = us))
        case Some(s) =>
          sessions :+= Session(e.user_id, s.n, s.start, s.last)
          cur = Some(OpenSession(1, us, us))
        case None =>
          cur = Some(OpenSession(1, us, us))
      }
    }
    (sessions, cur)
  }

  /**
   * Stateful sessionization. On batch frames each group arrives complete
   * in one call and every session (incl. the open tail) is emitted; on
   * streams the open session persists in state and closes via event-time
   * timeout past the watermark.
   */
  def statefulSessions(spark: SparkSession, events: DataFrame, gapMinutes: Int,
      streaming: Boolean): Dataset[Session] = {
    import spark.implicits._
    val gapUs = gapMinutes * 60L * 1000000L
    val evs = events
      .select(col("user_id"), col("ts"), col("event_id"))
      .withWatermark("ts", s"$gapMinutes minutes")
      .as[Ev]
    val timeout =
      if (streaming) GroupStateTimeout.EventTimeTimeout()
      else GroupStateTimeout.NoTimeout()

    evs.groupByKey(_.user_id).flatMapGroupsWithState(
      OutputMode.Append(), timeout) {
      (user: Long, it: Iterator[Ev], state: GroupState[OpenSession]) =>
        if (state.hasTimedOut) {
          val s = state.get
          state.remove()
          Iterator.single(Session(user, s.n, s.start, s.last))
        } else {
          val sorted = it.toSeq.sortBy(e => (e.tsUs, e.event_id))
          val (closed, open) = fold(sorted, gapUs, state.getOption)
          open match {
            case Some(s) if streaming =>
              state.update(s)
              state.setTimeoutTimestamp(s.last / 1000L + gapMinutes * 60L * 1000L)
              closed.iterator
            case Some(s) => // batch: group is complete, emit the tail too
              (closed :+ Session(user, s.n, s.start, s.last)).iterator
            case None => closed.iterator
          }
        }
    }
  }
}
