package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * TIMECAPSULE flashback queries (reference: the openGauss flashback
 * grammar `SELECT ... FROM t TIMECAPSULE {CSN | TIMESTAMP} expr` and
 * `TIMECAPSULE TABLE t TO {CSN | TIMESTAMP} expr` —
 * src/common/backend/parser/gram.y:6416-6453, 25721-25724; behavior
 * pinned by src/test/regress/input/timecapsule_version_test_*.source).
 *
 * The reference reconstructs past versions from MVCC undo. A Spark
 * warehouse has no undo log, but the equivalent — and the shape every
 * lakehouse uses — is an append-only CHANGE LOG: one row per committed
 * row version carrying (key, version columns, op ∈ {U, D}, payload).
 * Version columns (e.g. commit timestamp + a commit sequence number)
 * must order totally per key, mirroring the reference's CSN order;
 * the CSN breaks equal-timestamp ties exactly as the reference's
 * snapshot→CSN mapping does.
 *
 * Scale shapes:
 *  - `asOf` is ONE groupBy(key) with a max_by aggregate — partial
 *    aggregation combines map-side, so 100 TB of log shuffles only
 *    one winning row version per key, never the full history.
 *  - `versionsBetween` is one per-key window (validity intervals are
 *    inherently adjacent-version facts); the log is already the
 *    minimal input — nothing re-scans base data.
 *  - `restoreDelta` is one full-outer join on the key (AQE broadcasts
 *    a small side); emitting the COMPENSATION SET rather than a
 *    rewritten table is what scales — restoring a 100 TB table
 *    rewrites only the keys that changed.
 */
object Flashback {

  /**
   * `SELECT * FROM log-table TIMECAPSULE ...` — the snapshot visible
   * under `visible` (e.g. ts <= T, or csn <= n), one row per key that
   * existed then. `verCols` order versions lexicographically (total
   * per key); the winner's op must be 'U' to survive (a winning 'D'
   * is a tombstone: the key did not exist at that time).
   */
  def asOf(log: DataFrame, keyCol: String, verCols: Seq[String],
      opCol: String, visible: Column): DataFrame = {
    require(verCols.nonEmpty, "graft: asOf needs at least one version column")
    val others = log.columns.filterNot(_ == keyCol).toSeq
    log.filter(visible)
      .groupBy(col(keyCol))
      .agg(max_by(struct(others.map(col): _*),
        struct(verCols.map(col): _*)).as("_v"))
      .select(col(keyCol) +: others.map(c => col(s"_v.`$c`").as(c)): _*)
      .filter(col(opCol) === "U")
      .drop(opCol)
  }

  /**
   * `TIMECAPSULE VERSIONS`-style history: every 'U' version whose
   * validity interval [version-time, next-version-time) intersects
   * [lo, hi]. A following version of ANY op ends the interval — a
   * delete closes its predecessor exactly like an update. valid_to is
   * NULL for the current (open) version, reference behavior for rows
   * still live.
   */
  def versionsBetween(log: DataFrame, keyCol: String, verCols: Seq[String],
      opCol: String, tsCol: String, lo: Column, hi: Column): DataFrame = {
    require(verCols.nonEmpty, "graft: versionsBetween needs version columns")
    val w = Window.partitionBy(col(keyCol)).orderBy(verCols.map(col): _*)
    log
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .filter(col(opCol) === "U" && col(tsCol) <= hi &&
        (col("valid_to").isNull || col("valid_to") > lo))
      .drop(opCol)
      .withColumnRenamed(tsCol, "valid_from")
  }

  /**
   * `TIMECAPSULE TABLE t TO ...` as a compensation set: the minimal
   * change set (op2 ∈ {I, U, D}) that rewrites `current` into
   * `target` (both snapshots share the schema). 'I' and 'U' carry the
   * target payload, 'D' carries only the key. Payload comparison is
   * null-safe per column, so a NULL→value flip is a real 'U'.
   */
  def restoreDelta(current: DataFrame, target: DataFrame,
      keyCol: String): DataFrame = {
    val cols = current.columns
    require(target.columns.sameElements(cols),
      "graft: restoreDelta requires identical column sets")
    val payload = cols.filterNot(_ == keyCol).toSeq
    val c = current.withColumn("_in_c", lit(true)).as("c")
    val t = target.withColumn("_in_t", lit(true)).as("t")
    val same = payload.map(p => col(s"c.`$p`") <=> col(s"t.`$p`"))
      .reduceOption(_ && _).getOrElse(lit(true))
    c.join(t, col(s"c.`$keyCol`") === col(s"t.`$keyCol`"), "full_outer")
      .withColumn("op2",
        when(col("c._in_c").isNull, lit("I"))
          .when(col("t._in_t").isNull, lit("D"))
          .when(!same, lit("U")))
      .filter(col("op2").isNotNull)
      .select(col("op2") +:
        coalesce(col(s"c.`$keyCol`"), col(s"t.`$keyCol`")).as(keyCol) +:
        payload.map(p =>
          when(col("op2") === "D", lit(null)).otherwise(col(s"t.`$p`"))
            .as(p)): _*)
  }
}
