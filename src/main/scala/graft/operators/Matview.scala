package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Incremental materialized-view maintenance — openGauss ships
 * `CREATE INCREMENTAL MATERIALIZED VIEW` with delta-based refresh
 * (the kernel's IVM path under commands/matview; the algebra is the
 * classic count/sum self-maintenance of GroupBy-Aggregate views under
 * inserts AND deletes, cf. Gupta & Mumick, "Maintenance of
 * Materialized Views"). A grouped view
 *   SELECT keys, count(*), sum(x1), ..., sum(xk)
 * refreshes from a change stream without touching the base table:
 * aggregate the SIGNED delta per group (insert op=+1, delete op=−1),
 * add it to the materialized state, drop groups whose count reaches
 * zero; groups appearing only in the delta are inserts. avg
 * materializes as (sum, count) and derives at read — the standard IVM
 * decomposition.
 *
 * Scale shape — the entire point of IVM at 100 TB: the delta
 * aggregates FIRST (map-side-combined, delta-sized shuffle), then ONE
 * union-reaggregate with the view — work is O(|view| + |delta|),
 * never O(|base|). A full refresh would re-scan the 100 TB base; this
 * touches only the materialized state. No joins anywhere: the merge
 * is a union + re-aggregate, so count/sum partials combine exactly.
 *
 * Contract: count columns are LONG, sum columns integer/decimal
 * (exact addition — the repo's long-cents money convention composes
 * directly). Deleting rows that were never inserted drives a group's
 * count negative; such groups are dropped with the zeros (garbage in,
 * nothing out) rather than resurrected.
 */
object Matview {

  /**
   * Apply a signed delta to a materialized grouped aggregate.
   *
   * @param view    materialized state: keys ++ (countCol, sumCols...)
   * @param delta   change rows: keys ++ sumCols (PER-ROW values) ++ opCol (+1/−1)
   * @param keys    grouping key columns
   * @param countCol name of the view's count(*) column
   * @param sumCols names of the view's sum columns (same names hold the
   *                per-row values in `delta`)
   * @param opCol   delta sign column: +1 insert, −1 delete
   */
  def applyDelta(view: DataFrame, delta: DataFrame, keys: Seq[String],
      countCol: String, sumCols: Seq[String], opCol: String): DataFrame = {
    require(keys.nonEmpty, "applyDelta needs at least one grouping key")
    require(!sumCols.contains(countCol), "countCol must not appear in sumCols")
    val op = col(opCol).cast("long")
    val dAgg = delta.groupBy(keys.map(col): _*)
      .agg(sum(op).as(countCol),
        sumCols.map(c => sum(col(c) * op).as(c)): _*)
    val outCols = keys.map(col) ++ (countCol +: sumCols).map(col)
    val u = view.select(outCols: _*).unionByName(dAgg.select(outCols: _*))
    u.groupBy(keys.map(col): _*)
      .agg(sum(col(countCol)).as(countCol),
        sumCols.map(c => sum(col(c)).as(c)): _*)
      .filter(col(countCol) > 0)
  }

  /**
   * INSERT-ONLY maintenance for views that also carry min/max columns.
   * min/max are NOT self-maintainable under deletes (retracting the
   * current extremum needs the base table — openGauss's IMV restricts
   * its aggregate set for the same reason), so this variant takes a
   * plain insert batch with NO op column: delete-freedom is enforced
   * by construction, not by a runtime scan. Merge algebra: counts and
   * sums add, mins/maxes fold (both associative+commutative), so the
   * refresh remains one delta-sized aggregate + one union-reaggregate
   * — O(|view|+|delta|), no joins, base never re-read.
   */
  def applyInserts(view: DataFrame, inserts: DataFrame, keys: Seq[String],
      countCol: String, sumCols: Seq[String], minCols: Seq[String],
      maxCols: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "applyInserts needs at least one grouping key")
    val stateCols = countCol +: (sumCols ++ minCols ++ maxCols)
    require(stateCols.distinct.size == stateCols.size,
      "count/sum/min/max columns must be distinct")
    val dAgg = inserts.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as(countCol),
        (sumCols.map(c => sum(col(c)).as(c)) ++
          minCols.map(c => min(col(c)).as(c)) ++
          maxCols.map(c => max(col(c)).as(c))): _*)
    val outCols = (keys ++ stateCols).map(col)
    val u = view.select(outCols: _*).unionByName(dAgg.select(outCols: _*))
    u.groupBy(keys.map(col): _*)
      .agg(sum(col(countCol)).as(countCol),
        (sumCols.map(c => sum(col(c)).as(c)) ++
          minCols.map(c => min(col(c)).as(c)) ++
          maxCols.map(c => max(col(c)).as(c))): _*)
  }
}
