package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * MERGE / upsert as a batch snapshot transform (openGauss ships SQL
 * MERGE; a Spark-native warehouse expresses it as: next_snapshot =
 * merge(current, delta)). Matched keys take the delta row entirely,
 * unmatched delta keys insert, unmatched base keys carry over —
 * the WHEN MATCHED UPDATE / WHEN NOT MATCHED INSERT semantics.
 *
 * Scale shape: ONE full-outer join on the key (delta side broadcasts
 * when small — AQE decides), per-column coalesce is codegen'd; no
 * driver state. Deletes are the companion anti-join. Writing the
 * result partitioned/bucketed by the key keeps successive merges
 * co-located (Bucketing).
 */
object Upsert {

  /** Upsert: delta rows win on key collision, both sides' unmatched
    * rows survive. Schemas must share `keyCol` and column names. */
  def merge(base: DataFrame, delta: DataFrame, keyCol: String): DataFrame = {
    val cols = base.columns
    require(delta.columns.sameElements(cols),
      "graft: merge requires identical column sets")
    val b = base.as("b"); val d = delta.as("d")
    b.join(d, col(s"b.$keyCol") === col(s"d.$keyCol"), "full_outer")
      .select(cols.map(c =>
        coalesce(col(s"d.$c"), col(s"b.$c")).as(c)): _*)
  }

  /** WHEN MATCHED DELETE: drop base rows whose key appears in
    * `deleteKeys` (left anti join — broadcast when small). */
  def delete(base: DataFrame, deleteKeys: DataFrame, keyCol: String): DataFrame =
    base.join(deleteKeys.select(col(keyCol)), Seq(keyCol), "left_anti")
}
