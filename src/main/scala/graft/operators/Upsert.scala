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
 * when small — AQE decides), per-column row selection is codegen'd;
 * no driver state. Deletes are the companion anti-join. Writing the
 * result partitioned/bucketed by the key keeps successive merges
 * co-located (Bucketing).
 */
object Upsert {

  /** Upsert: delta rows win on key collision, both sides' unmatched
    * rows survive. Schemas must share `keyCol` and column names.
    *
    * Row selection keys off a non-null marker column on the delta
    * side, NOT per-column coalesce: a matched delta row whose payload
    * column is legitimately NULL must null out the base value (SQL
    * MERGE WHEN MATCHED UPDATE semantics), which coalesce would
    * silently keep. */
  def merge(base: DataFrame, delta: DataFrame, keyCol: String): DataFrame = {
    val cols = base.columns
    require(delta.columns.sameElements(cols),
      "graft: merge requires identical column sets")
    val b = base.as("b")
    val d = delta.withColumn("_from_delta", lit(true)).as("d")
    b.join(d, col(s"b.$keyCol") === col(s"d.$keyCol"), "full_outer")
      .select(cols.map(c =>
        when(col("d._from_delta").isNotNull, col(s"d.$c"))
          .otherwise(col(s"b.$c")).as(c)): _*)
  }

  /** WHEN MATCHED DELETE: drop base rows whose key appears in
    * `deleteKeys` (left anti join — broadcast when small). */
  def delete(base: DataFrame, deleteKeys: DataFrame, keyCol: String): DataFrame =
    base.join(deleteKeys.select(col(keyCol)), Seq(keyCol), "left_anti")

  /**
   * CDC apply — the change-stream form of merge: `changes` carries
   * (key, version, op ∈ {U, D}, payload). Changes may arrive OUT OF
   * ORDER and duplicated (at-least-once feeds); per key the highest
   * (version, op) wins (op 'U' < 'D' breaks a same-version tie toward
   * the delete, the conservative choice), a winning D is a tombstone,
   * a winning U replaces the row. Base rows rank as version −∞.
   * One union + one per-key window (shuffle on the key), no driver
   * state — re-applying any subset of the same changes is idempotent
   * (spec-asserted).
   */
  def applyCdc(base: DataFrame, changes: DataFrame, keyCol: String,
      versionCol: String, opCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cols = base.columns
    require(changes.columns.toSet == cols.toSet + versionCol + opCol,
      "graft: changes must carry the base columns plus version and op")
    val tagged = base
      .withColumn(versionCol, lit(Long.MinValue))
      .withColumn(opCol, lit("U"))
      .unionByName(changes.select(
        (cols.map(col) :+ col(versionCol).cast("long") :+ col(opCol)): _*))
    // op ASCENDING: 'D' < 'U', so a same-version tie ranks the delete
    // first (the conservative winner)
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(versionCol).desc, col(opCol).asc)
    tagged.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1 && col(opCol) === "U")
      .select(cols.map(col): _*)
  }
}
