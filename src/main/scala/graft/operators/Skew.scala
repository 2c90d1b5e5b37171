package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Skew-salting for hot-key equi-joins (SURVEY §5). When a handful of
 * join keys dominate (a viral document's shingles, a default embedding,
 * a null-ish customer), one reducer receives most of the shuffle.
 * Salting splits each hot key into `salts` sub-keys: the skewed side
 * gets a random salt, the other side is replicated across all salts —
 * shuffle balance at the cost of replicating the smaller side's hot rows.
 *
 * (AQE's skewedJoin handles moderate skew automatically; explicit
 * salting is for the pathological keys AQE splits can't fix.)
 */
object Skew {

  /**
   * Inner equi-join `left.key = right.key` with the LEFT side salted
   * (left = the skewed/fact side). The salt must spread rows of the
   * SAME key, so it hashes the WHOLE row (key ⊕ payload), not the key
   * alone — and deliberately not `monotonically_increasing_id()`,
   * whose value depends on partition layout: two runs over the same
   * data could salt (and therefore shuffle) differently, making the
   * intermediate shape run-dependent. A whole-row hash is a pure
   * function of the input set. (Rows that are bit-identical across ALL
   * columns share a salt; a corpus hot enough to duplicate full rows
   * at reducer-breaking volume should dedup first.)
   */
  /** The deterministic per-row salt: whole-row hash mod `salts` — a
    * pure function of the row's values, never of partition layout. */
  private[graft] def saltColumn(left: DataFrame, salts: Int): Column =
    pmod(xxhash64(left.columns.map(col).toIndexedSeq: _*), lit(salts)).cast("int")

  def saltedJoin(left: DataFrame, right: DataFrame, leftKey: String,
      rightKey: String, salts: Int): DataFrame = {
    val saltedLeft = left.withColumn("_salt", saltColumn(left, salts))
    val explodedRight = right.withColumn("_salt",
      explode(array((0 until salts).map(lit): _*)))
    saltedLeft.join(explodedRight,
        saltedLeft(leftKey) === explodedRight(rightKey)
          && saltedLeft("_salt") === explodedRight("_salt"))
      .drop("_salt")
  }
}
