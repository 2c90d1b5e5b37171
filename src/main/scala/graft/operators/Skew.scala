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
   * (left = the skewed/fact side). Deterministic salt from the row's
   * whole key hash would collapse — so the salt must spread rows of the
   * SAME key: derived from a per-row monotonic id hash.
   */
  def saltedJoin(left: DataFrame, right: DataFrame, leftKey: String,
      rightKey: String, salts: Int): DataFrame = {
    val saltedLeft = left.withColumn("_salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(salts)).cast("int"))
    val explodedRight = right.withColumn("_salt",
      explode(array((0 until salts).map(lit): _*)))
    saltedLeft.join(explodedRight,
        saltedLeft(leftKey) === explodedRight(rightKey)
          && saltedLeft("_salt") === explodedRight("_salt"))
      .drop("_salt")
  }
}
