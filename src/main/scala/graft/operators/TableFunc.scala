package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * tablefunc residuals (reference: contrib/tablefunc/tablefunc.cpp).
 * crosstab and connectby are covered elsewhere (C27 pivot / C52
 * hierarchy); what remains is `normal_rand(n, mean, stddev)` —
 * tablefunc.cpp:137, a set of Gaussian deviates via Knuth's polar
 * method over the backend PRNG.
 *
 * The engine analogue is DETERMINISTIC by construction (a cluster
 * cannot reproduce a backend's PRNG stream, and gates need exactness):
 * each row's two uniforms come from a Lehmer LCG step keyed by
 * (seed + id) — x' = (1103515245·x + 12345) mod 2^31, the POSIX
 * rand(3) constants, exact in 63-bit integer arithmetic on any SQL
 * engine — and the pair feeds the Box–Muller transform. The formula
 * TEXT is shared verbatim with the DuckDB oracle so both engines build
 * identical IEEE trees; output is floor-quantized to integer micros.
 *
 * contrib/intagg needs NO code: int_array_enum/int_array_aggregate are
 * exactly the C24/C58 array explode/collect_list surface.
 */
object TableFunc {

  /** The shared scalar formula: value = mean + stddev · BoxMuller(u1,u2),
    * floor-quantized to micros. `id` must be a BIGINT column. */
  def normalRandSql(mean: String, stddev: String, seed: Long): String =
    s"""CAST(FLOOR(($mean + $stddev * (
       |  SQRT(-2e0 * LN((((1103515245 * (id + $seed) + 12345) % 2147483648) + 1) / 2147483649e0))
       |  * COS(6.283185307179586e0 *
       |      (((1103515245 * ((1103515245 * (id + $seed) + 12345) % 2147483648) + 12345) % 2147483648) + 1)
       |      / 2147483649e0)
       |)) * 1e6) AS BIGINT)""".stripMargin.replace("\n", " ")

  /** normal_rand(n, mean, stddev) with an explicit seed: n rows of
    * (id, val_micro). Distributed via spark.range — map-only. */
  def normalRand(spark: SparkSession, n: Long, mean: Double, stddev: Double,
      seed: Long): DataFrame = {
    // e-notation: bare decimals parse as DECIMAL in both engines with
    // engine-specific type math; scientific toString is already fine
    def lit(d: Double): String = {
      val s = d.toString
      if (s.contains('E') || s.contains('e')) s.toLowerCase else s + "e0"
    }
    spark.range(n).selectExpr("id",
      normalRandSql(lit(mean), lit(stddev), seed) + " AS val_micro")
  }
}
