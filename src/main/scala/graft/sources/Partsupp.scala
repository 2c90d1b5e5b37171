package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Deterministic synthetic `partsupp` (TPC-H's part-supplier bridge;
 * ref: the openGauss kernel accepts all 22 TPC-H shapes, but the
 * driver's test data ships no partsupp table — this generator closes
 * the Q2/Q11/Q16/Q20 capability gap at spec level, and the queries
 * auto-gate against a real `partsupp.parquet` if one ever appears).
 *
 * Layout follows dbgen: exactly 4 supplier rows per part, supplier
 * keys strided by max(1, S/4) so a part's suppliers are always
 * DISTINCT (i·step for i<4 is injective mod S whenever 4·step ≤ S,
 * and S ≥ 4 in every TPC-H scale). All attributes are closed-form in
 * (p_partkey, i):
 *   ps_availqty   = (p_partkey·7 + i·131) mod 9999 + 1
 *   ps_supplycost = (p_partkey·31 + i·97) mod 10000 + 1
 * ps_supplycost is INTEGER-VALUED (whole dollars, stored double):
 * cost×qty products and their sums stay exact in fp64 (< 2^53), so
 * Q11's HAVING threshold compares identically in any engine and any
 * aggregation order — the property that makes these queries
 * hash-exact oracle material rather than tolerance-compared.
 */
object Partsupp {
  /** Synthesize partsupp for the part/supplier tables under `dir`. */
  def synth(spark: SparkSession, dir: String): DataFrame = {
    val nSupp = graft.Tables(spark, dir, "supplier").count()
    require(nSupp >= 4, s"graft: need >= 4 suppliers, found $nSupp")
    val step = math.max(1L, nSupp / 4)
    graft.Tables(spark, dir, "part").select(col("p_partkey"))
      .select(col("p_partkey").as("ps_partkey"),
        explode(sequence(lit(0L), lit(3L))).as("i"))
      .select(col("ps_partkey"),
        (pmod(col("ps_partkey") + col("i") * step, lit(nSupp)) + 1L).as("ps_suppkey"),
        (pmod(col("ps_partkey") * 7L + col("i") * 131L, lit(9999L)) + 1L)
          .cast("int").as("ps_availqty"),
        (pmod(col("ps_partkey") * 31L + col("i") * 97L, lit(10000L)) + 1L)
          .cast("double").as("ps_supplycost"))
  }
}
