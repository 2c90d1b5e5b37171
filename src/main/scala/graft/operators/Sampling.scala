package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Deterministic sampling for training-data pipelines. Both forms are
 * pure functions of the input SET — no RNG state, no partition-order
 * dependence — so runs are reproducible and the gate can be
 * hash-exact. The "randomness" is a fixed integer mix of the id
 * (Knuth's multiplicative hash), giving a stable pseudo-random
 * permutation both engines compute identically in exact integer
 * arithmetic.
 *
 * Scale shapes:
 *  - `hashFraction` is MAP-ONLY (a filter; no shuffle, no state) —
 *    the right tool for "keep ~0.1% of 100 TB", composes with
 *    partition pruning and pushdown.
 *  - `stratifiedExactN` costs one shuffle on the stratum key plus a
 *    per-stratum EXTERNAL sort inside the window (spillable — a hot
 *    stratum sorts on disk, never OOM); emitted rows are capped at
 *    n per stratum. For n far below stratum sizes, a two-pass
 *    threshold refinement (sample the mix-value quantile, then
 *    filter) would avoid the full sort; the window form is exact and
 *    simpler, and the sort is over (long, long) pairs only — the
 *    payload stays columnar until the final semi-join-free select.
 */
object Sampling {

  /** Stable pseudo-random permutation key: id · 2654435761 mod 2³².
    * (Ids must fit the product in a signed 64-bit long — true for any
    * id < ~3.5e9; larger ids wrap in Spark but ERROR in engines with
    * checked BIGINT overflow, so the oracle-matched domain is the
    * unwrapped one.) */
  def mix(id: Column): Column =
    pmod(id.cast("long") * lit(2654435761L), lit(4294967296L))

  /**
   * Per-stratum exact-n deterministic sample: the n stratum members
   * with the smallest mix values (id tiebreak). Output: input columns
   * + `rk` (1..n rank within the stratum).
   */
  def stratifiedExactN(df: DataFrame, strataCol: String, idCol: String,
      n: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(strataCol))
      .orderBy(mix(col(idCol)), col(idCol))
    df.withColumn("rk", row_number().over(w)).filter(col("rk") <= n)
  }

  /**
   * Temperature-weighted source mixing — the mixture-flattening pass
   * LLM pipelines run so a 100× bigger source doesn't contribute 100×
   * the tokens: each source's quota scales as scale·n^temp (temp < 1
   * flattens; temp = 0.5 is the common sqrt mix), members picked in
   * Knuth-mix order. Per-source quotas are INDEPENDENT (no
   * cross-source normalization sum, whose float accumulation order
   * would be engine-dependent): quota = round(scale · n^temp), exact
   * for temp = 0.5 since sqrt is IEEE correctly-rounded in every
   * engine and a rational sqrt forces an integer (no .5 rounding
   * boundary exists). One count aggregate + the stratified window —
   * two shuffles on the source key total.
   * Output: input columns + rk (1-based pick order within source).
   */
  def mixBySource(df: DataFrame, sourceCol: String, idCol: String,
      temp: Double = 0.5, scale: Double = 5.0): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // sqrt is IEEE correctly-rounded everywhere; pow(x, y) is not —
    // route the common temp through sqrt so the quota is engine-exact
    def tempPow(n: Column): Column =
      if (temp == 0.5) sqrt(n)
      else if (temp == 1.0) n
      else pow(n, temp)
    val quotas = df.groupBy(col(sourceCol))
      .agg(round(tempPow(count(lit(1)).cast("double")) * scale, 0)
        .cast("long").as("_quota"))
    val w = Window.partitionBy(col(sourceCol))
      .orderBy(mix(col(idCol)), col(idCol))
    df.join(quotas, Seq(sourceCol))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= col("_quota"))
      .drop("_quota")
  }

  /** Bernoulli-by-hash sample keeping ~frac of rows: map-only filter,
    * deterministic, stratum-free. `mod` sets the resolution (defaults
    * to 1e6 → frac quantized to 1e-6). */
  def hashFraction(df: DataFrame, idCol: String, frac: Double,
      mod: Int = 1000000): DataFrame = {
    require(frac >= 0.0 && frac <= 1.0, "frac must be in [0,1]")
    df.filter(pmod(mix(col(idCol)), lit(mod.toLong)) <
      lit(math.round(frac * mod)))
  }
}
