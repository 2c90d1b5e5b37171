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

  /** Last keyed frame cached by [[shuffleBatches]] — see the eviction
    * note there. One slot per JVM bounds the pinned cache footprint. */
  private val lastKeyed =
    new java.util.concurrent.atomic.AtomicReference[DataFrame](null)

  /** Stable pseudo-random permutation key: id · 2654435761 mod 2³².
    * (Ids must fit the product in a signed 64-bit long — true for any
    * id < ~3.5e9; larger ids wrap in Spark but ERROR in engines with
    * checked BIGINT overflow, so the oracle-matched domain is the
    * unwrapped one.) */
  def mix(id: Column): Column =
    pmod(id.cast("long") * lit(2654435761L), lit(4294967296L))

  /**
   * Weighted sampling WITHOUT replacement, k items with inclusion
   * probability proportional to weight — Efraimidis & Spirakis
   * (IPL 2006) A-Res order statistics: key_i = −ln(u_i)/w_i with
   * u_i ~ U(0,1); the k SMALLEST keys are the sample. Distributed
   * shape: orderBy(key).limit(k) plans TakeOrderedAndProject — a
   * per-partition bounded heap + driver merge, NO global sort, NO
   * shuffle of non-survivors; one scan total.
   *
   * `u` is caller-supplied so determinism survives any engine:
   * production uses xxhash64(id, seed)/2⁶⁴; the cross-engine gate
   * derives u from md5 hex chars (both engines compute the identical
   * value). u must be in (0, 1] and weights > 0.
   */
  def weightedSampleK(df: DataFrame, u: Column, weight: Column,
                      k: Int): DataFrame =
    df.withColumn("_wkey", -log(u) / weight)
      .orderBy(col("_wkey")).limit(k)
      .drop("_wkey")

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
   * Deterministic OVERSAMPLING — mixture re-weighting WITH replacement
   * (the epoch-aware upsampling step a pretrain mixture needs when a
   * domain's weight exceeds its share): every row yields
   * floor(w) copies plus one more iff its epoch-salted Knuth-mix hash
   * falls under frac(w)·mod — the same device as [[hashFraction]], so
   * realized counts are a PURE FUNCTION of (corpus, weights, epoch):
   * reproducible on any cluster, no RNG state, and E[copies] = w
   * exactly. Output adds `copy_id` (0-based) so downstream batching
   * sees distinct rows; w < 1 downsamples (floor 0 + probabilistic
   * keep), w ≤ 0 yields nothing.
   *
   * Scale shape: map-only — one explode(sequence(0, n−1)) per row, no
   * shuffle, composes with the scan.
   */
  def oversample(df: DataFrame, idCol: String, weight: Column,
      epoch: Long = 0L, mod: Int = 1000000): DataFrame = {
    val floorW = floor(weight).cast("long")
    val extra = (pmod(epochMix(col(idCol), epoch), lit(mod.toLong)) <
      round((weight - floorW.cast("double")) * mod, 0).cast("long"))
      .cast("long")
    df.withColumn("__nc", floorW + extra)
      .filter(col("__nc") > 0)
      .withColumn("copy_id", explode(sequence(lit(0L), col("__nc") - 1)))
      .drop("__nc")
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
   * boundary exists). The stratum count rides the SAME window
   * partitioning as the rank (an unbounded-frame count over
   * partitionBy(source) shares the rank window's exchange+sort), so
   * the whole mix is ONE shuffle and ONE execution of the input —
   * the previous aggregate+join form ran the upstream plan twice
   * (once for quotas, once for ranks) and shuffled twice.
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
    val w = Window.partitionBy(col(sourceCol))
      .orderBy(mix(col(idCol)), col(idCol))
    val n = count(lit(1)).over(Window.partitionBy(col(sourceCol)))
    df.withColumn("rk", row_number().over(w))
      .withColumn("_quota",
        round(tempPow(n.cast("double")) * scale, 0).cast("long"))
      .filter(col("rk") <= col("_quota"))
      // column order of the old aggregate+join form (source key first)
      .select(col(sourceCol) +:
        df.columns.filterNot(_ == sourceCol).map(col) :+ col("rk"): _*)
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

  /** Epoch-salted permutation key: (id + epoch·1e9+7) · 2654435761
    * mod 2³² — epoch 0 is [[mix]]; each epoch is an independent
    * deterministic reshuffle of the same corpus.
    *
    * The multiply runs in two 16-bit halves after reducing the salted
    * id mod 2³²: the naive (id + epoch·1e9+7)·2654435761 exceeds a
    * SIGNED long once epoch ≥ 4 (ANSI mode throws ARITHMETIC_OVERFLOW
    * — found by the oversample spec). The split is congruent mod 2³²
    * ((hi·2¹⁶+lo)·m ≡ ((hi·m mod 2¹⁶)·2¹⁶ + lo·m)), so every value
    * the old form could produce is unchanged. */
  def epochMix(id: Column, epoch: Long): Column = {
    val a = pmod(id.cast("long") + lit(epoch * 1000000007L), lit(4294967296L))
    val hi = shiftright(a, 16)           // < 2^16
    val lo = a.bitwiseAND(lit(65535L))
    pmod(pmod(hi * lit(2654435761L), lit(65536L)) * lit(65536L) +
      lo * lit(2654435761L), lit(4294967296L))
  }

  /**
   * Deterministic GLOBAL shuffle + fixed-size batch assignment — the
   * data-ordering step a pretrain run needs after curation: every doc
   * gets a global position in a pseudo-random total order and a batch
   * id `position / batchSize`, reproducibly (same corpus + epoch →
   * byte-identical order on any cluster).
   *
   * Computing a global rank at 100 TB without a global sort: the
   * permutation key `epochMix` is uniform on [0, 2³²), so its top
   * `log2(nBuckets)` bits split the order into nBuckets contiguous,
   * EVENLY LOADED ranges. rank = (docs in all lower buckets) +
   * (row_number within my bucket) — one tiny aggregate for the bucket
   * histogram (nBuckets rows to the driver, broadcast back as a
   * literal offset array) + ONE window shuffle on the bucket key with
   * a spillable per-bucket sort of (key, id) pairs. No global
   * `orderBy` (whose range-partitioner SAMPLES the child in a second
   * job — nondeterministic boundaries and a double execution), no
   * driver-side ordering, batches exactly batchSize (last one
   * ragged).
   *
   * Output: input columns + (pos, batch_id), pos ∈ [0, n).
   */
  def shuffleBatches(df: DataFrame, idCol: String, batchSize: Long,
      epoch: Long = 0L, nBuckets: Int = 4096): DataFrame = {
    require(batchSize > 0, "batchSize must be positive")
    require(nBuckets > 0 && (nBuckets & (nBuckets - 1)) == 0 &&
      nBuckets <= (1 << 20), "nBuckets must be a power of 2 (<= 2^20)")
    import org.apache.spark.sql.expressions.Window
    val shift = 32 - java.lang.Integer.numberOfTrailingZeros(nBuckets)
    // CACHE the keyed frame: the bucket histogram below executes the
    // plan once at construction time, and the ranked result executes
    // it again — uncached, an expensive upstream (a whole curation
    // chain) would run TWICE per action. The cached projection is the
    // full input row + 12 bytes; at 100 TB pre-project to the id
    // column before calling (as the gates do) so the cache holds
    // (id, ord, bkt) only — spillable MEMORY_AND_DISK either way.
    // The pinned footprint is BOUNDED to one frame: each call evicts
    // the previous call's cache (different epochs produce different
    // plans, so an epoch loop would otherwise pin one full copy per
    // epoch until LRU pressure). Unpersist is correctness-safe — a
    // straggler still reading the evicted frame just recomputes.
    val keyed = graft.Caching.ensureCached(
      df.withColumn("_ord", epochMix(col(idCol), epoch))
        .withColumn("_bkt", shiftright(col("_ord"), shift).cast("int")))
    // CANONICALIZED comparison: two constructions of the same query
    // differ in raw ExprIds, and the CacheManager keys entries by the
    // canonicalized analyzed plan — comparing raw logicals here would
    // evict our OWN cache entry on every re-invocation (measured: the
    // r9 pipeline_batches double-execution fix silently undone, 0.8s
    // back to 14s).
    val prev = lastKeyed.getAndSet(keyed)
    if (prev != null && (prev ne keyed) &&
        prev.queryExecution.analyzed.canonicalized !=
          keyed.queryExecution.analyzed.canonicalized)
      prev.unpersist(blocking = false)
    // Bucket offsets computed DISTRIBUTEDLY and broadcast-joined back:
    // prefix-sum the (≤ nBuckets)-row bucket histogram with one
    // running-sum window (a single partition of nBuckets tiny rows —
    // never corpus-sized data) instead of collecting the histogram to
    // the driver and baking a nBuckets-entry literal array into every
    // row's expression (one scheduling round-trip per CALL at
    // construction time, plus a 4096-long literal through codegen).
    // offset(b) = Σ counts of buckets < b; buckets with no rows simply
    // have no row to join. Same pos values as the literal form.
    val offsets = keyed.groupBy(col("_bkt")).agg(count(lit(1)).as("_c"))
      .withColumn("_off",
        coalesce(sum(col("_c")).over(
          Window.orderBy(col("_bkt"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("_bkt"), col("_off"))
    val w = Window.partitionBy(col("_bkt"))
      .orderBy(col("_ord"), col(idCol))
    keyed
      .join(broadcast(offsets), "_bkt")
      .withColumn("pos", col("_off") + row_number().over(w) - 1)
      // `div`, not `/`: Column `/` is DOUBLE division (lossy past 2^53)
      .withColumn("batch_id", expr(s"pos div ${batchSize}L"))
      // restore the input column order (the join keyed on _bkt moved it
      // first); callers see input columns + (pos, batch_id), as before
      .select(df.columns.map(col) :+ col("pos") :+ col("batch_id"): _*)
  }
}
