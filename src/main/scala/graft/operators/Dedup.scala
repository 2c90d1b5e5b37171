package graft.operators

import graft.functions.{HashShingles, MinHashSig, SimHash64, WordShingleHashes}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Bridge

/**
 * Deduplication family for LLM training-data pipelines (SURVEY §2 D1–D5).
 *
 * Scale design (SURVEY §5): near-dup candidate generation is always a
 * band/segment equi-join on short keys (minhash band value, simhash
 * segment) — the shuffle carries (band, bucket) rows, never O(n²) pairs.
 * Exact verification runs only on bucket-colocated candidates.
 * Connected components use bounded min-label propagation.
 */
object Dedup {

  /** Canonical text form: trim, lower, collapse whitespace. */
  def normalize(text: Column): Column =
    regexp_replace(trim(lower(text)), "\\s+", " ")

  /** Exact dedup: sha256 over normalized text, keep min id per hash. */
  def exactSurvivors(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.select(col(idCol), sha2(normalize(col(textCol)), 256).as("h"))
      .groupBy(col("h"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Distinct lower-cased word w-shingles ("n-grams") of a text column. */
  def shingles(text: Column, w: Int = 3): Column = {
    val t = split(lower(text), " ")
    // guard: Spark's sequence(1, n) is descending for n < 1
    when(size(t) < w, array().cast("array<string>"))
      .otherwise(array_distinct(
        transform(sequence(lit(1), size(t) - (w - 1)),
          i => concat_ws(" ", (0 until w).map(o => element_at(t, i + o)): _*))))
  }

  /**
   * MinHash signature column: min of (a_j*h + b_j) mod 2^31-1 over the
   * xxhash64'd shingles, one entry per hash function (single compiled
   * pass — see graft.functions.MinHashSig).
   */
  def minhashSignature(shinglesCol: Column, numHashes: Int, seed: Long = 42L): Column =
    Bridge.column(MinHashSig(
      Bridge.expression(hashedShingles(shinglesCol)), numHashes, seed))

  /** MinHash signature over an already-hashed shingle column. */
  def minhashSignatureFromHashes(hsCol: Column, numHashes: Int, seed: Long = 42L): Column =
    Bridge.column(MinHashSig(Bridge.expression(hsCol), numHashes, seed))

  /** xxhash64 of each shingle (compiled loop). */
  def hashedShingles(shinglesCol: Column): Column =
    Bridge.column(HashShingles(Bridge.expression(shinglesCol)))

  /**
   * Fused text → distinct hashed w-shingles in one compiled pass —
   * same values as hashedShingles(shingles(text)) without the
   * interpreted per-shingle lambda (see WordShingleHashes).
   */
  def hashedWordShingles(text: Column, w: Int = 3): Column =
    Bridge.column(WordShingleHashes(Bridge.expression(text), w))

  /** LSH band values: hash of each r-slice of the signature. */
  def minhashBands(sigCol: Column, bands: Int, r: Int): Column =
    array((0 until bands).map(b => xxhash64(slice(sigCol, b * r + 1, r))): _*)

  /**
   * Candidate (id_a < id_b) pairs from a banded/bucketed table via
   * self-equi-join on the bucket key, with an optional width guard.
   *
   * An uncapped bucket of width w contributes w(w-1)/2 pairs — one
   * degenerate bucket (empty/boilerplate docs all sharing a band value)
   * floods the join at corpus scale. With maxBucket = B > 0, buckets
   * wider than B switch from all-pairs to PIVOT CHAINING: every member
   * pairs only with the bucket's min id — linear in w. For a true
   * dup-flood bucket the cluster survives intact (members connect
   * transitively through the pivot, so connected components and
   * survivors are unchanged); what's sacrificed is completeness of the
   * raw pair LIST inside pathological buckets, and that sacrifice is
   * logged (bucket count + dropped pair mass) so nothing silently
   * truncates. B = 0 disables the guard (the exact-oracle default).
   */
  /** AUTO flood-guard cap from a bucket-width histogram: 4·median + 16.
    * Balanced buckets sit far below it; a mass-dup flood sits far
    * above, so only genuine pathology trips the (logged) pivot chain. */
  private[graft] def autoBucketGuard(widths: Seq[Long]): Int =
    if (widths.isEmpty) 0
    else {
      val sorted = widths.sorted
      math.min(4L * sorted(sorted.length / 2) + 16L, Int.MaxValue.toLong).toInt
    }

  def bucketCandidatePairs(bucketed: DataFrame, keyCols: Seq[String],
      idCol: String, maxBucket: Int = 0): DataFrame = {
    val keys = keyCols.map(col)
    def pairJoin(d: DataFrame): DataFrame =
      d.as("x").join(d.as("y"),
          keyCols.map(k => col(s"x.$k") === col(s"y.$k"))
            .reduce(_ && _) && col(s"x.$idCol") < col(s"y.$idCol"))
        .select(col(s"x.$idCol").as("id_a"), col(s"y.$idCol").as("id_b"))
    if (maxBucket <= 0) pairJoin(bucketed).dropDuplicates("id_a", "id_b")
    else {
      val sized = bucketed.join(
        bucketed.groupBy(keys: _*).agg(count(lit(1)).as("w")), keyCols)
      val flood = sized.filter(col("w") > maxBucket)
      // visible truncation report: tiny aggregate (one row per flooded
      // bucket), collected once — the guard path is explicitly opt-in
      val stats = flood.groupBy(keys: _*).agg(count(lit(1)).as("w")).collect()
      if (stats.nonEmpty) {
        val droppedPairs = stats.map { r =>
          val w = r.getLong(r.length - 1); w * (w - 1) / 2 - (w - 1)
        }.sum
        org.apache.log4j.Logger.getLogger(getClass).warn(
          s"graft: ${stats.length} bucket(s) wider than $maxBucket; " +
            s"pivot-chaining replaces ~$droppedPairs within-bucket pairs")
      }
      val pivots = flood.groupBy(keys: _*).agg(min(col(idCol)).as("id_a"))
      val chained = flood.join(pivots, keyCols)
        .filter(col(idCol) =!= col("id_a"))
        .select(col("id_a"), col(idCol).as("id_b"))
      pairJoin(sized.filter(col("w") <= maxBucket))
        .unionByName(chained)
        .dropDuplicates("id_a", "id_b")
    }
  }

  /**
   * Near-dup candidate pairs via banded MinHash LSH, verified with exact
   * shingle Jaccard >= tau. Output: (id_a < id_b, jaccard).
   *
   * Scale shape: the per-doc index (hashed shingles + signature) is
   * computed once and cached; the band join carries only (id, band,
   * bucket). maxBucket > 0 arms the flood guard (bucketCandidatePairs).
   */
  def minhashPairs(df: DataFrame, textCol: String, idCol: String,
      numHashes: Int = 64, bands: Int = 16, tau: Double = 0.5,
      maxBucket: Int = 0): DataFrame = {
    val r = numHashes / bands
    val base = graft.Caching.ensureCached(
      df.select(col(idCol).as("id"), hashedWordShingles(col(textCol)).as("hs"))
        .withColumn("sig", minhashSignatureFromHashes(col("hs"), numHashes))
        .select(col("id"), col("hs"), col("sig")))
    val banded = base.select(col("id"),
      posexplode(minhashBands(col("sig"), bands, r)).as(Seq("band", "bv")))
    // No signature-agreement pre-prune here: it risked recall (a true
    // pair ~2.4σ out on 64 hashes could be dropped while the query
    // declares an exact pair-set oracle), and exact verification already
    // bounds cost to bucket-colocated candidates.
    val cand = bucketCandidatePairs(banded, Seq("band", "bv"), "id", maxBucket)
    val hsA = base.select(col("id").as("id_a"), col("hs").as("hs_a"))
    val hsB = base.select(col("id").as("id_b"), col("hs").as("hs_b"))
    cand.join(hsA, "id_a").join(hsB, "id_b")
      .withColumn("inter", size(array_intersect(col("hs_a"), col("hs_b"))).cast("double"))
      .withColumn("jaccard", round(col("inter") /
        (size(col("hs_a")) + size(col("hs_b")) - col("inter")), 6))
      .filter(col("jaccard") >= tau)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /**
   * Persistable near-dup index: (id, hs, sig) per document — hashed
   * shingles for exact verification plus the minhash signature for
   * banding. Band rows are DERIVED at query time (cheap arithmetic on
   * sig), so the stored index is one row per doc, not bands× that.
   */
  def dedupIndex(docs: DataFrame, textCol: String, idCol: String,
      numHashes: Int = 64): DataFrame =
    docs.select(col(idCol).as("id"), hashedWordShingles(col(textCol)).as("hs"))
      .withColumn("sig", minhashSignatureFromHashes(col("hs"), numHashes))

  /**
   * Incremental near-dup — the daily-drop shape: verify a small DELTA
   * against an existing corpus index without re-pairing the corpus
   * with itself. Candidates = delta×corpus band-bucket equi-join (the
   * delta side is small, AQE broadcasts it; corpus×corpus pairs are
   * never generated) ∪ delta×delta (the usual banded self-join, flood
   * guard available). Verification is exact shingle Jaccard, so the
   * output EQUALS minhashPairs(corpus ∪ delta) restricted to pairs
   * touching a delta doc (spec-asserted). Ids must be disjoint across
   * index and delta. A corpus-side stop bucket fans w_corpus·w_delta
   * candidate rows — bounded by the delta's bucket width, not the
   * corpus's square.
   */
  def incrementalMinhashPairs(index: DataFrame, newDocs: DataFrame,
      textCol: String, idCol: String, numHashes: Int = 64, bands: Int = 16,
      tau: Double = 0.5, maxBucket: Int = 0): DataFrame = {
    val r = numHashes / bands
    val newIdx = graft.Caching.ensureCached(
      dedupIndex(newDocs, textCol, idCol, numHashes))
    def banded(df: DataFrame): DataFrame = df.select(col("id"),
      posexplode(minhashBands(col("sig"), bands, r)).as(Seq("band", "bv")))
    val cross = banded(newIdx).as("x").join(banded(index).as("y"),
        col("x.band") === col("y.band") && col("x.bv") === col("y.bv") &&
          col("x.id") =!= col("y.id"))
      .select(least(col("x.id"), col("y.id")).as("id_a"),
        greatest(col("x.id"), col("y.id")).as("id_b"))
    val within = bucketCandidatePairs(banded(newIdx), Seq("band", "bv"),
      "id", maxBucket)
    val cand = cross.unionByName(within).dropDuplicates("id_a", "id_b")
    val all = index.select(col("id"), col("hs"))
      .unionByName(newIdx.select(col("id"), col("hs")))
    cand
      .join(all.select(col("id").as("id_a"), col("hs").as("hs_a")), "id_a")
      .join(all.select(col("id").as("id_b"), col("hs").as("hs_b")), "id_b")
      .withColumn("inter",
        size(array_intersect(col("hs_a"), col("hs_b"))).cast("double"))
      .withColumn("jaccard", round(col("inter") /
        (size(col("hs_a")) + size(col("hs_b")) - col("inter")), 6))
      .filter(col("jaccard") >= tau)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /**
   * Exact n-gram Jaccard similarity for all pairs above tau via a single
   * gram equi-join with count-based verification.
   *
   * Cost model: the join fans out Σ_g df(g)² rows, so this is the right
   * exact plan when gram document-frequencies are modest (shingled
   * natural text: w-shingles are rare — measured max df 25 on the test
   * corpus). The rows carried are narrow (id, gram-hash, length) — no
   * arrays ever cross a shuffle — and intersection sizes come from one
   * map-side-combinable count aggregate, so the whole plan is two
   * shuffles. For Zipfian gram distributions (huge-df grams) use
   * [[ngramJaccardPairsPrefix]], which excludes each doc's most frequent
   * grams from candidate generation.
   *
   * A length filter inside the join prunes pairs that cannot reach tau:
   * J >= tau implies min(|a|,|b|) >= tau * max(|a|,|b|).
   *
   * Grams are joined as xxhash64 longs, not strings: ~3x smaller
   * shuffle, same counts (a collision among n distinct grams perturbs a
   * count with probability ~n²/2^64 — negligible).
   */
  def ngramJaccardPairs(df: DataFrame, textCol: String, idCol: String,
      tau: Double): DataFrame = {
    val base = df.select(col(idCol).as("id"),
        hashedWordShingles(col(textCol)).as("hs"))
      .select(col("id"), size(col("hs")).as("n"), explode(col("hs")).as("gram"))
    val inter = base.as("a").join(base.as("b"),
        col("a.gram") === col("b.gram") && col("a.id") < col("b.id")
          && least(col("a.n"), col("b.n")).cast("double") >=
             greatest(col("a.n"), col("b.n")).cast("double") * tau)
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.n").as("na"), col("b.n").as("nb"))
      .agg(count(lit(1)).as("i"))
    inter
      .select(col("id_a"), col("id_b"),
        round(col("i").cast("double") /
          (col("na") + col("nb") - col("i")).cast("double"), 6).as("jaccard"))
      .filter(col("jaccard") >= tau)
  }

  /**
   * Skew-salted form of [[ngramJaccardPairs]] for Zipfian gram
   * distributions: a gram with document frequency d fans d² rows
   * through ONE join key, so a stop-shingle shared by the whole corpus
   * funnels the entire join through one reducer — AQE can split the
   * partition, but the explicit salt also bounds the per-task pair
   * block deterministically. Grams with df > maxDf are decomposed per
   * gram into ceil(df/maxDf) id-hash blocks joined as block PAIRS
   * (the allPairsBlocked scheme, keyed by (gram, i, j)): every
   * unordered within-gram pair appears in exactly one bucket and no
   * bucket holds more than ~maxDf² pairs. Light grams take the plain
   * equi-join. Pair contributions from both regimes union BEFORE the
   * intersection count, so the output is exactly ngramJaccardPairs's.
   * Costs one extra shuffle (the df profile), so engage it when the
   * gram df distribution is Zipfian — shingled natural text (measured
   * max df 25 on the test corpus) doesn't need it.
   */
  def ngramJaccardPairsSalted(df: DataFrame, textCol: String, idCol: String,
      tau: Double, maxDf: Int = 256): DataFrame = {
    val base = df.select(col(idCol).as("id"),
        hashedWordShingles(col(textCol)).as("hs"))
      .select(col("id"), size(col("hs")).as("n"), explode(col("hs")).as("gram"))
    val dfreq = base.groupBy(col("gram")).agg(count(lit(1)).as("gdf"))
    val tagged = base.join(dfreq, "gram")
    val lenOk =
      least(col("a.n"), col("b.n")).cast("double") >=
        greatest(col("a.n"), col("b.n")).cast("double") * tau
    val light = tagged.filter(col("gdf") <= maxDf)
    val lightPairs = light.as("a").join(light.as("b"),
        col("a.gram") === col("b.gram") && col("a.id") < col("b.id") && lenOk)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.n").as("na"), col("b.n").as("nb"))
    val heavy = tagged.filter(col("gdf") > maxDf)
      .withColumn("nblk", ceil(col("gdf") / maxDf).cast("int"))
      .withColumn("blk", pmod(xxhash64(col("id")), col("nblk")).cast("int"))
    val hLeft = heavy.select(col("id"), col("n"), col("gram"), col("nblk"),
        col("blk"), explode(sequence(col("blk"), col("nblk") - 1)).as("j"))
      .select(col("id"), col("n"), struct(col("gram"),
        col("blk").as("i"), col("j")).as("bp"))
    val hRight = heavy.select(col("id"), col("n"), col("gram"), col("nblk"),
        col("blk"), explode(sequence(lit(0), col("blk"))).as("i"))
      .select(col("id"), col("n"), struct(col("gram"),
        col("i"), col("blk").as("j")).as("bp"))
    val heavyPairs = hLeft.as("a").join(hRight.as("b"),
        col("a.bp") === col("b.bp") &&
          (col("a.bp.i") =!= col("a.bp.j") || col("a.id") < col("b.id")) && lenOk)
      .select(least(col("a.id"), col("b.id")).as("id_a"),
        greatest(col("a.id"), col("b.id")).as("id_b"),
        when(col("a.id") < col("b.id"), col("a.n")).otherwise(col("b.n")).as("na"),
        when(col("a.id") < col("b.id"), col("b.n")).otherwise(col("a.n")).as("nb"))
    lightPairs.unionByName(heavyPairs)
      .groupBy(col("id_a"), col("id_b"), col("na"), col("nb"))
      .agg(count(lit(1)).as("i"))
      .select(col("id_a"), col("id_b"),
        round(col("i").cast("double") /
          (col("na") + col("nb") - col("i")).cast("double"), 6).as("jaccard"))
      .filter(col("jaccard") >= tau)
  }

  /**
   * Exact n-gram Jaccard pairs via prefix filtering (PPJoin-style): with
   * sets canonically ordered by ascending document frequency, any pair
   * with J >= tau must share a gram within each side's first
   * n - ceil(tau*n) + 1 grams. Only prefixes join (rare grams → tiny
   * candidate lists); full verification runs on the complete hashed-gram
   * sets. Same output as ngramJaccardPairs, far fewer candidate pairs —
   * the 100 TB form of the exact algorithm.
   */
  def ngramJaccardPairsPrefix(df: DataFrame, textCol: String, idCol: String,
      tau: Double): DataFrame = {
    val base = graft.Caching.ensureCached(
      df.select(col(idCol).as("id"), hashedWordShingles(col(textCol)).as("hs"))
        .filter(size(col("hs")) > 0))
    val dfreq = base.select(explode(col("hs")).as("g"))
      .groupBy("g").agg(count(lit(1)).as("df"))
    // canonical order: ascending df, gram hash as tiebreak. Positions via
    // a per-doc sort of (df, g) structs — shuffle by id + small local
    // sorts, instead of a global row_number window over every (doc, gram).
    val ordered = base.select(col("id"), explode(col("hs")).as("g"))
      .join(dfreq, "g")
      .groupBy(col("id"))
      .agg(sort_array(collect_list(struct(col("df"), col("g")))).as("sorted"))
      .select(col("id"), size(col("sorted")).as("n"),
        posexplode(col("sorted")).as(Seq("p0", "e")))
      .select(col("id"), col("n"), (col("p0") + 1).as("pos"), col("e.g").as("g"))
    val prefix = ordered.filter(
      col("pos") <= col("n") - ceil(col("n") * tau) + 1)
    // PPJoin+ candidate join: besides the shared-prefix-gram condition,
    // (a) length filter — J >= tau implies min(n) >= tau*max(n); and
    // (b) positional filter — a gram matching at positions (pa, pb) bounds
    // the total overlap by min(pa-1, pb-1) + 1 + min(na-pa, nb-pb), which
    // must reach the minimum overlap tau/(1+tau)*(na+nb). Both prune only
    // provably-impossible pairs: a true pair passes every one of its
    // shared-gram rows, so one surviving row keeps it.
    val cand = prefix.as("a").join(prefix.as("b"),
        col("a.g") === col("b.g") && col("a.id") < col("b.id")
          && least(col("a.n"), col("b.n")).cast("double") >=
             greatest(col("a.n"), col("b.n")).cast("double") * tau
          && (least(col("a.pos"), col("b.pos")) - 1 + 1 +
              least(col("a.n") - col("a.pos"), col("b.n") - col("b.pos")))
             .cast("double") >= (col("a.n") + col("b.n")) * (tau / (1 + tau)))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .dropDuplicates("id_a", "id_b")
    val hsA = base.select(col("id").as("id_a"), col("hs").as("hs_a"))
    val hsB = base.select(col("id").as("id_b"), col("hs").as("hs_b"))
    cand.join(hsA, "id_a").join(hsB, "id_b")
      .withColumn("inter", size(array_intersect(col("hs_a"), col("hs_b"))).cast("double"))
      .withColumn("jaccard", round(col("inter") /
        (size(col("hs_a")) + size(col("hs_b")) - col("inter")), 6))
      .filter(col("jaccard") >= tau)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /**
   * Exact all-pairs over an embedding table as a block-pair EQUI-join:
   * rows hash into B blocks; a row in block k is replicated to every
   * block-pair key (k, j>=k) on the left and (i<=k, k) on the right, so
   * each unordered pair appears in exactly one block-pair bucket (the
   * diagonal keeps id_a < id_b). ~B replicas per row, B(B+1)/2 evenly
   * sized shuffle buckets, no BroadcastNestedLoopJoin, no driver-side
   * anything.
   *
   * Closest-pairs with no similarity floor is inherently Θ(n²) compute;
   * this is the shape that distributes it. When a similarity threshold
   * IS available (true near-dup detection), use
   * [[embeddingNearDupPairs]] — bucketed candidates, sub-quadratic.
   *
   * Output: (id_a < id_b, va, vb) — one row per unordered pair.
   */
  def allPairsBlocked(df: DataFrame, vecCol: String, idCol: String,
      blocks: Int = 16): DataFrame = {
    val rows = df.select(col(idCol).as("id"), col(vecCol).as("v"),
      pmod(xxhash64(col(idCol)), lit(blocks)).cast("int").as("blk"))
    val all = array((0 until blocks).map(lit): _*)
    val left = rows.select(col("id"), col("v"), col("blk"),
        explode(all).as("j"))
      .filter(col("j") >= col("blk"))
      .select(struct(col("blk").as("i"), col("j").as("j")).as("bp"),
        col("id"), col("v"))
    val right = rows.select(col("id"), col("v"), col("blk"),
        explode(all).as("i"))
      .filter(col("i") <= col("blk"))
      .select(struct(col("i").as("i"), col("blk").as("j")).as("bp"),
        col("id"), col("v"))
    left.as("a").join(right.as("b"),
        col("a.bp") === col("b.bp") &&
          (col("a.bp.i") =!= col("a.bp.j") || col("a.id") < col("b.id")))
      .select(least(col("a.id"), col("b.id")).as("id_a"),
        greatest(col("a.id"), col("b.id")).as("id_b"),
        col("a.v").as("va"), col("b.v").as("vb"))
  }

  /**
   * Embedding near-dup pairs via random-hyperplane LSH buckets + exact
   * cosine verification: candidates share >= 1 (band, bucket) key — an
   * equi-join on short keys, never O(n²) outside buckets — and only
   * verified pairs with cosine distance <= maxCosDist survive.
   *
   * Recall depends on the regime: a true near-dup (cos sim >= 0.9,
   * bit-agreement p >= 0.85) collides in >= 1 of 16 8-bit bands w.p.
   * ~0.97+; DedupSpec plants perturbed duplicates and asserts full
   * recall. For a frontier barely above random similarity no banding
   * separates signal from bulk — use [[allPairsBlocked]] there.
   */
  def embeddingNearDupPairs(df: DataFrame, vecCol: String, idCol: String,
      maxCosDist: Double, nbits: Int = 128, bands: Int = 16,
      dim: Int = 64, seed: Long = 42L, maxBucket: Int = 0): DataFrame = {
    val r = nbits / bands
    val planes = Lsh.hyperplanes(dim, nbits, seed)
    val banded = Lsh.banded(df, vecCol, idCol, planes, bands, r)
      .select(col(idCol).as("id"), col("band"), col("bucket"))
    val cand = bucketCandidatePairs(banded, Seq("band", "bucket"), "id", maxBucket)
    val va = df.select(col(idCol).as("id_a"), col(vecCol).as("va"))
    val vb = df.select(col(idCol).as("id_b"), col(vecCol).as("vb"))
    cand.join(va, "id_a").join(vb, "id_b")
      .select(col("id_a"), col("id_b"),
        round(graft.functions.VectorFunctions.cosineDistance(col("va"), col("vb")), 6)
          .as("cosd"))
      .filter(col("cosd") <= maxCosDist)
  }

  /**
   * SemDeDup-style SEMANTIC dedup (Abbas et al. 2023, arXiv:2303.09540
   * — the public recipe behind semantic pruning of web-scale corpora):
   * cluster embeddings with k-means, then inside each cluster drop
   * every doc that has a SMALLER-id neighbor within `maxCosDist` (the
   * paper keeps one representative per epsilon-ball; min-id is the
   * deterministic choice). Near-identical paraphrases that exact and
   * n-gram dedup miss are exactly what lands inside a ball.
   *
   * Scale shape: candidate pairs form ONLY within a cluster (an
   * equi-join on list_id — never all-pairs), clusters are k-means-
   * balanced, and the verify is an exact cosine on the pair set.
   *
   * The flood guard is ON BY DEFAULT (maxBucket = -1 → AUTO): the
   * pathological case — a mass-duplicated embedding collapsing one
   * list — is exactly what semantic dedup runs INTO by design, so the
   * unguarded quadratic pair join cannot be the default. AUTO derives
   * the cap from the per-list width histogram (nlists rows, computed
   * over the cached 16-byte (id, list_id) projection): 4·median + 16 —
   * k-means-balanced lists sit well under it, only a flooded list
   * trips pivot chaining (linear in width; survivors unchanged for a
   * true dup ball, because every member pairs with the min-id pivot —
   * the exact doc the SemDeDup min-id rule keeps). The truncation is
   * logged by bucketCandidatePairs when it fires. maxBucket = 0
   * forces the unguarded exact pair set; > 0 sets an explicit cap.
   * At the gate's tiny thresholds detection is exhaustive (every true
   * pair co-clusters), so the survivor set equals the brute-force
   * oracle's.
   *
   * Output: the surviving rows of `df` (all columns), one per kept id.
   */
  def semanticDedup(df: DataFrame, vecCol: String, idCol: String,
      model: graft.operators.Ivf.Model, maxCosDist: Double,
      maxBucket: Int = -1): DataFrame = {
    val tagged = graft.Caching.ensureCached(
      graft.operators.Ivf.assign(df, vecCol, model)
        .select(col(idCol).as("id"), col("list_id")))
    // AUTO mode already holds the per-list width histogram on the
    // driver — decide here whether ANY list exceeds the cap. In the
    // common balanced case none does, and the guarded plan is then
    // IDENTICAL in output to the unguarded one (the flood branch is
    // provably empty), so skip its machinery outright: the width
    // re-aggregation + join, the flood-report collect job, the pivot/
    // chain branches and their union all drop out of the plan.
    val guard =
      if (maxBucket >= 0) maxBucket
      else {
        val widths = tagged.groupBy(col("list_id"))
          .agg(count(lit(1)).as("w"))
          .select(col("w")).collect().map(_.getLong(0)).toSeq
        val g = autoBucketGuard(widths)
        if (widths.forall(_ <= g)) 0 else g
      }
    val cand = bucketCandidatePairs(tagged, Seq("list_id"), "id", guard)
    val va = df.select(col(idCol).as("id_a"), col(vecCol).as("va"))
    val vb = df.select(col(idCol).as("id_b"), col(vecCol).as("vb"))
    val dropped = cand.join(va, "id_a").join(vb, "id_b")
      .filter(round(graft.functions.VectorFunctions.cosineDistance(
        col("va"), col("vb")), 6) <= maxCosDist)
      .select(col("id_b").as(idCol)).distinct()
    df.join(dropped, Seq(idCol), "left_anti")
  }

  /** 64-bit SimHash of lower-cased tokens, packed into one long. */
  def simhash64(text: Column): Column =
    Bridge.column(SimHash64(Bridge.expression(split(lower(text), " "))))

  /**
   * SimHash near-dup pairs with hamming <= maxDist, found via pigeonhole
   * buckets keyed on PAIRS of signature segments: with `nSegs` segments
   * and 2-segment keys, any pair with hamming <= nSegs - 2 leaves at
   * least two segments untouched, so it shares at least one exact
   * 2-segment key — full recall up to that bound with 2×segLen-bit
   * selectivity (single-segment keys flood on correlated corpora: one
   * 8-bit bucket held 37% of a shared-vocabulary corpus). The
   * bit_count(xor) filter then guarantees precision.
   */
  def simhashPairs(df: DataFrame, textCol: String, idCol: String,
      maxDist: Int = 6, nSegs: Int = 8, maxBucket: Int = 0): DataFrame = {
    require(64 % nSegs == 0 && maxDist <= nSegs - 2,
      s"pigeonhole bound: need maxDist <= nSegs-2 (got $maxDist, $nSegs)")
    val segLen = 64 / nSegs
    val mask = (1L << segLen) - 1
    // cache: the self-join would otherwise recompute every signature on
    // both sides (tokenize + 64-bit fold per doc)
    val withSig = graft.Caching.ensureCached(
      df.select(col(idCol).as("id"), simhash64(col(textCol)).as("sh")))
    def segv(q: Int): Column =
      shiftrightunsigned(col("sh"), q * segLen).bitwiseAND(mask)
    val pairKeys = array((for (i <- 0 until nSegs; j <- i + 1 until nSegs) yield
      struct(lit(i * nSegs + j).as("seg"),
        shiftLeft(segv(i), segLen).bitwiseOR(segv(j)).as("sv"))): _*)
    val seg = withSig.select(col("id"), explode(pairKeys).as("kv"))
      .select(col("id"), col("kv.seg").as("seg"), col("kv.sv").as("sv"))
    val shA = withSig.select(col("id").as("id_a"), col("sh").as("sha"))
    val shB = withSig.select(col("id").as("id_b"), col("sh").as("shb"))
    bucketCandidatePairs(seg, Seq("seg", "sv"), "id", maxBucket)
      .join(shA, "id_a").join(shB, "id_b")
      .withColumn("hamming", bit_count(col("sha").bitwiseXOR(col("shb"))).cast("long"))
      .filter(col("hamming") <= maxDist)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }

  /**
   * Connected components over dup pairs; returns (id, root) where root
   * is the component's minimum id. The step is the alternating
   * large-star / small-star algorithm (Kiveris et al., "Connected
   * Components in MapReduce and Beyond", 2014): state is a canonical
   * (u > v) edge set; large-star re-points every neighbor bigger than u
   * at the minimum of u's neighborhood, small-star re-points u and its
   * smaller neighbors the same way. Both phases are groupBy + equi-join
   * rounds (the shuffle carries bare (u, v) longs), converging in
   * O(log² n) rounds to per-component stars centered at the minimum
   * node — at which point both phases are no-ops and the fixpoint's
   * symmetric-difference test reads 0. Runs on [[Iterate.fixpoint]], so
   * lineage truncation is a RELIABLE checkpoint whenever the session
   * has a checkpoint dir (the gated mains all set one) — an executor
   * loss mid-iteration recomputes from the last round's files instead
   * of killing the job, which localCheckpoint could not survive.
   */
  def connectedComponents(pairs: DataFrame, maxIter: Int = 40): DataFrame = {
    val init = pairs
      .select(greatest(col("id_a"), col("id_b")).as("u"),
        least(col("id_a"), col("id_b")).as("v"))
      .filter(col("u") =!= col("v")).distinct().cache()
    // Broadcast-small dup graphs (the common case: verified pairs are a
    // tiny fraction of the corpus even at 100TB) skip the LS/SS rounds
    // entirely — one driver union-find pass costs less than a single
    // round's scheduling overhead. Union-by-min keeps the smaller id as
    // root at every link, so the final root of each tree is the
    // component minimum — the exact output contract of the star
    // fixpoint below. Above the threshold the distributed path is
    // unchanged.
    // unpersist on BOTH branches: the fast path has consumed init by
    // collect, and the distributed fixpoint materializes its first
    // checkpoint from init eagerly — after either returns, the cached
    // blocks are dead weight for the rest of the session.
    try {
      Iterate.collectIfSmall(init) match {
        case Some(edges) =>
          val out = localUnionFind(edges)
          val s = pairs.sparkSession
          import s.implicits._
          out.toSeq.toDF("id", "root")
        case None => ccDistributed(init, maxIter)
      }
    } finally init.unpersist()
  }

  /** Driver-local union-find with path compression; returns (id, minRoot)
   *  for every id appearing in the edge set (roots map to themselves). */
  private def localUnionFind(edges: Array[(Long, Long)]): Array[(Long, Long)] = {
    val parent = scala.collection.mutable.LongMap.empty[Long]
    def find(x: Long): Long = {
      var r = x
      while (parent(r) != r) r = parent(r)
      var c = x
      while (c != r) { val nx = parent(c); parent(c) = r; c = nx }
      r
    }
    edges.foreach { case (u, v) =>
      if (!parent.contains(u)) parent(u) = u
      if (!parent.contains(v)) parent(v) = v
      val ru = find(u); val rv = find(v)
      if (ru < rv) parent(rv) = ru
      else if (rv < ru) parent(ru) = rv
    }
    parent.keys.toArray.map(id => (id, find(id)))
  }

  private def ccDistributed(init: DataFrame, maxIter: Int): DataFrame = {
    val stars = Iterate.fixpoint(init, maxIter, "connectedComponents") { e =>
      // large-star: m = min(Γ(u) ∪ {u}); emit (v, m) for v ∈ Γ(u), v > u.
      // Needs full neighborhoods, so symmetrize the canonical edge set.
      val adj = e.select(col("u"), col("v"))
        .union(e.select(col("v").as("u"), col("u").as("v")))
      val lsMin = adj.groupBy(col("u")).agg(min(col("v")).as("mn"))
        .select(col("u"), least(col("mn"), col("u")).as("m"))
      // cached, not checkpointed: small-star consumes it twice within
      // the round, and an executor loss only recomputes THIS round from
      // the previous round's reliable checkpoint — cross-round lineage
      // is what the fixpoint truncates. Old rounds' caches are
      // unreferenced after the round and GC-cleaned by ContextCleaner.
      val ls = adj.join(lsMin, "u").filter(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v")).distinct().cache()
      // small-star over (u > v) edges: m = min(N(u)); re-point u and all
      // its smaller neighbors at m. Emits (x, m) for x ∈ N(u) \ {m} ∪ {u}.
      val ssMin = ls.groupBy(col("u")).agg(min(col("v")).as("m"))
      ls.join(ssMin, "u").filter(col("v") =!= col("m"))
        .select(col("v").as("u"), col("m").as("v"))
        .union(ssMin.select(col("u"), col("m").as("v")))
        .distinct()
    } { (prev, next) =>
      // star sets are fixpoints of both phases, so exact set stability
      // is the convergence test (distinct sets → except is exact)
      next.except(prev).union(prev.except(next)).count()
    }
    stars.select(col("u").as("id"), col("v").as("root"))
      .union(stars.select(col("v").as("id"), col("v").as("root")))
      .distinct()
  }

  /**
   * Dedup survivors given verified pairs: every id keeps iff it is the
   * min id of its duplicate cluster; ids in no cluster always survive.
   */
  def survivorsFromPairs(df: DataFrame, idCol: String, pairs: DataFrame): DataFrame = {
    val cc = connectedComponents(pairs)
    df.select(col(idCol).as("id"))
      .join(cc, Seq("id"), "left")
      .withColumn("keep", col("root").isNull || col("root") === col("id"))
  }

  /**
   * Quality-aware survivor selection: within each duplicate cluster
   * keep the ARGMAX-score document (ties broken by min id) instead of
   * blindly keeping the min id — the form a curation pipeline actually
   * wants (keep the longest/cleanest copy, drop the rest). Clusters
   * come from [[connectedComponents]] over the verified pair set; the
   * per-cluster pick is a window rank over (score desc, id asc) —
   * clusters are tiny relative to the corpus, so the window partitions
   * stay small at any scale. Score must be deterministic (use an
   * integer feature like token count for exact gating).
   * Output: (id, root, keep).
   */
  def survivorsByScore(df: DataFrame, idCol: String, scoreCol: String,
      pairs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cc = connectedComponents(pairs)
    df.select(col(idCol).as("id"), col(scoreCol).as("score"))
      .join(cc, Seq("id"), "left")
      .withColumn("root", coalesce(col("root"), col("id")))
      .withColumn("keep",
        row_number().over(Window.partitionBy(col("root"))
          .orderBy(col("score").desc, col("id"))) === 1)
      .select(col("id"), col("root"), col("keep"))
  }

  /**
   * Benchmark decontamination — the eval-leakage check every LLM
   * training pipeline runs before packing: flag training documents
   * sharing any word trigram with the benchmark set. The benchmark is
   * small by nature, so its distinct gram set BROADCASTS (never a
   * shuffle of the corpus side); the corpus grams stream through the
   * broadcast hash join and aggregate per doc. Output: (id, n_shared,
   * contaminated) for EVERY row of `docs` — the function does not know
   * which docs are benchmark members (`bench` needs no id column), so
   * callers must pass a `docs` frame with the benchmark rows already
   * removed, or benchmark docs will be flagged against themselves
   * (they trivially share all their grams).
   *
   * Grams travel as xxhash64 LONGS from the fused compiled shingle
   * kernel ([[hashedWordShingles]] — one pass per row), not as strings
   * from the interpreted HOF chain: the lambda-captured `split(text)`
   * re-evaluated per trigram position made the gram pass O(tokens²)
   * per document (measured 229 CPU-seconds at sf0.1; ~8 after).
   * Same values modulo hash collisions (~n²/2⁻⁶⁴ — the equivalence
   * every other dedup gate already pins), 8-byte join keys instead of
   * gram text.
   */
  def contaminationFlags(docs: DataFrame, textCol: String, idCol: String,
      bench: DataFrame, benchTextCol: String): DataFrame = {
    val docGrams = docs.select(col(idCol).as("id"),
      explode(hashedWordShingles(col(textCol), 3)).as("gram"))
    val benchGrams = bench
      .select(explode(hashedWordShingles(col(benchTextCol), 3)).as("gram"))
      .distinct()
    val hits = docGrams.join(broadcast(benchGrams), Seq("gram"))
      .groupBy(col("id")).agg(count(lit(1)).as("hits"))
    docs.select(col(idCol).as("id"))
      .join(hits, Seq("id"), "left_outer")
      .select(col("id"), coalesce(col("hits"), lit(0L)).as("n_shared"),
        (coalesce(col("hits"), lit(0L)) > 0L).as("contaminated"))
  }

  /**
   * Exact duplicated-SPAN detection — substring-level dedup (public
   * design: Lee et al. 2022, "Deduplicating Training Data Makes
   * Language Models Better"): the duplication whole-doc hashing and
   * near-dup pairing both miss is a verbatim passage repeated inside
   * otherwise-distinct documents. A w-token gram is DUPLICATED when it
   * occurs ≥ 2 times corpus-wide (across documents or repeated within
   * one); per document, duplicated gram positions at distance ≤ w merge
   * into maximal runs. Output: (id, start_tok, end_tok, n_grams) with
   * 1-based token indexes, end_tok = the last token any of the run's
   * grams covers.
   *
   * Scale shape: explode to (id, pos, gram-hash) → one map-side-combined
   * count per gram → left-semi join positions against the duplicated
   * grams (narrow 8-byte keys; the gram TEXT never shuffles) → one
   * per-doc window (partition width bounded by document length). The
   * oracle recomputes everything from gram STRINGS, pinning the
   * hash-vs-text equivalence the other dedup gates also rely on.
   */
  def duplicatedSpans(df: DataFrame, textCol: String, idCol: String,
      w: Int = 5): DataFrame = {
    require(w >= 2, "graft: span grams need w >= 2")
    val toks = df.select(col(idCol).as("id"),
      split(lower(col(textCol)), " ").as("t"))
    val grams = toks.select(col("id"),
        posexplode(when(size(col("t")) >= w,
          transform(sequence(lit(1), size(col("t")) - (w - 1)),
            p => xxhash64(concat_ws(" ", slice(col("t"), p, lit(w))))))
          .otherwise(array().cast("array<long>"))).as(Seq("p0", "g")))
      .select(col("id"), (col("p0") + 1).cast("long").as("pos"), col("g"))
    val dupGrams = grams.groupBy(col("g")).agg(count(lit(1)).as("c"))
      .filter(col("c") > 1).select(col("g"))
    val dupPos = grams.join(dupGrams, Seq("g"), "left_semi")
    val wnd = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id")).orderBy(col("pos"))
    dupPos
      .withColumn("newrun",
        when(col("pos") - lag(col("pos"), 1).over(wnd) <= w, 0).otherwise(1))
      .withColumn("run", sum(col("newrun")).over(
        wnd.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)))
      .groupBy(col("id"), col("run"))
      .agg(min(col("pos")).as("start_tok"),
        (max(col("pos")) + (w - 1)).as("end_tok"),
        count(lit(1)).as("n_grams"))
      .select(col("id"), col("start_tok"), col("end_tok"), col("n_grams"))
  }
}
