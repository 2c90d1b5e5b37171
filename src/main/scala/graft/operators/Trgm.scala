package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * pg_trgm-compatible trigram similarity (PostgreSQL `contrib/pg_trgm`,
 * which the openGauss kernel ships; ref similarity semantics:
 * shared/union over padded word trigrams). The reference's vector side
 * handles embedding similarity; pg_trgm is the STRING-similarity
 * surface a user porting PG/openGauss SQL would reach for
 * (`similarity(a,b)`, `a % b`, trigram-index LIKE acceleration).
 *
 * Trigram extraction matches PG: lowercase, split into words on
 * non-alphanumeric runs, pad each word with two leading and one
 * trailing space, emit every 3-char window, dedupe across the whole
 * string — e.g. show_trgm('word') = {"  w"," wo","wor","ord","rd "}.
 *
 * Everything is pure Column arithmetic (codegen'd, no UDF). The
 * pair-search form is the batch analog of a pg_trgm GiST `%` scan:
 * candidates from a trigram equi-join with a count lower bound
 * (sim ≥ τ ⟺ shared ≥ τ·(na+nb)/(1+τ)), never all-pairs.
 */
object Trgm {

  /** PG-semantics padded word trigram set (distinct, order not
    * meaningful — comparisons use set intersection). */
  def trigrams(text: Column): Column = {
    val words = filter(split(lower(text), "[^a-z0-9]+"), w => length(w) > 0)
    array_distinct(flatten(transform(words, w =>
      transform(sequence(lit(1), length(w) + 1), i =>
        concat(lit("  "), w, lit(" ")).substr(i, lit(3))))))
  }

  /** similarity() over two precomputed trigram sets. */
  def similarityOfSets(ta: Column, tb: Column): Column = {
    val shared = size(array_intersect(ta, tb)).cast("double")
    val uni = (size(ta) + size(tb)).cast("double") - shared
    when(uni <= 0.0, lit(0.0)).otherwise(shared / uni)
  }

  /** PG `similarity(text, text)`: trigram-set Jaccard in [0,1]. */
  def similarity(a: Column, b: Column): Column =
    similarityOfSets(trigrams(a), trigrams(b))

  /**
   * All pairs with similarity ≥ tau — the `a % b` search as a batch
   * join. Shape: explode distinct trigrams, equi-join on the trigram,
   * count shared per pair, keep pairs passing the exact count bound.
   * `maxDf` guards stop-trigrams (a trigram in d docs fans d² join
   * rows): grams with df > maxDf are dropped from CANDIDATE generation
   * only — a pair relying solely on ultra-common trigrams can be
   * missed, which mirrors pg_trgm's own signature saturation; pass
   * maxDf = Int.MaxValue for the exact join (or use the salted
   * decomposition in Dedup.ngramJaccardPairsSalted for exact + skew).
   */
  def similarPairs(docs: DataFrame, idCol: String, textCol: String,
      tau: Double, maxDf: Int = 4096): DataFrame = {
    // the trigram table feeds THREE consumers (the exploded candidate
    // join and both verify joins) — cache it once instead of
    // re-extracting trigrams per consumer
    val base = graft.Caching.ensureCached(
      docs.select(col(idCol).as("id"), trigrams(col(textCol)).as("tg"))
        .select(col("id"), size(col("tg")).as("n"), col("tg")))
    val ex = base.select(col("id"), col("n"), explode(col("tg")).as("g"))
    val light = if (maxDf == Int.MaxValue) ex else {
      val dfreq = ex.groupBy(col("g")).agg(count(lit(1)).as("gdf"))
      ex.join(dfreq.filter(col("gdf") <= maxDf), "g")
    }
    val cands = light.as("a").join(light.as("b"),
        col("a.g") === col("b.g") && col("a.id") < col("b.id") &&
          least(col("a.n"), col("b.n")).cast("double") >=
            greatest(col("a.n"), col("b.n")).cast("double") * tau)
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(count(lit(1)).as("shared_cand"))
    // verify on the FULL trigram sets (candidate counts may miss
    // heavy grams): re-join the two set columns and compute exactly
    cands.join(base.select(col("id").as("id_a"), col("tg").as("tga")), "id_a")
      .join(base.select(col("id").as("id_b"), col("tg").as("tgb")), "id_b")
      .select(col("id_a"), col("id_b"),
        round(similarityOfSets(col("tga"), col("tgb")), 6).as("sim"))
      .filter(col("sim") >= tau)
  }

  /**
   * One-query `%` search — the GIN trgm_ops scan shape (pg_trgm's
   * gin_extract_query_trgm → consistent check): the QUERY's trigrams
   * are extracted driver-side and ride as a literal array; one
   * map-only pass counts shared grams per document via a codegen'd
   * set intersection (the corpus is never exploded, no join at all
   * for a single query), then the exact similarity filter keeps
   * survivors. For a query TABLE, the same shape becomes a postings
   * equi-join (the [[similarPairs]] device keyed by qid).
   *
   * The count bound (sim ≥ τ ⟺ shared ≥ τ/(1+τ)·(na+nb)) prunes
   * before the division — same algebra pg_trgm's consistent function
   * applies to the posting bitmap.
   */
  /** Driver-side twin of [[trigrams]] for query literals + oracles. */
  def queryGrams(query: String): Seq[String] = {
    def wordGrams(w: String): Seq[String] = {
      val p = "  " + w.toLowerCase + " "
      (0 to p.length - 3).map(i => p.substring(i, i + 3))
    }
    query.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)
      .flatMap(wordGrams).distinct.toSeq
  }

  def search(docs: DataFrame, idCol: String, textCol: String,
             query: String, tau: Double): DataFrame = {
    val qGrams = queryGrams(query)
    require(qGrams.nonEmpty, "graft: trgm search query yields no trigrams")
    val qLit = array(qGrams.map(lit): _*)
    docs.select(col(idCol), trigrams(col(textCol)).as("tg"))
      .withColumn("shared", size(array_intersect(col("tg"), qLit)))
      // count lower bound: shared ≥ τ·(n+nq)/(1+τ). The final filter
      // keeps round(sim,6) ≥ τ, i.e. sim ≥ τ−5e-7, so the prefilter
      // must be a strict SUPERSET of that: run it at τ−1e-6. The
      // 1e-6 slack also swallows the sub-ulp double-product skew at
      // exact-boundary counts (e.g. 18/43 shared at τ=0.72) that
      // could otherwise drop a row the oracle keeps.
      .filter(col("shared").cast("double") * (1.0 + tau) >=
        (size(col("tg")) + qGrams.size).cast("double") * (tau - 1e-6))
      .withColumn("sim", round(similarityOfSets(col("tg"), qLit), 6))
      .filter(col("sim") >= tau)
      .drop("tg", "shared")
  }

  /**
   * Query-TABLE `%` search — the serving shape when many fuzzy
   * queries run at once: corpus trigram POSTINGS equi-join the
   * (broadcast) query trigram postings, count shared grams per
   * (qid, doc), and the similarity comes STRAIGHT FROM COUNTS
   * (trigram sets are distinct per side, so |A∩B| is the join count
   * and |A∪B| = n + nq − shared — no set re-intersection, no second
   * corpus pass). One shuffle on (qid, id); docs sharing no trigram
   * with a query never materialize a pair.
   */
  def searchMany(docs: DataFrame, idCol: String, textCol: String,
                 queries: DataFrame, qidCol: String, qtextCol: String,
                 tau: Double): DataFrame = {
    val post = docs
      .select(col(idCol), trigrams(col(textCol)).as("tg"))
      .select(col(idCol), size(col("tg")).as("n"), explode(col("tg")).as("g"))
    val qpost = queries
      .select(col(qidCol), trigrams(col(qtextCol)).as("qg"))
      .select(col(qidCol), size(col("qg")).as("nq"), explode(col("qg")).as("g"))
    post.join(broadcast(qpost), "g")
      .groupBy(col(qidCol), col(idCol))
      .agg(count(lit(1)).as("shared"), max(col("n")).as("n"),
        max(col("nq")).as("nq"))
      .withColumn("sim", round(col("shared").cast("double") /
        ((col("n") + col("nq")).cast("double") - col("shared").cast("double")), 6))
      .filter(col("sim") >= tau)
      .drop("shared", "n", "nq")
  }
}
