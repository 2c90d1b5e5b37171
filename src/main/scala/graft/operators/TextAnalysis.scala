package graft.operators

import graft.functions.TextStats
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Bridge

/**
 * Text-analysis operators for LLM training-data pipelines (SURVEY §2 D7–D10).
 * All computations are deterministic integer/ratio math so the DuckDB
 * oracle can reproduce them exactly.
 *
 * Tokenization: lower-cased split on single spaces (the corpus is
 * single-spaced); punctuation-aware token counting mirrors a regex
 * shared verbatim with the oracle.
 *
 * All counting runs in graft.functions.TextStats — ONE compiled pass
 * per document. The previous formulation ran four interpreted
 * higher-order `filter` lambdas (stopword hits per language), an
 * array_distinct, a regexp_replace and a regexp_extract_all per row:
 * the 25–95× HOF penalty documented in SURVEY §3, measured at
 * 5.4s + 4.8s for langid+tokens on the sf0.1 bench.
 */
object TextAnalysis {

  /** Lower-cased whitespace tokens. */
  def tokens(text: Column): Column = split(lower(text), " ")

  /** Single-pass counters struct; see graft.functions.TextStats. */
  def stats(text: Column): Column =
    Bridge.column(TextStats(Bridge.expression(text)))

  /**
   * n-gram/stopword language-ID heuristic: argmax of per-language
   * stopword hit counts; 'und' (unknown) when no list scores > 0.
   * Ties resolve in fixed order en > es > de > fr (greatest-with-CASE,
   * mirrored in SQL).
   */
  def langId(text: Column): Column = {
    val st = stats(text)
    val en = st.getField("sw_en"); val es = st.getField("sw_es")
    val de = st.getField("sw_de"); val fr = st.getField("sw_fr")
    val mx = greatest(en, es, de, fr)
    when(mx === 0, "und")
      .when(en === mx, "en").when(es === mx, "es")
      .when(de === mx, "de").otherwise("fr")
  }

  /**
   * Quality features + a weighted score in [0,1]:
   * length norm, stopword ratio, repetition (1 - distinct/total tokens),
   * punctuation ratio.
   */
  def qualityFeatures(text: Column): Column = {
    val st = stats(text)
    val n = st.getField("n_tokens").cast("double")
    val nd = st.getField("n_distinct").cast("double")
    val sw = st.getField("sw_en").cast("double")
    val pr = st.getField("punct").cast("double") /
      greatest(st.getField("n_chars"), lit(1L)).cast("double")
    struct(
      st.getField("n_tokens").as("n_tokens"),
      st.getField("n_distinct").as("n_distinct"),
      round(sw / n, 6).as("stopword_ratio"),
      round(lit(1.0) - nd / n, 6).as("repetition"),
      round(pr, 6).as("punct_ratio"),
      round(
        least(n / 400d, lit(1.0)) * 0.4
          + (lit(1.0) - (lit(1.0) - nd / n)) * 0.4
          + least(sw / n * 10d, lit(1.0)) * 0.2, 6).as("quality"))
  }

  /**
   * PII scrubbing: mask email addresses and URLs — the redaction pass a
   * training corpus takes before packing. Patterns deliberately use
   * only syntax with IDENTICAL semantics in Java regex (Spark codegen)
   * and RE2 (DuckDB oracle): character classes, +, bounded repeats —
   * no backrefs or lookaround, so the gate can assert the scrubbed TEXT
   * hash-exactly. URL first (an URL may embed an @), then email.
   */
  def scrubPii(text: Column): Column =
    regexp_replace(
      regexp_replace(text, "https?://[^ ]+", "<URL>"),
      "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z][A-Za-z]+", "<EMAIL>")

  /**
   * Average unigram log-probability under the corpus's own empirical
   * distribution — the classic cheap LM-quality proxy (documents of
   * common words score high; gibberish and boilerplate outliers score
   * low). Two aggregations over the exploded token stream: term
   * frequencies (equi-join — the vocabulary is NOT broadcast, it can be
   * billions of terms at 100 TB) and the scalar total (1-row broadcast).
   * avg(ln(tf/total)) is order-robust to 1e-13, rounded at 1e-6 for the
   * exact gate. Output: (id, n_scored, logprob).
   */
  def unigramLogProb(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String): org.apache.spark.sql.DataFrame = {
    val toks = df.select(col(idCol).as("id"),
        explode(split(lower(col(textCol)), " ")).as("tok"))
      .filter(col("tok") =!= "")
    val freqs = toks.groupBy("tok").agg(count(lit(1)).as("tf"))
    val total = toks.agg(count(lit(1)).as("n_total"))
    toks.join(freqs, "tok")
      .crossJoin(broadcast(total))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_scored"),
        round(avg(log(col("tf").cast("double") / col("n_total"))), 6)
          .as("logprob"))
  }

  /**
   * Bigram-LM per-document negative log-likelihood — the CCNet-style
   * LM-perplexity quality stage (Wenzek et al. 2020: filter/bucket web
   * text by a language-model perplexity score) one order above
   * [[unigramLogProb]]. The "model" is an add-one-smoothed bigram
   * table trained on the corpus itself:
   *   p(b|a) = (n_ab + 1) / (n_a + V)
   * and each doc scores nll = −Σ ln p(w_i | w_{i−1}) / n_pairs
   * (perplexity = e^nll, monotone-equivalent — the gate keeps nll so
   * no cross-engine exp enters the artifact).
   *
   * Scale shape: the bigram table is corpus-vocabulary-sized (a real
   * web corpus has billions of bigrams) so it joins by EQUI-JOIN,
   * never broadcast — the same discipline as the classifier weights;
   * only V (one row) broadcasts. Per-doc sums are 6dp-rounded
   * DECIMAL(18,6) — order-invariant, hash-exact.
   *
   * Output: (id, n_pairs, nll) for every doc with ≥ 2 tokens.
   */
  def bigramNll(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String): org.apache.spark.sql.DataFrame = {
    val toks = split(lower(col(textCol)), " ")
    val pairsArr = when(size(toks) >= 2,
      transform(sequence(lit(1), size(toks) - 1), i =>
        struct(element_at(toks, i).as("a"), element_at(toks, i + 1).as("b"))))
      .otherwise(array().cast("array<struct<a:string,b:string>>"))
    val docPairs = df.select(col(idCol).as("id"), explode(pairsArr).as("p"))
      .select(col("id"), col("p.a").as("a"), col("p.b").as("b"))
    val big = docPairs.groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("nab"))
    val unis = df.select(explode(toks).as("a"))
    val uni = unis.groupBy(col("a")).agg(count(lit(1)).as("na"))
    val vocab = unis.agg(countDistinct(col("a")).as("v"))
    docPairs
      .join(big, Seq("a", "b"))
      .join(uni, Seq("a"))
      .crossJoin(broadcast(vocab))
      .select(col("id"),
        round(log((col("nab").cast("double") + 1.0) /
          (col("na").cast("double") + col("v").cast("double"))), 6)
          .cast("decimal(18,6)").as("lnp"))
      .groupBy(col("id"))
      // total nll in exact integer MICROS (the 6dp decimal sum scaled)
      // rather than a rounded avg: round(sum/n, 6) sits on a .5·1e-6
      // boundary for real rows (found at sf0.1) where engines' double-
      // rounding paths disagree; nll = nll_micros / n_pairs / 1e6
      .agg(count(lit(1)).as("n_pairs"),
        ((-sum(col("lnp"))) * lit(1000000)).cast("long").as("nll_micros"))
  }

  /**
   * Stupid-backoff trigram LM scoring (Brants et al., EMNLP 2007
   * "Large Language Models in Machine Translation" — the web-scale LM
   * smoothing that needs NO discount fitting) one order above
   * [[bigramNll]]: S(w₃|w₁w₂) = c₃/c₁₂ when the trigram was seen in
   * training, else 0.4·c₂₃/c(w₂), else 0.4²·(c(w₃)+1)/(N+V)
   * (add-one at the unigram floor so OOV tokens stay finite).
   *
   * The model TRAINS on the `train` subset and scores EVERY doc —
   * scoring the training corpus with itself would never exercise
   * backoff. All count tables are EQUI-JOINED onto the trigram stream
   * (web-scale n-gram tables are billions of rows — never broadcast,
   * the D27/D39 discipline). GRAM TEXT NEVER SHUFFLES (the D18
   * discipline): every shuffle key — the count-table groupBys, the
   * five count lookups, the doc-side pre-aggregation — is an 8-byte
   * xxhash64 of the gram, computed map-side right after the explode,
   * with the strings dropped before any exchange. And the doc stream
   * PRE-AGGREGATES per (id, trigram): identical trigrams within a doc
   * score identically, so each rides the join stack once with a
   * multiplicity instead of once per occurrence. Determinism:
   * per-distinct-gram round(ln S, 6) as DECIMAL × multiplicity,
   * summed to exact integer micros (the D39 device — no
   * rounded-average double boundary; the decimal product is exact, so
   * the result is identical to the per-occurrence sum).
   */
  def trigramBackoffNll(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, train: Column): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.graft.Bridge
    val trainDf = df.filter(train)
    // ALL THREE count tables from ONE corpus scan: every 1/2/3-gram
    // hash minted class-tagged in one compiled pass (TaggedGramHashes)
    // and PIVOTED per class in one aggregate keyed on the hash alone —
    // one (h, c1, c2, c3) row per gram hash. The previous shape kept
    // cls in the grouping key and filtered the class ABOVE the shared
    // exchange, counting on ReuseExchange; the optimizer pushed each
    // class filter below the aggregate instead, splitting the exchange
    // six ways — the corpus gram explode ran six times (~70 CPU-
    // seconds at sf0.1). With the class pivoted into columns there is
    // nothing to push: the training corpus is read and exploded ONCE,
    // and the five lookup subtrees are identical, so ReuseExchange/
    // ReuseBroadcast dedupe for real. A zero count means "hash exists
    // in another class only" and reads back as NULL (nullif) — exactly
    // the old per-class tables' left-join semantics; cross-class hash
    // collisions keep separate columns, the same ~n²/2⁻⁶⁴ bound as
    // before.
    val counts = trainDf.select(explode(Bridge.column(
        graft.functions.TaggedGramHashes(Bridge.expression(col(textCol)))))
        .as("g"))
      .groupBy(col("g.h").as("h"))
      .agg(sum(when(col("g.cls") === 1, 1L).otherwise(0L)).as("cu"),
        sum(when(col("g.cls") === 2, 1L).otherwise(0L)).as("cb"),
        sum(when(col("g.cls") === 3, 1L).otherwise(0L)).as("ct"))
    // totals DERIVE from the unigram counts (bigN = Σ cu, V = rows
    // with cu > 0) — the corpus is never re-scanned for them
    val totals = counts.agg(sum(col("cu")).as("bigN"),
      sum((col("cu") > 0L).cast("long")).as("vocabV"))
    // doc-side stream: all five probe keys minted in the same
    // compiled pass (one 40-byte struct per trigram), exploded once,
    // then ONE pre-aggregation per (id, trigram) — the grouping key
    // is just (id, h123); the other four keys are determined by the
    // trigram, so they ride as first() aggregates instead of widening
    // the shuffle key
    val docTri = df.select(col(idCol).as("id"),
        explode(Bridge.column(graft.functions.TrigramProbeHashes(
          Bridge.expression(col(textCol))))).as("g"))
      .select(col("id"), col("g.h123").as("h123"), col("g.h12").as("h12"),
        col("g.h23").as("h23"), col("g.h2").as("h2"), col("g.h3").as("h3"))
      .groupBy(col("id"), col("h123"))
      .agg(count(lit(1)).as("m"), first(col("h12")).as("h12"),
        first(col("h23")).as("h23"), first(col("h2")).as("h2"),
        first(col("h3")).as("h3"))
    // ONE lookup join for all five probes: the five (role, key) pairs
    // MELT into rows, join the counts table once, and pivot back per
    // (id, trigram). Five per-key joins — even against the same
    // pivoted table — de-duplicate only partially: column pruning
    // specializes each lookup branch to its class column, so the gram
    // exchange still executed 3× (executed-plan evidence in
    // plans/r20). The melted join needs the counts subtree ONCE, and
    // the pivot-back groupBy rides the docTri aggregate's existing
    // (id, h123) partitioning — no extra exchange. nullif restores
    // the absent-row NULL of the old per-class tables.
    val roles = array(
      struct(lit(0).as("r"), col("h123").as("h")),
      struct(lit(1).as("r"), col("h12").as("h")),
      struct(lit(2).as("r"), col("h23").as("h")),
      struct(lit(3).as("r"), col("h2").as("h")),
      struct(lit(4).as("r"), col("h3").as("h")))
    def pick(r: Int, cnt: String) =
      max(when(col("r") === r, nullif(col(cnt), lit(0L))))
    val scored = docTri
      .select(col("id"), col("h123"), col("m"), explode(roles).as("p"))
      .select(col("id"), col("h123"), col("m"),
        col("p.r").as("r"), col("p.h").as("h"))
      .join(counts, Seq("h"), "left")
      .groupBy(col("id"), col("h123"))
      .agg(first(col("m")).as("m"),
        pick(0, "ct").as("c3"), pick(1, "cb").as("c12"),
        pick(2, "cb").as("c23"), pick(3, "cu").as("n2"),
        pick(4, "cu").as("n3"))
      .crossJoin(broadcast(totals))
      .withColumn("s",
        when(col("c3").isNotNull,
          col("c3").cast("double") / col("c12").cast("double"))
          .when(col("c23").isNotNull,
            lit(0.4) * (col("c23").cast("double") / col("n2").cast("double")))
          .otherwise(lit(0.16) *
            ((coalesce(col("n3"), lit(0L)).cast("double") + 1.0) /
              (col("bigN").cast("double") + col("vocabV").cast("double")))))
      .select(col("id"), col("m"),
        round(log(col("s")), 6).cast("decimal(18,6)").as("lnp"),
        col("c3").isNull.cast("int").as("backoff"))
    scored.groupBy(col("id"))
      .agg(sum(col("m")).cast("long").as("n_tri"),
        sum(col("backoff") * col("m")).cast("long").as("n_backoff"),
        ((-sum(col("lnp") * col("m"))) * lit(1000000)).cast("long")
          .as("nll_micros"))
  }

  /**
   * Intra-document REPETITION signals — the Gopher/MassiveText
   * repetition filters (Rae et al. 2021, arXiv:2112.11446 §A1.1):
   * fraction of duplicated n-grams within a doc. Boilerplate, scraped
   * nav bars, and looping generations all score high while whole-doc
   * dedup can't see them. dupN = 1 − distinct_ngrams/ngrams.
   *
   * Entirely MAP-ONLY, one compiled pass per row (see
   * [[graft.functions.RepetitionStats]] — the declarative array-
   * expression chain re-evaluated its lambda-captured token array per
   * gram position, O(tokens²) per doc): the shape that runs at 100 TB
   * as a pure scan next to the other text kernels.
   * Output struct: (n_tokens, dup2_ratio, dup3_ratio) at 6dp.
   */
  def repetitionStats(text: Column): Column =
    Bridge.column(graft.functions.RepetitionStats(Bridge.expression(text)))

  /**
   * Model-based quality filtering — the fastText-classifier stage of
   * a pretrain pipeline (CCNet / LLaMA-style: a LINEAR text classifier
   * scores each doc, a threshold keeps or drops) with the weight table
   * standing in for trained parameters: top-`vocabSize` corpus tokens
   * by frequency, weight(rank) = (rank mod 7 − 3)/10 — deterministic,
   * so the gate is exact; a real deployment joins the same-shaped
   * table loaded from a trained model instead.
   *
   * Scale shape (the ONLY part that matters at 100 TB): weights apply
   * via an EQUI-JOIN on the token (a trained vocabulary can be tens of
   * millions of terms — never a broadcast literal), logits sum as
   * exact DECIMAL(18,1) per doc (one-decimal weights × integer tf —
   * order-invariant, engine-exact), decision at logit > 0.
   *
   * Output: (id, n_scored, logit DOUBLE, keep BOOLEAN).
   */
  def classifierQuality(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, vocabSize: Int = 200): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = df.select(col(idCol).as("id"),
        explode(split(lower(col(textCol)), " ")).as("tok"))
      .filter(col("tok") =!= "")
    // top-V via TakeOrderedAndProject (bounded heap, no global sort);
    // the V-row window that assigns ranks runs over vocabSize rows only
    val top = toks.groupBy(col("tok")).agg(count(lit(1)).as("tf"))
      .orderBy(col("tf").desc, col("tok")).limit(vocabSize)
    val ranked = top
      .withColumn("rank", row_number().over(
        Window.orderBy(col("tf").desc, col("tok"))))
      .select(col("tok"),
        ((pmod(col("rank"), lit(7)) - 3).cast("decimal(18,1)") / 10)
          .cast("decimal(18,1)").as("w"))
    toks.join(ranked, "tok")
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_scored"), sum(col("w")).as("logit"))
      .select(col("id"), col("n_scored"),
        col("logit").cast("double").as("logit"),
        (col("logit") > 0).as("keep"))
  }

  /** Whitespace token count. */
  def wsTokenCount(text: Column): Column = stats(text).getField("n_tokens")

  /** BPE-ish token count: letter runs, digit runs, single symbols. */
  def bpeTokenCount(text: Column): Column = stats(text).getField("bpe")

  /**
   * Polynomial rolling-hash fingerprint over characters:
   * h = (h * 31 + codepoint) mod 1e9+7 — a Rabin–Karp document
   * fingerprint, reproducible in SQL via list_reduce (single compiled
   * pass; the HOF formulation was O(n²) in interpreted substr calls).
   */
  def fingerprint(text: Column): Column =
    Bridge.column(graft.functions.RollingHash(Bridge.expression(text)))

  /** log₂ lookup table for within-doc entropy (1..128 covers the
    * corpus's ≤100-word docs); the SAME Scala doubles feed the Spark
    * array literal and the oracle's VALUES text, so both engines use
    * bit-identical logarithms (libm log() is NOT cross-engine
    * reproducible — a shared table is). */
  val Log2Table: IndexedSeq[Double] =
    (1 to 128).map(v => math.log(v.toDouble) / math.log(2.0))

  /** The oracle's half of [[Log2Table]]: a VALUES list `(v, l)`. */
  def log2ValuesSql: String =
    Log2Table.zipWithIndex
      .map { case (l, i) => s"(${i + 1}, ${l}e0)" }.mkString(", ")

  /**
   * Within-document word-entropy quality stage (the Shannon-entropy /
   * type-token-ratio filter of CCNet/Dolma-style pipelines; low
   * entropy = boilerplate or keyword stuffing).
   *
   * H = log₂n − (Σ c·log₂c)/n over per-doc word counts. The per-doc
   * sum Σ floor(c·log₂c·1e6) is an exact LONG (order-free under any
   * partitioning); the only shuffle is the (doc, word) count — the
   * same shape as vocab building, scales as the corpus token count.
   */
  /**
   * Flesch-style readability features (reading-ease / FK grade over
   * vowel-run syllable counts, Gopher-style hard-word ratio). The
   * corpus has no sentence punctuation, so sentences are fixed
   * 15-word pseudo-sentences — s = ceil(w/15) as floor((w+14)/15) in
   * DOUBLE so the same text runs on both engines. All inputs exact
   * LONG counts; the score doubles come from shared formula trees.
   * One explode + one per-doc aggregate — a single shuffle.
   */
  def readabilityStats(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String): org.apache.spark.sql.DataFrame = {
    val syl = greatest(
      size(regexp_extract_all(col("w"), lit("[aeiouy]+"), lit(0))), lit(1))
    val per = df
      .select(col(idCol), explode(tokens(col(textCol))).as("w"))
      .select(col(idCol), syl.as("syl"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("w"), sum("syl").as("syl"),
        sum(when(col("syl") >= 3, 1L).otherwise(0L)).as("hard"))
    val wD = col("w").cast("double"); val sylD = col("syl").cast("double")
    val s = floor((wD + lit(14.0)) / lit(15.0))
    per.select(col(idCol),
      col("w").as("n_words"), col("syl").as("n_syllables"), col("hard").as("n_hard"),
      s.cast("long").as("n_sentences"),
      (lit(206.835) - lit(1.015) * (wD / s) - lit(84.6) * (sylD / wD)).as("fre"),
      (lit(0.39) * (wD / s) + lit(11.8) * (sylD / wD) - lit(15.59)).as("fk_grade"))
  }

  def entropyStats(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String): org.apache.spark.sql.DataFrame = {
    val lg = array(Log2Table.map(lit): _*)
    val counts = df
      .select(col(idCol), explode(tokens(col(textCol))).as("w"))
      .groupBy(col(idCol), col("w")).agg(count(lit(1)).as("c"))
    counts.groupBy(col(idCol))
      .agg(sum("c").as("n"), count(lit(1)).as("nt"), max("c").as("mx"),
        sum(floor(col("c").cast("double") *
          element_at(lg, col("c").cast("int")) * lit(1e6)).cast("long")).as("s"))
      .select(col(idCol),
        col("n").as("n_words"), col("nt").as("n_types"), col("mx").as("max_freq"),
        (col("nt").cast("double") / col("n").cast("double")).as("ttr"),
        (element_at(lg, col("n").cast("int")) -
          (col("s").cast("double") / lit(1e6)) / col("n").cast("double"))
          .as("entropy"))
  }
}
