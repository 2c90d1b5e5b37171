package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Bridge

import graft.functions.{Porter, StemLexemes, StemPhraseGapMatch, StemStats}

/**
 * Linguistic normalization for full-text search — the openGauss/PG
 * `english` text-search configuration's dictionary chain (reference:
 * src/common/backend/tsearch/ts_parse.cpp LexizeExec;
 * dict_snowball.c; the `english.stop` stop file): parser token →
 * stopword check (on the lowercased raw token, BEFORE stemming, as
 * the Snowball dictionary does) → [[graft.functions.Porter]] stem.
 *
 * Position semantics are PG's: every parser token consumes a 1-based
 * position; stopwords emit no lexeme but leave their position gap, so
 * `phraseto_tsquery('value the table')` compiles to `valu <2> tabl`
 * and matches across the dropped stopword.
 *
 * Scale shape: everything here is a map-only compiled scan per
 * document (single-pass expressions, no interpreted HOFs, no shuffle);
 * ranking composes the same driver-literal contribution table as
 * [[FullText.tsRank]], so the only per-row float work is a fixed-order
 * sum + norm divides.
 */
object Lexize {

  /** The Snowball/PG english stop list (english.stop, 127 words). */
  val stopWords: Set[String] = Set(
    "i", "me", "my", "myself", "we", "our", "ours", "ourselves",
    "you", "your", "yours", "yourself", "yourselves",
    "he", "him", "his", "himself", "she", "her", "hers", "herself",
    "it", "its", "itself", "they", "them", "their", "theirs", "themselves",
    "what", "which", "who", "whom", "this", "that", "these", "those",
    "am", "is", "are", "was", "were", "be", "been", "being",
    "have", "has", "had", "having", "do", "does", "did", "doing",
    "a", "an", "the", "and", "but", "if", "or", "because", "as",
    "until", "while", "of", "at", "by", "for", "with", "about",
    "against", "between", "into", "through", "during", "before",
    "after", "above", "below", "to", "from", "up", "down", "in",
    "out", "on", "off", "over", "under", "again", "further", "then",
    "once", "here", "there", "when", "where", "why", "how",
    "all", "any", "both", "each", "few", "more", "most", "other",
    "some", "such", "no", "nor", "not", "only", "own", "same",
    "so", "than", "too", "very",
    "s", "t", "can", "will", "just", "don", "should", "now")

  /** Hot-path view for the compiled expressions. */
  val stopJava: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](stopWords.size * 2)
    stopWords.foreach(s.add)
    s
  }

  /** A term is a stopword (checked pre-stem, like the dictionary). */
  def isStop(t: String): Boolean = stopWords.contains(t.toLowerCase)

  /**
   * dict_xsyn-style synonym canonicalization (ref: contrib/dict_xsyn/
   * dict_xsyn.cpp — a rules file maps each word of a group to the
   * group; PG's thesaurus dictionary normalizes both sides the same
   * way). Every token is rewritten to its group's canonical form via
   * a LITERAL map (broadcast into codegen, no join); unknown tokens
   * pass through. Applied to BOTH the corpus tokens and the query
   * terms, so `quick` matches a document saying `fast` once both map
   * to the same canon.
   */
  def canonToken(tok: Column, dict: Map[String, String]): Column =
    coalesce(element_at(typedLit(dict), tok), tok)

  /** Canonicalize a whole token array. */
  def canonTokens(toks: Column, dict: Map[String, String]): Column =
    transform(toks, t => canonToken(t, dict))

  /**
   * dict_int integer-token normalization (ref: contrib/dict_int/
   * dict_int.cpp:60-83 dintdict_lexize, defaults :38-39): a token
   * longer than `maxlen` CHARACTERS (the C code measures the raw
   * byte length, so a sign counts) is dropped when `rejectlong`,
   * else truncated to its first `maxlen` characters. Returns null
   * for a rejected token (PG returns the empty lexeme array).
   * Pure codegen'd string arithmetic — no UDF, no join.
   */
  def dictInt(tok: Column, maxlen: Int = 6,
              rejectlong: Boolean = false): Column =
    if (rejectlong) when(length(tok) <= maxlen, tok)
    else when(length(tok) <= maxlen, tok)
      .otherwise(substring(tok, 1, maxlen))

  /** to_tsvector('english', text): array<struct<lex,pos>>. */
  def lexemes(text: Column): Column =
    Bridge.column(StemLexemes(Bridge.expression(text)))

  /** to_tsvector(language, text): the language-keyed chain
    * (dict_snowball.c's `language =` parameter). The stop list is
    * caller-supplied — PG ships per-language stop files as config
    * data, not code. `lexemes(text)` ≡
    * `lexemes(text, "english", <english stop list>)`. */
  def lexemes(text: Column, lang: String, stop: Seq[String]): Column =
    Bridge.column(graft.functions.StemLexemesLang(
      Bridge.expression(text), lang, stop))

  /** One-pass (n_lex, n_uniq, tfs[...]) stats for stemmed `terms`. */
  def stemStats(text: Column, terms: Seq[String]): Column =
    Bridge.column(StemStats(Bridge.expression(text), terms))

  /** to_tsvector proper: array<struct<lex, positions>> sorted by lex
    * (PG's tsvector layout). The manipulation surface composes on
    * top: [[tsvectorLength]], [[tsvectorToArray]], [[tsDelete]]. */
  def tsvector(text: Column): Column =
    Bridge.column(graft.functions.TsVector(Bridge.expression(text)))

  /** length(tsvector): number of distinct lexemes. */
  def tsvectorLength(v: Column): Column = size(v)

  /** tsvector_to_array: the sorted lexeme list (also `strip`'s
    * information content — positions dropped). */
  def tsvectorToArray(v: Column): Column = transform(v, _.getField("lex"))

  /** ts_delete(tsvector, lexeme). */
  def tsDelete(v: Column, lexeme: String): Column =
    filter(v, x => x.getField("lex") =!= lexeme)

  // ---------------------------------------------------------------
  // query normalization (to_tsquery('english', …) analogue)
  // ---------------------------------------------------------------

  import FullText.{And, Node, Not, Or, Phrase}

  /**
   * Normalize a parsed tsquery tree: stem every term; DROP stopword
   * terms the way PG does — inside a phrase the dropped term's gap
   * folds into its successor (`big <-> the <-> tabl` ≡ `big <2>
   * tabl`); a boolean arm that normalizes away vanishes from its
   * AND/OR ("to_tsquery: text-search query contains only stop words
   * … ignored"). Returns None iff the whole query normalizes away.
   */
  def normalize(n: Node): Option[Node] = n match {
    case Phrase(terms, gaps) =>
      // positions of the phrase slots: 0, +gap1, +gap2, …
      val pos = gaps.scanLeft(0)(_ + _)
      val kept = terms.zip(pos).filterNot { case (t, _) => isStop(t) }
      if (kept.isEmpty) None
      else {
        val stemmed = kept.map { case (t, p) => (Porter.stem(t.toLowerCase), p) }
        Some(Phrase(stemmed.map(_._1),
          stemmed.sliding(2).collect { case Seq((_, a), (_, b)) => b - a }.toSeq))
      }
    case And(l, r) => (normalize(l), normalize(r)) match {
      case (Some(a), Some(b)) => Some(And(a, b))
      case (a, b)             => a.orElse(b)
    }
    case Or(l, r) => (normalize(l), normalize(r)) match {
      case (Some(a), Some(b)) => Some(Or(a, b))
      case (a, b)             => a.orElse(b)
    }
    case Not(c) => normalize(c).map(Not(_))
  }

  /** to_tsquery('english', q): parse + normalize; error if only stops. */
  def tsquery(q: String): Node = {
    val n = normalize(FullText.parseQuery(q))
    require(n.isDefined, s"tsquery contains only stop words: '$q'")
    n.get
  }

  /** phraseto_tsquery('english', free text): lexeme phrase with
    * parser-position gaps across dropped stopwords. */
  def phraseQuery(text: String): Phrase = {
    val toks = text.toLowerCase.split("\\s+").filter(_.nonEmpty)
    val kept = toks.zipWithIndex.collect {
      case (t, i) if !isStop(t) => (Porter.stem(t), i + 1)
    }
    require(kept.nonEmpty, s"phrase contains only stop words: '$text'")
    Phrase(kept.map(_._1).toSeq,
      kept.sliding(2).collect { case Array((_, a), (_, b)) => b - a }.toSeq)
  }

  private def compile(n: Node, raw: Column): Column = n match {
    case Phrase(terms, gaps) =>
      Bridge.column(StemPhraseGapMatch(Bridge.expression(raw), terms, gaps))
    case And(l, r) => compile(l, raw) && compile(r, raw)
    case Or(l, r)  => compile(l, raw) || compile(r, raw)
    case Not(c)    => !compile(c, raw)
  }

  /** tsvector @@ tsquery over NORMALIZED lexemes: `tsMatch(text,
    * "customers & merging")` hits documents containing `customer …
    * merge`. Query terms are stemmed/stop-dropped; matching runs on
    * the stemmed view of the document in compiled per-row scans. */
  def tsMatch(text: Column, query: String): Column =
    compile(tsquery(query), text)

  /** `@@` over a MATERIALIZED tsvector (the struct-array layout
    * TsVector / parse_tsvector produce) — exists/position algebra on
    * the entries instead of a text re-scan: a single term is an
    * entry-existence test; a phrase intersects gap-shifted position
    * lists stepwise (tsvector_op.cpp TS_phrase_execute). Stripped
    * vectors (no positions) answer false to phrase queries. */
  def tsvMatch(tsv: Column, query: String): Column = {
    def pos(term: String): Column =
      coalesce(
        get(filter(tsv, e => e.getField("lex") === term), lit(0))
          .getField("positions"),
        typedLit(Seq.empty[Int]))
    def node(n: Node): Column = n match {
      case Phrase(Seq(t), _) =>
        exists(tsv, e => e.getField("lex") === t)
      case Phrase(terms, gaps) =>
        val end = terms.tail.zip(gaps).foldLeft(pos(terms.head)) {
          case (valid, (t, gap)) =>
            array_intersect(transform(valid, p => p + gap), pos(t))
        }
        size(end) > 0
      case And(l, r) => node(l) && node(r)
      case Or(l, r)  => node(l) || node(r)
      case Not(c)    => !node(c)
    }
    node(tsquery(query))
  }

  /** A pre-normalized phrase node matcher (e.g. from [[phraseQuery]]). */
  def phraseMatch(text: Column, ph: Phrase): Column =
    Bridge.column(StemPhraseGapMatch(Bridge.expression(text), ph.terms, ph.gaps))

  /** Positive (non-negated) stemmed terms of a normalized query, in
    * tree order, deduplicated. */
  def positiveLexemes(query: String): Seq[String] = {
    def walk(n: Node, neg: Boolean): Seq[String] = n match {
      case Phrase(ts, _) => if (neg) Nil else ts
      case And(l, r)     => walk(l, neg) ++ walk(r, neg)
      case Or(l, r)      => walk(l, neg) ++ walk(r, neg)
      case Not(c)        => walk(c, !neg)
    }
    walk(tsquery(query), neg = false).distinct
  }

  /**
   * ts_rank over the stemmed tsvector (tsrank.cpp calc_rank_or under
   * uniform D weights) with PG's normalization bitmask — identical
   * arithmetic to [[FullText.tsRank]] (same driver-literal
   * contribution table) but tf / doc-length / distinct counts are
   * LEXEME-based: dl = number of indexed lexeme positions, uniq =
   * distinct lexemes, exactly PG's DocInfo over a stemmed vector.
   */
  def tsRank(text: Column, query: String, norm: Int = 0): Column = {
    require((norm & ~(1 | 2 | 8 | 16 | 32)) == 0,
      s"unsupported ts_rank normalization bits in $norm")
    val terms = positiveLexemes(query)
    require(terms.nonEmpty, "tsRank needs a query with positive terms")
    val st = stemStats(text, terms)
    val table = typedLit(FullText.rankTable)
    val raw = terms.indices.map { i =>
      val tf = element_at(st.getField("tfs"), i + 1)
      element_at(table, least(tf, lit(FullText.MaxNumPos)) + 1)
    }.reduce(_ + _)
    val dl = st.getField("n_lex").cast("double")
    val uniq = st.getField("n_uniq").cast("double")
    rankNorm(raw, dl, uniq, norm)
  }

  /** PG's ts_rank normalization bitmask over (raw, doc length,
    * distinct lexemes) — shared by the text and tsvector paths. */
  private def rankNorm(raw: Column, dl: Column, uniq: Column,
      norm: Int): Column = {
    var r = raw
    if ((norm & 1) != 0) r = when(dl > 1.0, r / (log(dl + 1.0) / math.log(2.0))).otherwise(r)
    if ((norm & 2) != 0) r = when(dl > 0.0, r / dl).otherwise(r)
    if ((norm & 8) != 0) r = when(uniq > 0.0, r / uniq).otherwise(r)
    if ((norm & 16) != 0) r = when(uniq > 1.0, r / (log(uniq + 1.0) / math.log(2.0))).otherwise(r)
    if ((norm & 32) != 0) r = r / (r + 1.0)
    r
  }

  /**
   * ts_rank over a MATERIALIZED tsvector: tf/dl/uniq come from the
   * entries themselves — tf = the term's position count, a
   * position-less entry counting 1 (tsrank.c POSNULL), dl = summed
   * position counts, uniq = entry count — then the same contribution
   * table and normalization bitmask as the text path, so
   * `ts_rank('cat:1,3 dog:2'::tsvector, q)` equals
   * `ts_rank('cat dog cat', q)` exactly.
   */
  def tsvRank(tsv: Column, query: String, norm: Int = 0): Column = {
    require((norm & ~(1 | 2 | 8 | 16 | 32)) == 0,
      s"unsupported ts_rank normalization bits in $norm")
    val terms = positiveLexemes(query)
    require(terms.nonEmpty, "tsRank needs a query with positive terms")
    val table = typedLit(FullText.rankTable)
    val raw = terms.map { t =>
      val e = get(filter(tsv, x => x.getField("lex") === t), lit(0))
      val tf = when(e.isNull, lit(0))
        .otherwise(greatest(size(e.getField("positions")), lit(1)))
      element_at(table, least(tf, lit(FullText.MaxNumPos)) + 1)
    }.reduce(_ + _)
    val dl = aggregate(tsv, lit(0),
      (acc, e) => acc + greatest(size(e.getField("positions")), lit(1)))
      .cast("double")
    rankNorm(raw, dl, size(tsv).cast("double"), norm)
  }

  // ---------------------------------------------------------------
  // indexed (GIN) path over lexemes — what PG actually indexes
  // ---------------------------------------------------------------

  /**
   * Lexeme postings: (term = stemmed lexeme, doc_id, positions =
   * PARSER positions, gaps preserved). This is what a GIN index over
   * `to_tsvector('english', text)` stores, so the whole
   * [[FullText.indexedMatch]] machinery — semi/anti equi-joins,
   * position-arithmetic phrase verify, DNF normalization, bucketed
   * partition pruning — works unchanged over it: normalize the query
   * with [[tsquery]], render it back with [[renderQuery]], and the
   * phrase gaps (including gaps across dropped stopwords) line up
   * with the stored parser positions.
   */
  def postings(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        explode(lexemes(col(textCol))).as("lp"))
      .groupBy(col("lp.lex").as("term"), col("doc_id"))
      .agg(sort_array(collect_list(col("lp.pos"))).as("positions"))

  /** [[postings]] + the same term-hash bucket column as
    * [[FullText.postingsBucketed]] (partitionBy("tbucket") persistence
    * → reader-level pruning per query term). */
  def postingsBucketed(docs: DataFrame, idCol: String, textCol: String,
      buckets: Int): DataFrame = {
    require(buckets >= 1, "postingsBucketed needs buckets >= 1")
    postings(docs, idCol, textCol).withColumn("tbucket",
      pmod(xxhash64(col("term")), lit(buckets.toLong)).cast("int"))
  }

  /** Render a (normalized) tsquery tree back to query syntax — the
    * round-trip feed for [[FullText.indexedMatch]] over lexeme
    * postings. Lexemes are `[a-z0-9]`-ish single tokens, so the
    * rendering re-parses to the identical tree. */
  def renderQuery(n: Node): String = n match {
    case Phrase(terms, gaps) =>
      terms.head + gaps.zip(terms.tail)
        .map { case (g, t) => s" <$g> $t" }.mkString
    case And(l, r) => s"(${renderQuery(l)}) & (${renderQuery(r)})"
    case Or(l, r)  => s"(${renderQuery(l)}) | (${renderQuery(r)})"
    case Not(c)    => s"!(${renderQuery(c)})"
  }

  /** Indexed stemmed match: normalize the surface query, serve it
    * from lexeme [[postings]] via [[FullText.indexedMatch]]. Same
    * answer as [[tsMatch]]'s corpus scan, sub-linear I/O. */
  def indexedMatch(post: DataFrame, query: String, buckets: Int = 0): DataFrame =
    FullText.indexedMatch(post, renderQuery(tsquery(query)), buckets)

  // ---------------------------------------------------------------
  // oracle-side mirrors (the rankTableSql device: ONE driver literal
  // shared verbatim with the DuckDB oracle)
  // ---------------------------------------------------------------

  /** `('a','about',…)` — the stop list as a SQL IN-list literal. */
  lazy val stopListSql: String =
    stopWords.toSeq.sorted.map(w => s"'$w'").mkString("(", ",", ")")

  /** The deterministic TESTDATA documents vocabulary (seed=42
    * generator; 31 words, stable across SFs). Used ONLY to build the
    * oracle's stem map — the engine side stems generally. */
  val corpusVocab: Seq[String] = Seq(
    "a", "agg", "batch", "big", "column", "customer", "data", "dup",
    "fast", "filter", "group", "hash", "join", "key", "line", "merge",
    "order", "part", "query", "row", "scan", "slow", "small", "sort",
    "spark", "stream", "table", "the", "value", "vector", "window")

  /** `CASE <v> WHEN 'customer' THEN 'custom' … ELSE <v> END` — the
    * corpus vocabulary→stem map, values computed by the SAME
    * [[Porter.stem]] the engine runs, so both engines share one
    * normalization verbatim. `v` is the SQL variable to map. */
  def stemCaseSql(v: String): String =
    s"CASE $v " +
      corpusVocab.map(w => s"WHEN '$w' THEN '${Porter.stem(w)}'").mkString(" ") +
      s" ELSE $v END"
}
