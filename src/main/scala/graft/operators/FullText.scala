package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Full-text boolean/phrase retrieval — the batch analogue of the
 * reference's `tsvector @@ tsquery` match operator
 * (src/common/backend/utils/adt/tsvector_op.cpp: TS_execute over a
 * tsquery tree; phrase `<->` distance via tsCheckTypePhrase).
 *
 * Query language (tsquery subset): terms combined with `&` (AND),
 * `|` (OR), `!` (NOT), parentheses, `<->` (phrase: adjacent tokens in
 * order) and `<N>` (FOLLOWED BY at token distance exactly N; `<->` ≡
 * `<1>`). Example: `(spark <2> key | dup) & !slow`.
 *
 * Scale shape: the QUERY is tiny and parsed once on the driver; the
 * compiled result is a pure boolean Column over the document text —
 * `locate` on the space-padded lowercased text (token membership and
 * token adjacency are both exact substring tests against
 * ' '+join(tokens,' ')+' ', which for space-tokenized text is the
 * text itself). Everything stays inside whole-stage codegen: no
 * explode, no HOF lambdas, no shuffle — a 100 TB match is a map-only
 * scan that composes with pushdown and partition pruning.
 *
 * Determinism: substring containment is exact — the gate mirrors it
 * in SQL as `position(' t ' IN ' '||lower(text)||' ') > 0`.
 */
object FullText {

  /** tsquery AST. */
  sealed trait Node
  /** 1 term = membership; ≥2 terms = positional chain where term j sits
    * exactly `gaps(j-1)` tokens after term j−1 (`<->` ≡ gap 1,
    * `<N>` ≡ gap N — PG's FOLLOWED BY with distance). */
  final case class Phrase(terms: Seq[String], gaps: Seq[Int]) extends Node
  final case class And(l: Node, r: Node) extends Node
  final case class Or(l: Node, r: Node) extends Node
  final case class Not(c: Node) extends Node

  /** Parse a tsquery-subset string. Precedence: ! > <->/<N> > & > |. */
  def parseQuery(q: String): Node = {
    val toks = lex(q)
    val p = new Parser(toks)
    val n = p.parseOr()
    require(p.atEnd, s"trailing input in tsquery at token ${p.pos}: '$q'")
    n
  }

  private def lex(q: String): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < q.length) {
      val c = q.charAt(i)
      if (c.isWhitespace) i += 1
      else if ("&|!()".indexOf(c) >= 0) { out += c.toString; i += 1 }
      else if (c == '<') {
        val end = q.indexOf('>', i)
        require(end > i, s"unterminated '<' operator in tsquery")
        val body = q.substring(i + 1, end)
        require(body == "-" || body.forall(_.isDigit) && body.nonEmpty,
          s"bad followed-by operator '<$body>' in tsquery")
        out += s"<$body>"
        i = end + 1
      }
      else {
        val start = i
        while (i < q.length && !q.charAt(i).isWhitespace &&
          "&|!()<".indexOf(q.charAt(i)) < 0) i += 1
        require(i > start, s"unexpected character '${q.charAt(i)}' in tsquery")
        out += q.substring(start, i).toLowerCase
      }
    }
    out.toArray
  }

  private final class Parser(ts: Array[String]) {
    var pos = 0
    def atEnd: Boolean = pos >= ts.length
    private def peek: String = if (atEnd) "" else ts(pos)
    private def expect(t: String): Unit = {
      require(peek == t, s"expected '$t' at token $pos, found '$peek'")
      pos += 1
    }
    def parseOr(): Node = {
      var n = parseAnd()
      while (peek == "|") { pos += 1; n = Or(n, parseAnd()) }
      n
    }
    private def parseAnd(): Node = {
      var n = parseNot()
      while (peek == "&") { pos += 1; n = And(n, parseNot()) }
      n
    }
    private def parseNot(): Node =
      if (peek == "!") { pos += 1; Not(parseNot()) } else parsePrimary()
    private def parsePrimary(): Node =
      if (peek == "(") { pos += 1; val n = parseOr(); expect(")"); n }
      else parsePhrase()
    private def parsePhrase(): Node = {
      val terms = scala.collection.mutable.ArrayBuffer(term())
      val gaps = scala.collection.mutable.ArrayBuffer.empty[Int]
      while (peek.startsWith("<") && peek.endsWith(">")) {
        val body = peek.substring(1, peek.length - 1)
        val gap = if (body == "-") 1 else body.toInt
        require(gap >= 1, s"followed-by distance must be >= 1, got <$body>")
        pos += 1
        gaps += gap
        terms += term()
      }
      Phrase(terms.toSeq, gaps.toSeq)
    }
    private def term(): String = {
      val t = peek
      require(t.nonEmpty && "&|!()".indexOf(t) < 0 && !t.startsWith("<"),
        s"expected a term at token $pos, found '$t'")
      if (t.contains(":"))
        require(t.length > 2 && t.endsWith(":*") && t.indexOf(':') == t.length - 2,
          s"bad term '$t' in tsquery (':' is only valid as a trailing ':*' " +
            "prefix marker)")
      pos += 1
      t
    }
  }

  /** ' ' + lower(text) + ' ' — the padded form both atoms probe. */
  private def padded(text: Column): Column =
    concat(lit(" "), lower(text), lit(" "))

  /** Split a query term into (stem-of-term, isPrefix): `spar:*` →
    * ("spar", true) — tsquery's prefix-match marker (tsquery.c). */
  private[graft] def splitPrefix(t: String): (String, Boolean) =
    if (t.endsWith(":*")) {
      val p = t.dropRight(2)
      require(p.nonEmpty && !p.contains(":"), s"bad prefix term '$t' in tsquery")
      (p, true)
    } else {
      require(!t.contains(":"), s"bad term '$t' in tsquery")
      (t, false)
    }

  private def compile(n: Node, pad: Column, raw: Column): Column = n match {
    case Phrase(Seq(t), _) if t.endsWith(":*") =>
      // single prefix atom: boundary space on the LEFT only — ` spar`
      // hits every token starting 'spar'
      locate(" " + splitPrefix(t)._1, pad) > 0
    case Phrase(terms, gaps) if terms.exists(_.endsWith(":*")) =>
      // phrase with prefix slots: position arithmetic with per-slot
      // startsWith comparison, one compiled token scan per row
      val split = terms.map(splitPrefix)
      org.apache.spark.sql.graft.Bridge.column(
        graft.functions.PhraseGapMatch(
          org.apache.spark.sql.graft.Bridge.expression(raw),
          split.map(_._1), gaps, split.map(_._2)))
    case Phrase(terms, gaps) if gaps.forall(_ == 1) =>
      // token membership / adjacency == substring match on the padded
      // joined-token string (text itself, for space-tokenized docs)
      locate(" " + terms.mkString(" ") + " ", pad) > 0
    case Phrase(terms, gaps) =>
      // general <N> distances need position arithmetic — one compiled
      // token scan per row (PhraseGapMatch), not a substring probe
      org.apache.spark.sql.graft.Bridge.column(
        graft.functions.PhraseGapMatch(
          org.apache.spark.sql.graft.Bridge.expression(raw), terms, gaps))
    case And(l, r) => compile(l, pad, raw) && compile(r, pad, raw)
    case Or(l, r) => compile(l, pad, raw) || compile(r, pad, raw)
    case Not(c) => !compile(c, pad, raw)
  }

  /** Boolean match Column for `query` over raw document text. */
  def tsMatch(text: Column, query: String): Column =
    compile(parseQuery(query), padded(text), text)

  /** plainto_tsquery analogue: free text → AND of its tokens
    * (`"fast spark join"` → `"fast & spark & join"`). */
  def plainQuery(text: String): String = {
    val toks = text.toLowerCase.split("\\s+").filter(_.nonEmpty)
    require(toks.nonEmpty, "plainQuery needs at least one token")
    toks.mkString(" & ")
  }

  /** One ts_debug row: token type alias/description, the raw token,
    * the dictionary that consumed it (None = no mapping), and the
    * produced lexemes (empty = stopword). */
  final case class DebugRow(alias: String, description: String,
    token: String, dictionary: Option[String], lexemes: Option[Seq[String]])

  /**
   * ts_debug('english', text) (ref: ts_parse.cpp's prsd pipeline +
   * tsearch regress): every parser token with its type metadata and
   * the english lexize chain's verdict — the introspection surface for
   * debugging configurations.
   */
  def tsDebug(text: String): Seq[DebugRow] =
    graft.functions.TsDefaultParser.parse(text).map { case (t, tok) =>
      HeadlineDefault.englishDebugLexize(t, tok) match {
        case None => DebugRow(graft.functions.TsDefaultParser.alias(t),
          graft.functions.TsDefaultParser.description(t), tok, None, None)
        case Some((dict, lex)) =>
          DebugRow(graft.functions.TsDefaultParser.alias(t),
            graft.functions.TsDefaultParser.description(t), tok,
            Some(dict), Some(lex))
      }
    }

  /**
   * plainto_tsquery('english', text) (ref: src/common/backend/utils/adt/
   * to_tsany.c plainto_tsquery): run the DEFAULT parser over the text,
   * lexize each token through the english configuration (stop list +
   * Porter for word types, simple for numeric/url/file types), and AND
   * the surviving lexemes — 'the and z 1))& fghj' compiles to
   * 'z & 1 & fghj'. Returns the tsquery-subset string [[parseQuery]]
   * accepts (empty when nothing survives — callers must guard, like
   * PG's empty-tsquery NOTICE path).
   */
  def plaintoTsquery(text: String): String =
    graft.functions.TsDefaultParser.parse(text)
      .flatMap { case (t, tok) => HeadlineDefault.englishLexize(t, tok) }
      .mkString(" & ")

  /**
   * ts_headline analogue (ref: src/common/backend/tsearch/wparser.cpp
   * ts_headline; the default single-fragment mode): a snippet of
   * `window` tokens either side of the FIRST occurrence of any of the
   * query's positive terms. PG picks a best cover; first-hit is the
   * deterministic simplification — document order, no scoring state —
   * and keeps the whole thing a map-only codegen expression
   * (array_position / slice / array_join — no HOF, no shuffle).
   * Returns NULL when no positive term occurs.
   */
  def headline(text: Column, query: String, window: Int = 2): Column = {
    require(window >= 0, "window must be >= 0")
    val terms = positiveTerms(query)
    require(terms.nonEmpty, "headline needs a query with positive terms")
    val toks = split(lower(text), " ")
    // 1-based first position per term (array_position = 0 if absent →
    // NULL via nullif); least() skips NULLs in both engines' min logic,
    // but coalesce-to-sentinel is explicit and engine-agnostic
    val firstPos = terms.map(t =>
      coalesce(nullif(array_position(toks, lit(t)), lit(0L)),
        lit(Long.MaxValue)))
      .reduce((a, b) => least(a, b))
    val start = greatest(firstPos - window, lit(1L))
    when(firstPos =!= Long.MaxValue,
      array_join(slice(toks, start.cast("int"),
        (firstPos - start + 1 + window).cast("int")), " "))
  }

  /**
   * ts_rank analogue (ref: src/common/backend/utils/adt/tsrank.cpp
   * calc_rank_or + the RANK_NORM_* bitmask): positional-frequency
   * rank. PG's per-term contribution under uniform position weights
   * (to_tsvector without setweight labels every position D = 0.1) is
   *   w·(Σ_{j=1..tf} 1/j²) / (π²/6)
   * — calc_rank_or's (wjm + resj − wjm/1²)/1.64493406685 with wjm = w
   * and jm = 0, summed over the query's positive terms. PG stores at
   * most 256 positions per lexeme (MAXNUMPOS), so tf saturates there.
   *
   * The per-tf contribution is PRECOMPUTED on the driver into a
   * 257-entry literal table shared verbatim with the SQL oracle
   * ([[rankTableSql]]) — both engines look up identical doubles, so
   * the only floating arithmetic either side performs is the fixed-
   * order sum over terms plus the normalization divisions: hash-exact
   * at 6dp with no cross-engine transcendental risk in the core rank.
   *
   * `norm` is PG's normalization bitmask (applied in PG's order):
   *   1  rank /= 1+log₂... — PG: rank /= log₂(dl+1)
   *   2  rank /= dl
   *   8  rank /= n_unique_tokens
   *   16 rank /= log₂(n_unique+1)
   *   32 rank /= rank+1
   * (4 — extent distance — is ts_rank_cd's; not meaningful here.)
   *
   * Scale shape: map-only codegen scan, same as [[tsMatch]].
   */
  def tsRank(text: Column, query: String, norm: Int = 0): Column = {
    require((norm & ~(1 | 2 | 8 | 16 | 32)) == 0,
      s"unsupported ts_rank normalization bits in $norm")
    val terms = positiveTerms(query)
    require(terms.nonEmpty, "tsRank needs a query with positive terms")
    val toks = split(lower(text), " ")
    val table = typedLit(rankTable)
    val raw = terms.map { t =>
      val tf = size(filter(toks, x => x === lit(t)))
      element_at(table, least(tf, lit(MaxNumPos)) + 1)
    }.reduce(_ + _)
    val dl = size(toks).cast("double")
    val uniq = size(array_distinct(toks)).cast("double")
    var r = raw
    if ((norm & 1) != 0) r = when(dl > 1.0, r / (log(dl + 1.0) / math.log(2.0))).otherwise(r)
    if ((norm & 2) != 0) r = when(dl > 0.0, r / dl).otherwise(r)
    if ((norm & 8) != 0) r = when(uniq > 0.0, r / uniq).otherwise(r)
    if ((norm & 16) != 0) r = when(uniq > 1.0, r / (log(uniq + 1.0) / math.log(2.0))).otherwise(r)
    if ((norm & 32) != 0) r = r / (r + 1.0)
    r
  }

  /**
   * ts_rank_cd analogue (tsrank.cpp calc_rank_cd + Cover): proximity
   * ranking by minimal covers — windows spanning ALL the query's
   * positive terms, each contributing 0.1/(1 + noise words) under
   * uniform D weights. The cover walk runs in one compiled scan per
   * row ([[graft.functions.CoverDensity]]) accumulating exact integer
   * nanos, so the rank is order-invariant and oracle-mirrorable
   * bit-for-bit. Documents missing any positive term rank 0 (no
   * cover exists), exactly PG's behavior for AND queries.
   *
   * CONJUNCTIVE/PHRASE QUERIES ONLY: PG's calc_rank_cd satisfies
   * covers via TS_execute over the query tree, so an OR query can
   * cover with a single arm; this cover walk requires ALL positive
   * terms. Rather than silently rank OR-only matches 0, `|` queries
   * are rejected — use [[tsRank]] for disjunctive ranking.
   */
  def tsRankCd(text: Column, query: String): Column = {
    def noOr(n: Node): Boolean = n match {
      case _: Phrase => true
      case And(l, r) => noOr(l) && noOr(r)
      case Not(c) => noOr(c)
      case Or(_, _) => false
    }
    require(noOr(parseQuery(query)),
      "tsRankCd requires a conjunctive/phrase query (no '|'): covers " +
        "must span ALL positive terms; use tsRank for OR queries")
    val terms = positiveTerms(query)
    require(terms.nonEmpty, "tsRankCd needs a query with positive terms")
    org.apache.spark.sql.graft.Bridge.column(
      graft.functions.CoverDensity(
        org.apache.spark.sql.graft.Bridge.expression(text), terms))
      .cast("double") / lit(1.0e9)
  }

  /**
   * ts_rank with POSITION WEIGHTS — the setweight surface (tsrank.cpp
   * calc_rank_or with non-uniform wpos; to_tsany.c setweight): PG
   * labels tsvector positions A/B/C/D and ranks with weights
   * {1.0, 0.4, 0.2, 0.1}. Zone model here: the first `titleTokens`
   * tokens carry weight A (1.0), the rest D (0.1) — how a
   * `setweight(to_tsvector(title),'A') || to_tsvector(body)` document
   * maps onto flat text.
   *
   * Faithful calc_rank_or per term over occurrences j = 1..tf in
   * document order:
   *   resj = Σ_j wpos_j / j²
   *   wjm  = first STRICT maximum of wpos_j (so: the first A-zone
   *          occurrence if any, else the first occurrence), jm = its j
   *   contribution = (wjm + resj − wjm/jm²) / 1.64493406685
   * Every occurrence term wpos_j/j² quantizes to integer NANOS
   * (round(w·1e9/j²) — a .5 boundary first occurs at j = 32 for
   * weight A: 1e9/1024 = 976562.5; both Java's Math.round and
   * DuckDB's round() round positive halves UP, which is the actual
   * cross-engine invariant), so per-term sums are exact longs and
   * the only live doubles are the final fixed-order divisions — the
   * same oracle-sharing discipline as [[tsRank]]'s table.
   *
   * Map-only HOF arithmetic (same class as BM25's tf counters); no
   * shuffle, no explode.
   */
  def tsRankWeighted(text: Column, query: String, titleTokens: Int = 3): Column = {
    require(titleTokens >= 0, "titleTokens must be >= 0")
    val terms = positiveTerms(query)
    require(terms.nonEmpty, "tsRankWeighted needs a query with positive terms")
    // one compiled scan computes every term's contribution (the HOF
    // formulation this replaces cost 1.5 s at sf0.1 — see the
    // expression's scaladoc); deterministic → CSE keeps one evaluation
    val arr = org.apache.spark.sql.graft.Bridge.column(
      graft.functions.WeightedRankNanos(
        org.apache.spark.sql.graft.Bridge.expression(text), terms, titleTokens))
    terms.indices.map(i => element_at(arr, i + 1).cast("double") /
        lit(1.0e9) / lit(1.64493406685))
      .reduce(_ + _)
  }

  /** PG stores at most 256 positions per lexeme (MAXNUMPOS). */
  val MaxNumPos = 256

  /** rankTable(n) = 0.1·H₂(n)/1.64493406685 for n = 0..256 — the
    * calc_rank_or per-term contribution at tf = n under uniform D
    * weights (1.64493406685 is tsrank.cpp's π²/6 literal). */
  lazy val rankTable: Array[Double] = {
    val t = new Array[Double](MaxNumPos + 1)
    var h = 0.0
    var j = 1
    while (j <= MaxNumPos) {
      h += 1.0 / (j.toDouble * j.toDouble)
      t(j) = 0.1 * h / 1.64493406685
      j += 1
    }
    t
  }

  /** The same table as a DuckDB list literal (shortest-roundtrip digit
    * strings parse back to the identical doubles), for SQL oracles. */
  lazy val rankTableSql: String =
    rankTable.map(_.toString).mkString("[", ", ", "]")

  /**
   * websearch_to_tsquery analogue (ref: to_tsany.c
   * websearch_to_tsquery): free-form web-search syntax → tsquery
   * string for [[tsMatch]]/[[tsRank]]. Double-quoted runs become
   * `<->` phrases, a leading `-` negates its token/phrase, the word
   * OR (case-insensitive, unquoted) joins the surrounding atoms with
   * `|`, everything else joins with `&`.
   */
  def websearchQuery(s: String): String = {
    final case class Atom(text: String, neg: Boolean)
    val atoms = scala.collection.mutable.ArrayBuffer.empty[(Atom, Boolean)] // (atom, orWithPrev)
    var orPending = false
    var i = 0
    def push(a: Atom): Unit = { atoms += ((a, orPending)); orPending = false }
    while (i < s.length) {
      val c = s.charAt(i)
      if (c.isWhitespace) i += 1
      else {
        var neg = false
        if (c == '-') { neg = true; i += 1 }
        if (i < s.length && s.charAt(i) == '"') {
          val end = s.indexOf('"', i + 1)
          val body = if (end < 0) s.substring(i + 1) else s.substring(i + 1, end)
          i = if (end < 0) s.length else end + 1
          val toks = body.toLowerCase.split("\\s+").filter(_.nonEmpty)
          if (toks.nonEmpty) push(Atom(toks.mkString(" <-> "), neg))
        } else {
          val start = i
          while (i < s.length && !s.charAt(i).isWhitespace && s.charAt(i) != '"') i += 1
          val w = s.substring(start, i).toLowerCase
          if (w == "or") { if (atoms.nonEmpty) orPending = true }
          else if (w.nonEmpty) push(Atom(w, neg))
        }
      }
    }
    require(atoms.nonEmpty, "websearchQuery needs at least one token")
    def render(a: Atom): String = {
      val base = if (a.text.contains(" ")) s"(${a.text})" else a.text
      if (a.neg) s"!$base" else base
    }
    // The rendered string re-parses with `|` as the LOWEST-precedence
    // operator, so `a b OR c d` yields (a&b)|(c&d) — & binds the
    // &-chains on each side of every OR, exactly PG's
    // websearch_to_tsquery grouping. Parens are only needed around
    // phrase groups (added in render).
    val sb = new StringBuilder(render(atoms.head._1))
    atoms.tail.foreach { case (a, or) =>
      sb.append(if (or) " | " else " & ").append(render(a))
    }
    sb.toString
  }

  /**
   * Inverted postings with positions — the GIN index shape (ref: PG
   * builds tsvector GIN entries per lexeme with position lists; the
   * batch analogue is one (term, doc_id, positions) row per pair).
   * Built ONCE per corpus, persisted like any table; queries then
   * touch only the postings rows of their own terms.
   */
  def postings(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        posexplode(split(lower(col(textCol)), " ")).as(Seq("pos", "term")))
      .groupBy(col("term"), col("doc_id"))
      .agg(sort_array(collect_list(col("pos") + 1)).as("positions"))

  /**
   * [[postings]] plus a term-hash bucket column for PARTITIONED
   * persistence: `write.partitionBy("tbucket")` and pass the same
   * `buckets` to [[indexedMatch]]/[[indexedMatchMany]] — every term
   * lookup then carries `tbucket = xxhash64(term) mod buckets` as an
   * integer LITERAL (driver-evaluated via [[termBucket]], the same
   * Catalyst xxhash64 the column uses), so the parquet reader PRUNES
   * to the query terms' partitions. That is the GIN I/O shape at
   * 100 TB: a selective query reads its own posting lists, not the
   * index.
   */
  def postingsBucketed(docs: DataFrame, idCol: String, textCol: String,
      buckets: Int): DataFrame = {
    require(buckets >= 1, "postingsBucketed needs buckets >= 1")
    postings(docs, idCol, textCol).withColumn("tbucket",
      pmod(xxhash64(col("term")), lit(buckets.toLong)).cast("int"))
  }

  /** Driver-side twin of the `tbucket` column: the SAME Catalyst
    * XxHash64 (seed 42) the write side computes, evaluated on a
    * literal — guaranteed to agree with `pmod(xxhash64(term), b)`. */
  def termBucket(t: String, buckets: Int): Int = {
    import org.apache.spark.sql.catalyst.expressions.{Literal, XxHash64}
    val h = new XxHash64(Seq(Literal(t)))
      .eval(null).asInstanceOf[Long]
    (((h % buckets) + buckets) % buckets).toInt
  }

  /**
   * INDEXED tsquery match over [[postings]] — the sub-linear path for
   * SELECTIVE queries at 100 TB, where [[tsMatch]]'s map-only corpus
   * scan is the wrong plan: drive the match from the query's terms.
   * Each term is one equi-lookup on the postings table (partition/
   * bucket by term and the scan prunes to the query's terms); AND
   * arms semi-join, OR arms union-distinct, `NOT` anti-joins FROM its
   * positive sibling, and phrases verify by position arithmetic over
   * the joined position lists (exists p ∈ pos₀: ∀j p+off_j ∈ pos_j) —
   * no document text is ever touched.
   *
   * The tree is first normalized to DNF with negation pushed to the
   * leaves (¬¬a = a, ¬(a∧b) = ¬a∨¬b, ¬(a∨b) = ¬a∧¬b), so shapes like
   * `a & (b | !c)` — an Or holding a Not under an And arm — serve
   * fine: (a∧b) ∨ (a∧¬c), each conjunct a semi-join chain with
   * anti-joins for its negatives. A conjunct with NO positive literal
   * (a pure-negative arm, e.g. `!a` or `a | !b`) throws, exactly as a
   * GIN index cannot serve it — use [[tsMatch]]'s scan. Queries are
   * tiny driver-side trees, so the DNF expansion is negligible.
   * Returns the matching doc_id set (one row per doc).
   *
   * Pass the `buckets` the postings were [[postingsBucketed]] with to
   * add the partition-pruning `tbucket` literal to every term lookup
   * (0 = unbucketed postings, no pruning filter).
   *
   * Plan shape: queries WITHOUT prefix terms evaluate through the
   * [[indexedMatchMany]] one-pass kernel (the query's term literals
   * broadcast against a SINGLE postings scan) — the per-term
   * semi/anti-join chain re-evaluated the whole `post` plan once per
   * term per DNF arm, which for inline postings (built from the corpus
   * in the same query) re-ran the corpus explode+groupBy up to 7×
   * (measured on fts_indexed_retrieve's 4-term query). Prefix terms
   * (`p:*`) join postings on a term RANGE, which the exact-equality
   * broadcast kernel cannot express — they keep the join chain.
   */
  def indexedMatch(post: DataFrame, query: String, buckets: Int = 0): DataFrame = {
    val conjuncts = toDnf(parseQuery(query))
    conjuncts.foreach { case (pos, _) =>
      if (pos.isEmpty) throw new IllegalArgumentException(
        "graft: a pure-negative DNF arm cannot use the postings index; " +
          "use tsMatch")
    }
    val anyPrefix = conjuncts.exists { case (pos, neg) =>
      (pos ++ neg).exists(_.terms.exists(_.endsWith(":*")))
    }
    if (!anyPrefix)
      matchManyDnf(post, Seq(0L -> conjuncts), buckets).select(col("doc_id"))
    else conjuncts.map { case (pos, neg) =>
      val base = pos.map(evalPhrase(post, _, buckets))
        .reduce((a, b) => a.join(b, Seq("doc_id"), "left_semi"))
      neg.foldLeft(base)((acc, p) =>
        acc.join(evalPhrase(post, p, buckets), Seq("doc_id"), "left_anti"))
    }.reduce(_ union _).distinct()
  }

  /** DNF: list of (positive phrases, negated phrases) conjuncts. */
  private def toDnf(n: Node): Seq[(Seq[Phrase], Seq[Phrase])] = n match {
    case p: Phrase => Seq((Seq(p), Nil))
    case Or(l, r) => toDnf(l) ++ toDnf(r)
    case And(l, r) =>
      for ((lp, ln) <- toDnf(l); (rp, rn) <- toDnf(r))
        yield (lp ++ rp, ln ++ rn)
    case Not(c) => c match {
      case p: Phrase => Seq((Nil, Seq(p)))
      case And(l, r) => toDnf(Or(Not(l), Not(r)))
      case Or(l, r) => toDnf(And(Not(l), Not(r)))
      case Not(inner) => toDnf(inner)
    }
  }

  /** One term's postings rows, with the partition-pruning bucket
    * literal when the postings are bucketed. */
  private def termRows(post: DataFrame, t: String, buckets: Int): DataFrame = {
    val (p, pre) = splitPrefix(t)
    if (pre) {
      // tsquery `p:*` — GIN's partial match walks the term RANGE
      // [p, p+ε); a hash-bucketed layout cannot prune a range, so the
      // lookup filters term-startsWith across buckets (a first-letter
      // layout prunes — see postingsPrefixParted/indexedPrefix).
      // A doc may hold SEVERAL terms under the prefix: union their
      // position lists so phrase arithmetic sees every occurrence.
      val base = if (post.columns.contains("tletter"))
        post.filter(col("tletter") === p.substring(0, 1))
      else post
      base.filter(startswith(col("term"), lit(p)))
        .groupBy(col("doc_id"))
        .agg(sort_array(flatten(collect_list(col("positions"))))
          .as("positions"))
    } else {
      val base = if (buckets > 0)
        post.filter(col("tbucket") === lit(termBucket(p, buckets)))
      else post
      base.filter(col("term") === lit(p))
    }
  }

  /** One phrase literal against the postings: per-term equi-lookups +
    * position-arithmetic verify (no document text touched). */
  private def evalPhrase(post: DataFrame, ph: Phrase, buckets: Int): DataFrame =
    ph match {
      case Phrase(Seq(t), _) =>
        termRows(post, t, buckets).select(col("doc_id"))
      case Phrase(terms, gaps) =>
        val offs = gaps.scanLeft(0)(_ + _)
        val joined = terms.zipWithIndex.map { case (t, i) =>
          termRows(post, t, buckets)
            .select(col("doc_id"), col("positions").as(s"p_$i"))
        }.reduce((a, b) => a.join(b, "doc_id"))
        val ok = exists(col("p_0"), p =>
          terms.indices.drop(1).map(j =>
            array_contains(col(s"p_$j"), p + offs(j))).reduce(_ && _))
        joined.filter(ok).select(col("doc_id"))
    }

  /** One row per (query term, DNF conjunct, literal, phrase slot) of a
    * parsed query batch — the broadcast side of [[indexedMatchMany]]. */
  final case class QueryLit(term: String, qid: Long, cid: Int, lid: Int,
      slot: Int, offs: Seq[Int], nslots: Int, neg: Boolean)
  /** Positive-literal count per DNF conjunct. */
  final case class ConjMeta(qid: Long, cid: Int, npos: Int)

  /**
   * BATCH indexed tsquery match — the serving shape: a query TABLE
   * evaluated in ONE postings pass. [[indexedMatch]] issues per-term
   * lookups for one query; with many queries that re-scans the index
   * per query. Here the union of every query's term literals (a tiny
   * driver-parsed table: one row per term-slot of each DNF literal)
   * BROADCASTS against a single postings scan; matching then
   * aggregates bounded per-(query, conjunct, literal, doc) state:
   *
   *   1. postings ⋈ broadcast(literals) on term — the one corpus-index
   *      pass, bounded by the queries' term hits;
   *   2. per-(qid, cid, lid, doc): phrase verify — all slots present +
   *      position arithmetic over the slot→positions map (single-term
   *      literals skip the walk);
   *   3. per-(qid, cid, doc): conjunct satisfied iff every positive
   *      literal matched and no negated literal did;
   *   4. distinct (qid, doc_id) across conjuncts (DNF union).
   *
   * Same DNF normalization and pure-negative-arm rule as
   * [[indexedMatch]]. Output: (qid, doc_id).
   */
  def indexedMatchMany(post: DataFrame, queries: Seq[(Long, String)],
      buckets: Int = 0): DataFrame = {
    require(queries.nonEmpty, "indexedMatchMany needs at least one query")
    queries.foreach { case (qid, q) =>
      toDnf(parseQuery(q)).foreach { case (pos, neg) =>
        if (pos.isEmpty) throw new IllegalArgumentException(
          s"graft: pure-negative DNF arm in query $qid cannot use the " +
            "postings index; use tsMatch")
        (pos ++ neg).foreach(_.terms.foreach(t => require(!t.endsWith(":*"),
          s"graft: prefix term '$t' in query $qid — the batch path " +
            "joins postings on exact term equality; use indexedMatch")))
      }
    }
    matchManyDnf(post,
      queries.map { case (qid, q) => qid -> toDnf(parseQuery(q)) }, buckets)
  }

  /** The one-postings-pass match kernel shared by [[indexedMatch]] and
    * [[indexedMatchMany]]: pre-normalized DNF conjuncts per qid, no
    * prefix terms. Output: distinct (qid, doc_id). */
  private def matchManyDnf(post: DataFrame,
      queries: Seq[(Long, Seq[(Seq[Phrase], Seq[Phrase])])],
      buckets: Int): DataFrame = {
    val spark = post.sparkSession
    import spark.implicits._
    val lits = Seq.newBuilder[QueryLit]
    val metas = Seq.newBuilder[ConjMeta]
    for ((qid, dnf) <- queries) {
      dnf.zipWithIndex.foreach { case ((pos, neg), cid) =>
        metas += ConjMeta(qid, cid, pos.length)
        (pos.map((_, false)) ++ neg.map((_, true))).zipWithIndex.foreach {
          case ((Phrase(terms, gaps), isNeg), lid) =>
            val offs = gaps.scanLeft(0)(_ + _)
            terms.zipWithIndex.foreach { case (t, slot) =>
              lits += QueryLit(t, qid, cid, lid, slot, offs, terms.length, isNeg)
            }
        }
      }
    }
    val litRows = lits.result()
    val pruned = if (buckets > 0)
      post.filter(col("tbucket").isin(
        litRows.map(l => termBucket(l.term, buckets)).distinct
          .map(Integer.valueOf): _*))
    else post
    // 1: the single postings pass
    val hits = pruned.join(broadcast(litRows.toDF()), "term")
    // 2: literal-level phrase verify over the slot→positions map; the
    // state per group is ≤ nslots position lists (query-sized, bounded)
    val perLit = hits
      .groupBy(col("qid"), col("cid"), col("lid"), col("doc_id"))
      .agg(map_from_entries(collect_list(struct(col("slot"), col("positions"))))
          .as("m"),
        first(col("offs")).as("offs"), first(col("nslots")).as("nslots"),
        first(col("neg")).as("neg"))
      .filter(size(col("m")) === col("nslots") &&
        (col("nslots") === 1 ||
          exists(element_at(col("m"), lit(0)), p =>
            forall(sequence(lit(1), col("nslots") - 1), j =>
              array_contains(element_at(col("m"), j),
                p + element_at(col("offs"), j + 1))))))
    // 3: conjunct satisfaction — every positive literal, no negative
    val perConj = perLit
      .groupBy(col("qid"), col("cid"), col("doc_id"))
      .agg(sum(when(!col("neg"), 1L).otherwise(0L)).as("npos_hit"),
        sum(when(col("neg"), 1L).otherwise(0L)).as("nneg_hit"))
      .join(broadcast(metas.result().toDF()), Seq("qid", "cid"))
      .filter(col("npos_hit") === col("npos") && col("nneg_hit") === 0L)
    // 4: DNF union
    perConj.select(col("qid"), col("doc_id")).distinct()
  }

  /** The query's POSITIVE terms (everything not under a NOT) — the
    * term set BM25 ranking should score after a boolean filter. */
  def positiveTerms(query: String): Seq[String] = {
    def walk(n: Node, neg: Boolean): Seq[String] = n match {
      case Phrase(ts, _) => if (neg) Nil else ts
      case And(l, r) => walk(l, neg) ++ walk(r, neg)
      case Or(l, r) => walk(l, neg) ++ walk(r, neg)
      case Not(c) => walk(c, !neg)
    }
    val ts = walk(parseQuery(query), neg = false).distinct
    require(ts.forall(!_.endsWith(":*")),
      "graft: prefix terms (t:*) are match-only — ranking/headline/bm25 " +
        "need exact lexemes (PG computes tf per lexeme, not per prefix)")
    ts
  }

  // -----------------------------------------------------------------
  // prefix matching — tsquery `term:*` (reference: tsquery.c prefix
  // flag; tsvector_op.cpp tsvector_match_vq prefix compare;
  // tsginidx.c serves it as a GIN partial-match term range scan)
  // -----------------------------------------------------------------

  /** `prefix:*` over raw tokens: true iff some token STARTS WITH
    * `prefix`. Compiles to a padded substring probe with a leading
    * boundary space only (` quer` hits `query`, `queries`, …) — the
    * same map-only codegen shape as [[tsMatch]]'s atoms. */
  def prefixMatch(text: Column, prefix: String): Column = {
    val p = prefix.toLowerCase.trim
    require(p.nonEmpty && !p.contains(" "), s"bad tsquery prefix '$prefix'")
    locate(" " + p, padded(text)) > 0
  }

  /**
   * [[postings]] + a leading-character partition column for PREFIX
   * lookups: hash buckets ([[postingsBucketed]]) cannot prune a term
   * RANGE, so the prefix layout partitions by the term's first
   * character instead — `tletter` — and [[indexedPrefix]] carries the
   * prefix's first letter as a partition literal. That is GIN's
   * partial-match shape: a prefix query walks the term range
   * `[p, p+ε)`, here the range lives inside one letter partition.
   */
  def postingsPrefixParted(docs: DataFrame, idCol: String,
      textCol: String): DataFrame =
    postings(docs, idCol, textCol)
      .withColumn("tletter", substring(col("term"), 1, 1))

  /** Indexed `prefix:*`: term-range lookup on [[postingsPrefixParted]]
    * (reader prunes to the first-letter partition), distinct doc set.
    * Same answer as [[prefixMatch]]'s scan. */
  def indexedPrefix(post: DataFrame, prefix: String): DataFrame = {
    val p = prefix.toLowerCase.trim
    require(p.nonEmpty && !p.contains(" "), s"bad tsquery prefix '$prefix'")
    val pruned =
      if (post.columns.contains("tletter"))
        post.filter(col("tletter") === p.substring(0, 1))
      else post
    pruned.filter(startswith(col("term"), lit(p)))
      .select(col("doc_id")).distinct()
  }

  // ------------------------------------------------------- ts_rewrite

  /**
   * ts_rewrite(query, target, substitute) — every occurrence of
   * `target` inside `query` becomes `substitute` (reference:
   * tsquery_rewrite.c findsubquery over QTNTernary'd/QTNSort'ed
   * trees). Like PG, matching is modulo AND/OR commutativity,
   * associativity, and duplicate collapse: both trees canonicalize to
   * sorted n-ary groups, and a same-operator target whose children
   * form a SUBSET of a group rewrites just that subset ('a & b & c'
   * with target 'a & b' → 'new & c'). Phrases are atomic units
   * (matched by equality). Applied to fixpoint with a bound, so a
   * substitute that re-contains its target can't loop. DEPARTURE:
   * the rewritten tree renders in canonical child order, not PG's
   * insertion order — same boolean semantics.
   */
  def tsRewrite(query: String, target: String, substitute: String): Node = {
    val t = canon(parseQuery(target))
    val s = canon(parseQuery(substitute))
    var cur = canon(parseQuery(query))
    var iter = 0
    var changed = true
    while (changed && iter < 16) {
      val next = rewriteOnce(cur, t, s)
      changed = next != cur
      cur = next
      iter += 1
    }
    unCanon(cur)
  }

  /** tsRewrite straight to tsquery text (the form ts_rewrite returns). */
  def tsRewriteText(query: String, target: String, substitute: String): String =
    render(tsRewrite(query, target, substitute))

  private def render(n: Node): String = n match {
    case Phrase(terms, gaps) =>
      terms.head + gaps.zip(terms.tail).map { case (g, t) =>
        if (g == 1) s" <-> $t" else s" <$g> $t" }.mkString
    case And(l, r) => s"(${render(l)}) & (${render(r)})"
    case Or(l, r)  => s"(${render(l)}) | (${render(r)})"
    case Not(c)    => s"!(${render(c)})"
  }

  // canonical n-ary sorted form (QTNTernary + QTNSort + uniq)
  private sealed trait C
  private final case class CLeaf(p: Phrase) extends C
  private final case class CNeg(c: C) extends C
  private final case class CGrp(isAnd: Boolean, ch: List[C]) extends C

  private def key(c: C): String = c match {
    case CLeaf(p) => "L" + render(p)
    case CNeg(x) => "N(" + key(x) + ")"
    case CGrp(a, ch) => (if (a) "A[" else "O[") + ch.map(key).mkString(",") + "]"
  }

  private def grp(isAnd: Boolean, ch: List[C]): C = {
    val flat = ch.flatMap {
      case CGrp(a, inner) if a == isAnd => inner
      case other => List(other)
    }
    val sorted = flat.distinct.sortBy(key)
    if (sorted.size == 1) sorted.head else CGrp(isAnd, sorted)
  }

  private def canon(n: Node): C = n match {
    case p: Phrase => CLeaf(p)
    case And(l, r) => grp(isAnd = true, List(canon(l), canon(r)))
    case Or(l, r) => grp(isAnd = false, List(canon(l), canon(r)))
    case Not(c) => CNeg(canon(c))
  }

  private def unCanon(c: C): Node = c match {
    case CLeaf(p) => p
    case CNeg(x) => Not(unCanon(x))
    case CGrp(a, ch) =>
      ch.map(unCanon).reduceLeft((l, r) => if (a) And(l, r) else Or(l, r))
  }

  /** Remove each element of `sub` once from `from` (set semantics —
    * canonical groups are already dupe-collapsed). */
  private def minus(from: List[C], sub: List[C]): List[C] =
    from.filterNot(sub.contains)

  private def rewriteOnce(c: C, t: C, s: C): C = {
    if (c == t) return s
    c match {
      case CGrp(op, ch) =>
        val kids = ch.map(rewriteOnce(_, t, s))
        val g = grp(op, kids)
        (g, t) match {
          case (CGrp(gop, gch), CGrp(top, tch))
              if gop == top && tch.forall(gch.contains) =>
            grp(gop, minus(gch, tch) :+ s)
          case _ => g
        }
      case CNeg(x) => CNeg(rewriteOnce(x, t, s))
      case leaf => leaf
    }
  }
}
