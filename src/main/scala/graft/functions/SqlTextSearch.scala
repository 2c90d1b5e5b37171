package graft.functions

import java.util.Locale

import org.apache.spark.sql.catalyst.expressions.{CreateArray, CreateNamedStruct, Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.UnaryExpression
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.operators.{FullText, HeadlineDefault, Lexize, Ltree, TsHeadlineExpr}
import graft.operators.FullText.{And, Node, Not, Or, Phrase}

/**
 * SQL-name registration for the text-search / ltree / crypt families —
 * the spelling an openGauss user actually writes (the reference's whole
 * user surface is SQL: src/test/regress/sql/tsearch.sql, ltree.sql,
 * crypt-blowfish.sql run `to_tsvector('english', t)`, `nlevel(p)`,
 * `crypt(pw, gen_salt('bf'))` as SQL text). The engine capability
 * already exists as Column/Expression kernels; this file binds the SQL
 * names through the FunctionRegistry.
 *
 * Design rules:
 *  - Query/config/option arguments must be STRING LITERALS: tsquery
 *    compilation happens at PLAN time (the engine compiles the query
 *    tree into codegen'd per-row matchers — there is no runtime query
 *    interpreter, by design: at 100 TB a per-row parse would dominate).
 *    PG enforces the same shape through its type system (tsquery
 *    literals/casts).
 *  - Builders hand the registry plain Catalyst trees: kernels that are
 *    native expressions pass through directly; Column-composed helpers
 *    convert eagerly via [[Bridge.toCatalyst]].
 *  - `gen_salt` is DETERMINISTIC (seeded): Spark retries tasks and
 *    re-evaluates expressions freely, so a random-per-call salt would
 *    produce rows that disagree between retries. The reference draws
 *    randomness server-side once per call; here the caller passes an
 *    explicit seed (default 0) and gets the reference's exact
 *    crypt-gensalt.cpp formats via SHA-256(seed) entropy.
 */
object SqlTextSearch {

  // ---------------------------------------------------------------
  // literal extraction (the registry hands us raw analyzed children)
  // ---------------------------------------------------------------

  private def litString(e: Expression, fn: String, what: String): String =
    e match {
      case Literal(s: UTF8String, StringType) if s != null => s.toString
      case other => throw new IllegalArgumentException(
        s"graft: $fn $what must be a string literal, got $other")
    }

  private def litInt(e: Expression, fn: String, what: String): Int = e match {
    case Literal(v: Number, _) => v.intValue
    case other => throw new IllegalArgumentException(
      s"graft: $fn $what must be an integer literal, got $other")
  }

  private def litLong(e: Expression, fn: String, what: String): Long =
    e match {
      case Literal(v: Number, _) => v.longValue
      case other => throw new IllegalArgumentException(
        s"graft: $fn $what must be an integer literal, got $other")
    }

  /** The supported text-search configs — the engine ships the english
    * chain (default parser -> english stopfile -> Porter stemmer), the
    * same chain the reference's regress battery runs. */
  private val Configs = Set("english", "default", "pg_catalog.english")

  /** Peel a to_tsvector wrapper: match/rank lexize internally. */
  private def unwrapTsv(e: Expression): Expression = e match {
    case TsVector(t) => t
    case other => other
  }

  private def isConfigLit(e: Expression): Boolean = e match {
    case Literal(s: UTF8String, StringType) if s != null =>
      Configs.contains(s.toString.toLowerCase(Locale.ROOT))
    case _ => false
  }

  private def checkConfig(e: Expression, fn: String): Unit = {
    val c = litString(e, fn, "config").toLowerCase(Locale.ROOT)
    require(Configs.contains(c),
      s"graft: $fn: unsupported text search configuration '$c' " +
        "(the engine ships the english chain)")
  }

  /** Drop an optional leading config literal: (cfg, rest*) -> rest*. */
  private def dropConfig(args: Seq[Expression], fn: String,
      bareArity: Int): Seq[Expression] =
    if (args.length == bareArity + 1) { checkConfig(args.head, fn); args.tail }
    else {
      require(args.length == bareArity,
        s"graft: $fn expects $bareArity args (plus an optional leading " +
          s"config), got ${args.length}")
      args
    }

  // ---------------------------------------------------------------
  // tsquery construction (plan-time; results are string literals in
  // the engine's normalized rendering, re-parseable by every consumer)
  // ---------------------------------------------------------------

  private def renderLit(n: Node): Expression =
    Literal(UTF8String.fromString(Lexize.renderQuery(n)), StringType)

  private def toTsquery(q: String): Node = Lexize.tsquery(q)

  private def plainToTsquery(q: String): Node = {
    val lex = q.toLowerCase(Locale.ROOT).split("\\s+")
      .filter(t => t.nonEmpty && !Lexize.isStop(t)).map(Porter.stem)
    require(lex.nonEmpty, s"graft: plainto_tsquery('$q') is all stop words")
    lex.map(t => Phrase(Seq(t), Seq.empty): Node).reduce(And(_, _))
  }

  // ---------------------------------------------------------------
  // ts_headline option-string parsing (prsd_headline's option list:
  // MaxWords, MinWords, ShortWord, MaxFragments, HighlightAll,
  // StartSel, StopSel, FragmentDelimiter; values optionally
  // double-quoted, "" escaping a quote)
  // ---------------------------------------------------------------

  private[functions] def parseHeadlineOptions(s: String): Map[String, String] = {
    val parts = scala.collection.mutable.ArrayBuffer[String]()
    val cur = new StringBuilder
    var inQ = false
    s.foreach { c =>
      if (c == '"') { inQ = !inQ; cur += c }
      else if (c == ',' && !inQ) { parts += cur.toString; cur.clear() }
      else cur += c
    }
    parts += cur.toString
    parts.iterator.map(_.trim).filter(_.nonEmpty).map { p =>
      val eq = p.indexOf('=')
      require(eq > 0, s"graft: ts_headline option '$p' is not K=V")
      val k = p.substring(0, eq).trim.toLowerCase(Locale.ROOT)
      var v = p.substring(eq + 1).trim
      if (v.length >= 2 && v.head == '"' && v.last == '"')
        v = v.substring(1, v.length - 1).replace("\"\"", "\"")
      k -> v
    }.toMap
  }

  private def optBool(v: String): Boolean =
    v.toLowerCase(Locale.ROOT) match {
      case "1" | "on" | "true" | "t" | "y" | "yes" => true
      case "0" | "off" | "false" | "f" | "n" | "no" => false
      case other => throw new IllegalArgumentException(
        s"graft: ts_headline boolean option value '$other'")
    }

  private def headlineExpr(text: Expression, query: String,
      options: Option[String]): Expression = {
    val o = options.map(parseHeadlineOptions).getOrElse(Map.empty)
    def i(k: String, d: Int): Int = o.get(k).map(_.toInt).getOrElse(d)
    val known = Set("maxwords", "minwords", "shortword", "maxfragments",
      "highlightall", "startsel", "stopsel", "fragmentdelimiter")
    o.keys.find(!known.contains(_)).foreach { k =>
      throw new IllegalArgumentException(
        s"graft: ts_headline: unrecognized option '$k'")
    }
    TsHeadlineExpr(text, query,
      maxWords = i("maxwords", 35), minWords = i("minwords", 15),
      shortWord = i("shortword", 3), maxFragments = i("maxfragments", 0),
      highlightAll = o.get("highlightall").exists(optBool),
      startSel = o.getOrElse("startsel", "<b>"),
      stopSel = o.getOrElse("stopsel", "</b>"),
      fragDelim = o.getOrElse("fragmentdelimiter", " ... "))
  }

  // ---------------------------------------------------------------
  // tsquery introspection
  // ---------------------------------------------------------------

  /** numnode: QueryItem count — each lexeme 1, each &/|/!/<-> 1. */
  private def numnode(n: Node): Int = n match {
    case Phrase(terms, _) => terms.size + (terms.size - 1)
    case And(l, r) => 1 + numnode(l) + numnode(r)
    case Or(l, r) => 1 + numnode(l) + numnode(r)
    case Not(c) => 1 + numnode(c)
  }

  /** querytree: the index-usable positive part (tsquery_util.c
    * clean_NOT): NOT arms drop; an AND keeps any usable side; an OR is
    * usable only if both sides are. Empty -> 'T'. */
  private def querytree(n: Node): Option[Node] = n match {
    case _: Phrase => Some(n)
    case Not(_) => None
    case And(l, r) => (querytree(l), querytree(r)) match {
      case (Some(a), Some(b)) => Some(And(a, b))
      case (Some(a), None) => Some(a)
      case (None, Some(b)) => Some(b)
      case _ => None
    }
    case Or(l, r) =>
      for { a <- querytree(l); b <- querytree(r) } yield Or(a, b)
  }

  // ---------------------------------------------------------------
  // the registry map
  // ---------------------------------------------------------------

  val all: Map[String, Seq[Expression] => Expression] = Map(
    // ---- tsvector construction + manipulation ----
    "to_tsvector" -> (args => {
      val a = dropConfig(args, "to_tsvector", 1)
      TsVector(a.head)
    }),
    "tsvector_to_array" -> (args =>
      Bridge.toCatalyst(Lexize.tsvectorToArray(Bridge.column(args.head)))),
    "tsvector_concat" -> (args => TsvConcat(args(0), args(1))),
    "tsvector_length" -> (args =>
      Bridge.toCatalyst(Lexize.tsvectorLength(Bridge.column(args.head)))),
    "ts_delete" -> (args =>
      Bridge.toCatalyst(Lexize.tsDelete(Bridge.column(args(0)),
        litString(args(1), "ts_delete", "lexeme")))),
    "strip" -> (args => {
      import org.apache.spark.sql.functions.{array, struct, transform}
      Bridge.toCatalyst(transform(Bridge.column(args.head), x =>
        struct(x.getField("lex").as("lex"),
          array().cast("array<int>").as("positions"))))
    }),
    "array_to_tsvector" -> (args => {
      import org.apache.spark.sql.functions.{array, array_distinct, array_sort, struct, transform}
      Bridge.toCatalyst(transform(
        array_sort(array_distinct(Bridge.column(args.head))), x =>
          struct(x.as("lex"), array().cast("array<int>").as("positions"))))
    }),

    // ---- tsquery construction (plan-time normalization) ----
    "to_tsquery" -> (args => {
      val a = dropConfig(args, "to_tsquery", 1)
      renderLit(toTsquery(litString(a.head, "to_tsquery", "query")))
    }),
    "plainto_tsquery" -> (args => {
      val a = dropConfig(args, "plainto_tsquery", 1)
      renderLit(plainToTsquery(litString(a.head, "plainto_tsquery", "text")))
    }),
    "phraseto_tsquery" -> (args => {
      val a = dropConfig(args, "phraseto_tsquery", 1)
      renderLit(Lexize.phraseQuery(
        litString(a.head, "phraseto_tsquery", "text")))
    }),
    "websearch_to_tsquery" -> (args => {
      val a = dropConfig(args, "websearch_to_tsquery", 1)
      renderLit(toTsquery(FullText.websearchQuery(
        litString(a.head, "websearch_to_tsquery", "text"))))
    }),
    // ---- the tsquery combination operators (tsquery_ops.cpp:
    // `q1 && q2`, `q1 || q2`, `!!q`): plan-time folds over the
    // normalized trees, rendered back to the literal form every
    // match/rank builder compiles ----
    "tsquery_and" -> (args => renderLit(And(
      toTsquery(litString(args(0), "tsquery_and", "query")),
      toTsquery(litString(args(1), "tsquery_and", "query"))))),
    "tsquery_or" -> (args => renderLit(Or(
      toTsquery(litString(args(0), "tsquery_or", "query")),
      toTsquery(litString(args(1), "tsquery_or", "query"))))),
    "tsquery_not" -> (args => renderLit(Not(
      toTsquery(litString(args.head, "tsquery_not", "query"))))),
    "numnode" -> (args =>
      Literal(numnode(toTsquery(litString(args.head, "numnode", "query"))),
        IntegerType)),
    "querytree" -> (args => {
      val t = querytree(toTsquery(litString(args.head, "querytree", "query")))
      Literal(UTF8String.fromString(
        t.map(Lexize.renderQuery).getOrElse("T")), StringType)
    }),

    // ---- match + rank (the @@ / ts_rank surface) ----
    // ts_match(text, 'query'): the `to_tsvector(t) @@ to_tsquery(q)`
    // spelling — english normalization on both sides, compiled to
    // per-row codegen'd matchers at plan time. When the caller
    // already wrote to_tsvector(t) (the PG idiom; the `@@` operator
    // rewrite hands it through verbatim) the wrapper is peeled so
    // lexization runs ONCE, on the raw text.
    "ts_match" -> (args => {
      val a = dropConfig(args, "ts_match", 2)
      val q = litString(a(1), "ts_match", "query")
      // a MATERIALIZED tsvector (parse_tsvector literal, or a stored
      // struct-array column) matches on its entries directly
      if (ParseTsVector.isTsv(a(0).dataType))
        Bridge.toCatalyst(Lexize.tsvMatch(Bridge.column(a(0)), q))
      else
        Bridge.toCatalyst(Lexize.tsMatch(Bridge.column(unwrapTsv(a(0))), q))
    }),
    "ts_rank" -> (args => {
      require(args.length == 2 || args.length == 3,
        s"graft: ts_rank expects (text, query[, normalization])")
      val norm = if (args.length == 3) litInt(args(2), "ts_rank", "norm") else 0
      val q = litString(args(1), "ts_rank", "query")
      if (ParseTsVector.isTsv(args(0).dataType))
        Bridge.toCatalyst(Lexize.tsvRank(Bridge.column(args(0)), q, norm))
      else
        Bridge.toCatalyst(FullText.tsRank(Bridge.column(unwrapTsv(args(0))),
          q, norm))
    }),
    "ts_rank_cd" -> (args =>
      Bridge.toCatalyst(FullText.tsRankCd(Bridge.column(unwrapTsv(args(0))),
        litString(args(1), "ts_rank_cd", "query")))),
    "ts_rank_weighted" -> (args =>
      Bridge.toCatalyst(FullText.tsRankWeighted(Bridge.column(args(0)),
        litString(args(1), "ts_rank_weighted", "query"),
        litInt(args(2), "ts_rank_weighted", "titleTokens")))),

    // ---- headline ----
    // ts_headline([cfg,] text, query[, options]) — 3 string args are
    // (cfg, text, query) only when the first is a known config literal
    // (PG disambiguates via the regconfig type).
    "ts_headline" -> (args => {
      val a =
        if (args.length >= 3 && isConfigLit(args.head)) {
          checkConfig(args.head, "ts_headline"); args.tail
        } else args
      require(a.length == 2 || a.length == 3,
        "graft: ts_headline expects ([config,] text, query[, options])")
      val opts =
        if (a.length == 3) Some(litString(a(2), "ts_headline", "options"))
        else None
      headlineExpr(a(0), litString(a(1), "ts_headline", "query"), opts)
    }),

    // ---- parser introspection (wparser.c SQL surface) ----
    "ts_parse" -> (args => {
      val p = litString(args(0), "ts_parse", "parser").toLowerCase(Locale.ROOT)
      require(p == "default" || p == "3722",
        s"graft: ts_parse: unknown parser '$p' (only 'default')")
      TsParseTokens(args(1))
    }),
    "ts_token_type" -> (args => {
      val p = litString(args(0), "ts_token_type", "parser")
        .toLowerCase(Locale.ROOT)
      require(p == "default" || p == "3722",
        s"graft: ts_token_type: unknown parser '$p' (only 'default')")
      CreateArray(TsDefaultParser.tokenTypes.map { case (id, alias, desc) =>
        CreateNamedStruct(Seq(
          Literal(UTF8String.fromString("tokid"), StringType), Literal(id),
          Literal(UTF8String.fromString("alias"), StringType),
          Literal(UTF8String.fromString(alias), StringType),
          Literal(UTF8String.fromString("description"), StringType),
          Literal(UTF8String.fromString(desc), StringType)))
      })
    }),
    "ts_lexize" -> (args =>
      TsLexizeExpr(args(1),
        litString(args(0), "ts_lexize", "dictionary"))),

    // ---- ltree (contrib/ltree SQL names) ----
    "nlevel" -> (args =>
      Bridge.toCatalyst(Ltree.nlevel(Bridge.column(args.head)))),
    "subltree" -> (args =>
      Bridge.toCatalyst(Ltree.subltree(Bridge.column(args(0)),
        litInt(args(1), "subltree", "start"),
        litInt(args(2), "subltree", "end")))),
    "subpath" -> (args => {
      require(args.length == 2 || args.length == 3,
        "graft: subpath expects (ltree, offset[, len])")
      val off = litInt(args(1), "subpath", "offset")
      val len = if (args.length == 3) litInt(args(2), "subpath", "len")
        else Int.MaxValue - off - 1 // to the end, like PG's 2-arg form
      Bridge.toCatalyst(Ltree.subpath(Bridge.column(args(0)), off, len))
    }),
    "ltree_index" -> (args =>
      Bridge.toCatalyst(Ltree.ltreeIndex(Bridge.column(args(0)),
        Bridge.column(args(1))))),
    "index" -> (args =>
      Bridge.toCatalyst(Ltree.ltreeIndex(Bridge.column(args(0)),
        Bridge.column(args(1))))),
    "ltree_isparent" -> (args =>
      Bridge.toCatalyst(Ltree.isAncestor(Bridge.column(args(0)),
        Bridge.column(args(1))))),
    "ltree_risparent" -> (args =>
      Bridge.toCatalyst(Ltree.isAncestor(Bridge.column(args(1)),
        Bridge.column(args(0))))),
    "lquery_match" -> (args =>
      Bridge.toCatalyst(Ltree.lqueryMatch(Bridge.column(args(0)),
        litString(args(1), "lquery_match", "lquery")))),
    "ltxt_match" -> (args =>
      Bridge.toCatalyst(Ltree.ltxtMatch(Bridge.column(args(0)),
        litString(args(1), "ltxt_match", "ltxtquery")))),
    "text2ltree" -> (args =>
      org.apache.spark.sql.catalyst.expressions.Cast(args.head, StringType)),
    "ltree2text" -> (args =>
      org.apache.spark.sql.catalyst.expressions.Cast(args.head, StringType)),
    // lca is an AGGREGATE here (any-arity variadic lca doesn't
    // distribute; the group-wise min/max-prefix form does).
    "lca" -> (args =>
      Bridge.toCatalyst(Ltree.lcaAgg(Bridge.column(args.head)))),

    // ---- fuzzystrmatch (PG SQL names; kernels reference-pinned in
    // PhoneticSpec incl. compiled-C fuzz parity) ----
    "metaphone" -> (args => MetaphoneExpr(args(0),
      litInt(args(1), "metaphone", "max_output_length"))),
    "dmetaphone" -> (args => DMetaphoneExpr(args.head, alt = false)),
    "dmetaphone_alt" -> (args => DMetaphoneExpr(args.head, alt = true)),
    "soundex" -> (args => PgSoundexExpr(args.head)),
    "difference" -> (args => SoundexDifferenceExpr(args(0), args(1))),
    // levenshtein(a,b) = unit costs (matches the builtin it replaces
    // for this arity); levenshtein(a,b,ins,del,sub) = PG's costed form
    "levenshtein" -> (args => {
      require(args.length == 2 || args.length == 5,
        "graft: levenshtein expects (a, b) or (a, b, ins, del, sub)")
      val (i, d, su) =
        if (args.length == 5) (litInt(args(2), "levenshtein", "ins"),
          litInt(args(3), "levenshtein", "del"),
          litInt(args(4), "levenshtein", "sub"))
        else (1, 1, 1)
      LevenshteinCostedExpr(args(0), args(1), i, d, su, maxD = -1)
    }),
    "levenshtein_less_equal" -> (args => {
      require(args.length == 3 || args.length == 6,
        "graft: levenshtein_less_equal expects (a, b, max_d) or " +
          "(a, b, ins, del, sub, max_d)")
      val (i, d, su, m) =
        if (args.length == 6) (litInt(args(2), "levenshtein_less_equal", "ins"),
          litInt(args(3), "levenshtein_less_equal", "del"),
          litInt(args(4), "levenshtein_less_equal", "sub"),
          litInt(args(5), "levenshtein_less_equal", "max_d"))
        else (1, 1, 1, litInt(args(2), "levenshtein_less_equal", "max_d"))
      LevenshteinCostedExpr(args(0), args(1), i, d, su, m)
    }),

    // ---- pgcrypto digest(data, type) → bytea (the hex builtins
    // wrapped back to binary, exactly PG's return type) ----
    "digest" -> (args => {
      import org.apache.spark.sql.catalyst.expressions.{Md5, Sha1, Sha2, Unhex}
      litString(args(1), "digest", "type").toLowerCase(Locale.ROOT) match {
        case "md5" => Unhex(Md5(args(0)))
        case "sha1" => Unhex(Sha1(args(0)))
        case "sha224" => Unhex(Sha2(args(0), Literal(224)))
        case "sha256" => Unhex(Sha2(args(0), Literal(256)))
        case "sha384" => Unhex(Sha2(args(0), Literal(384)))
        case "sha512" => Unhex(Sha2(args(0), Literal(512)))
        case other => throw new IllegalArgumentException(
          s"graft: digest: unknown algorithm '$other'")
      }
    }),

    // ---- pgcrypto crypt()/gen_salt() ----
    "crypt" -> (args => CryptExpression(args(0), args(1))),
    "gen_salt" -> (args => {
      require(args.nonEmpty && args.length <= 3,
        "graft: gen_salt expects (type[, rounds[, seed]])")
      val t = litString(args(0), "gen_salt", "type")
      val rounds = if (args.length >= 2) litInt(args(1), "gen_salt", "rounds")
        else 0
      val seed = if (args.length == 3) litLong(args(2), "gen_salt", "seed")
        else 0L
      Literal(UTF8String.fromString(
        PxCrypt.genSaltSeeded(t, rounds, seed)), StringType)
    })
  )
}

/**
 * ts_lexize(dict, token) — the per-dictionary single-token surface
 * (ts_utils.c ts_lexize; dict_simple.c simple_lexize, dict.c's stem
 * chain): 'english_stem' lowercases, drops stop words (empty array),
 * else returns the Porter stem; 'simple' lowercases unconditionally.
 */
case class TsLexizeExpr(child: Expression, dict: String)
    extends UnaryExpression {
  private val stemDict = dict.toLowerCase(Locale.ROOT) match {
    case "english_stem" => true
    case "simple" => false
    case other => throw new IllegalArgumentException(
      s"graft: ts_lexize: unknown dictionary '$other' " +
        "(english_stem, simple)")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "ts_lexize"

  def lexize(t: UTF8String): GenericArrayData = {
    val w = t.toLowerCase.toString
    if (stemDict) {
      if (Lexize.isStop(w)) new GenericArrayData(Array.empty[Any])
      else new GenericArrayData(
        Array[Any](UTF8String.fromString(Porter.stem(w))))
    } else new GenericArrayData(Array[Any](UTF8String.fromString(w)))
  }

  override def nullSafeEval(a: Any): Any = lexize(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("tsLexize", this, classOf[TsLexizeExpr].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.lexize($a);")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
