package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import scala.collection.mutable

/**
 * SQL-level recursive CTE surface (reference capability: WITH RECURSIVE,
 * src/common/backend/parser/gram.y:23981 — openGauss accepts a CTE LIST
 * after WITH RECURSIVE, any member may be recursive, and recursion may
 * use `UNION ALL` or `UNION`).
 *
 * Spark 4.1 parses recursive CTEs natively but only in `UNION ALL` form
 * (UNION_NOT_SUPPORTED_IN_RECURSIVE_CTE otherwise) — yet the UNION
 * (distinct) form is exactly the one graph queries need: on a cyclic
 * edge set a UNION ALL recursion re-derives the same rows forever,
 * while UNION's set semantics make the fixpoint finite. This object
 * closes that gap for the full list shape
 *
 *   WITH RECURSIVE a AS (...), r(cols) AS (base UNION step), b AS (...)
 *   SELECT ...
 *
 * Each CTE is processed in order (PostgreSQL scoping: a CTE sees itself
 * and earlier CTEs only):
 *  - non-recursive members become lazy temp views;
 *  - `UNION ALL` self-recursive members are evaluated by the NATIVE
 *    recursive-CTE executor (a one-CTE sub-query) and registered;
 *  - `UNION` (distinct) self-recursive members are rewritten onto
 *    [[Iterate.fixpoint]] with semi-naive (delta) evaluation — each
 *    round runs `step` with the CTE name bound to only the rows
 *    DISCOVERED last round, keeps the set-difference against the
 *    accumulated result, and stops when a round adds nothing. Rounds
 *    are lineage-truncated through reliable checkpoints like every
 *    other graft fixpoint.
 * A query with no UNION-distinct recursion anywhere delegates to
 * `spark.sql` untouched, as does anything that doesn't parse as a
 * WITH RECURSIVE list.
 *
 * Scoping: every CTE materializes under a UNIQUIFIED temp-view name and
 * references are rewritten to it, so a pre-existing temp view with a
 * CTE's name is shadowed for this query only (standard CTE scoping) and
 * survives intact; all views drop in a finally. The scanners are
 * comment- (`--`, `/* */`) and quote-aware (`'…''…'`, `"…"`,
 * backticks), so tokens inside literals or comments never corrupt the
 * parse.
 *
 * Like the reference (and PostgreSQL), recursion must be LINEAR: a step
 * that references its CTE more than once is rejected (PostgreSQL:
 * "recursive reference ... must not appear more than once"), as is a
 * self-reference in the non-recursive term; mutual recursion is
 * impossible by construction (forward references never resolve).
 * References are counted POSITIONALLY (after FROM/JOIN/TABLE or a
 * FROM-list comma), so an alias or column that merely shares the CTE's
 * name — legal shadowing in PostgreSQL — is not mistaken for
 * recursion. `UNION DISTINCT` is accepted as the explicit spelling of
 * plain `UNION`.
 */
object RecursiveSql {

  private final case class Cte(name: String, cols: Option[Seq[String]], body: String)

  private val viewSeq = new java.util.concurrent.atomic.AtomicLong(0L)

  /** True iff `query` is a WITH RECURSIVE list with at least one
   *  UNION-distinct self-recursive member — the form Spark's native
   *  recursive-CTE executor rejects and [[sql]] rewrites onto the
   *  fixpoint. The statement router ([[graft.plans.PgStatements]])
   *  uses this to decide interception WITHOUT calling spark.sql (which
   *  would re-enter the injected parser). */
  private[graft] def needsFixpoint(query: String): Boolean =
    parseList(query).exists { case (ctes, _) =>
      ctes.exists(c => countRefs(c.body, c.name) > 0 &&
        splitTopUnion(c.body).exists(!_._3))
    }

  /** Run `query`, rewriting UNION-distinct recursive CTEs onto the
   *  fixpoint operator; all other SQL goes to the native parser. */
  def sql(spark: SparkSession, query: String, maxIter: Int = 100): DataFrame =
    parseList(query) match {
      case None => spark.sql(query)
      case Some((ctes, rest)) =>
        val needsRewrite = ctes.exists { c =>
          countRefs(c.body, c.name) > 0 &&
            splitTopUnion(c.body).exists(!_._3) // UNION distinct
        }
        if (!needsRewrite) spark.sql(query) // native covers the whole list
        else {
          val registered = mutable.ListBuffer.empty[String]
          var mapping = List.empty[(String, String)] // orig -> uniq, in order
          def rename(s: String): String =
            mapping.foldLeft(s) { case (acc, (o, u)) => replaceIdent(acc, o, u) }
          try {
            for (c <- ctes) {
              val uniq = s"${c.name}__graft_rec_${viewSeq.incrementAndGet()}"
              // earlier CTE names rebind to their views; self-references
              // stay on the original name (mapping excludes `c` itself)
              val body = rename(c.body)
              val selfRefs = countRefs(body, c.name)
              val df = splitTopUnion(body) match {
                case Some((base, step, false)) if selfRefs > 0 =>
                  fixpointCte(spark, c, base, step, uniq, maxIter)
                case _ if selfRefs > 0 =>
                  // UNION ALL (or non-UNION) self-recursion: the native
                  // executor handles it as a one-CTE sub-query
                  val colsSpec = c.cols.map(_.mkString("(", ", ", ")")).getOrElse("")
                  spark.sql(
                    s"WITH RECURSIVE ${c.name}$colsSpec AS ($body) SELECT * FROM ${c.name}")
                case _ =>
                  val d0 = spark.sql(body)
                  c.cols.map(cs => d0.toDF(cs: _*)).getOrElse(d0)
              }
              df.createOrReplaceTempView(uniq)
              registered += uniq
              mapping = mapping :+ (c.name -> uniq)
            }
            spark.sql(rename(rest))
          } finally registered.foreach { v =>
            try spark.catalog.dropTempView(v) catch { case _: Exception => }
          }
        }
    }

  /** Semi-naive fixpoint for one UNION-distinct recursive CTE. */
  private def fixpointCte(spark: SparkSession, c: Cte, base0Sql: String,
      step0Sql: String, uniq: String, maxIter: Int): DataFrame = {
    if (countRefs(base0Sql, c.name) > 0)
      throw new IllegalArgumentException(
        s"recursive reference to query \"${c.name}\" must not appear " +
          "within its non-recursive term")
    if (countRefs(step0Sql, c.name) > 1)
      throw new IllegalArgumentException(
        s"recursive reference to query \"${c.name}\" must not appear " +
          "more than once (linear recursion only, as in PostgreSQL/openGauss)")
    // the per-round delta view carries the uniquified name; rebind the
    // step's self-reference to it
    val step = replaceIdent(step0Sql, c.name, uniq)
    val base0 = spark.sql(base0Sql).distinct()
    val base = c.cols.map(cs => base0.toDF(cs: _*)).getOrElse(base0)
    val outCols = base.columns.toSeq
    // state = accumulated rows; __fresh marks last round's delta
    // (the same marker shape as Iterate.hopDistances' frontier)
    val init = base.withColumn("__fresh", lit(true))
    val acc = Iterate.fixpoint(init, maxIter, s"WITH RECURSIVE ${c.name}") { st =>
      st.filter(col("__fresh")).drop("__fresh")
        .createOrReplaceTempView(uniq)
      val prev = st.drop("__fresh")
      val fresh = spark.sql(step).toDF(outCols: _*).except(prev)
      prev.withColumn("__fresh", lit(false))
        .unionByName(fresh.withColumn("__fresh", lit(true)))
    } { (_, next) => next.filter(col("__fresh")).count() }
    acc.drop("__fresh")
  }

  private val ListHead = """(?is)^\s*WITH\s+RECURSIVE\s+""".r
  private val CteHead =
    """(?is)^([A-Za-z_][A-Za-z0-9_]*)\s*(\(([^)]*)\))?\s*AS\s*\(""".r

  /**
   * If position `i` in `s` starts a non-code region (comment, string
   * literal, quoted identifier), return the index just past it;
   * otherwise -1. `''` / `""` doubling and unterminated regions
   * (run to end-of-string) are handled.
   */
  private def skipNonCode(s: String, i: Int): Int = {
    def quoted(q: Char): Int = {
      var j = i + 1
      while (j < s.length) {
        if (s(j) == q) {
          if (j + 1 < s.length && s(j + 1) == q) j += 2 // doubled escape
          else return j + 1
        } else j += 1
      }
      s.length
    }
    if (s.startsWith("--", i)) {
      val j = s.indexOf('\n', i); if (j < 0) s.length else j + 1
    } else if (s.startsWith("/*", i)) {
      val j = s.indexOf("*/", i + 2); if (j < 0) s.length else j + 2
    } else if (s(i) == '\'' || s(i) == '"' || s(i) == '`') quoted(s(i))
    else -1
  }

  /** Index just past the paren that balances an already-open '(' at
   *  depth 1 starting from `start`; -1 if unbalanced. */
  private def scanBalanced(q: String, start: Int): Int = {
    var depth = 1
    var i = start
    while (i < q.length && depth > 0) {
      val skip = skipNonCode(q, i)
      if (skip >= 0) i = skip
      else {
        q(i) match {
          case '(' => depth += 1
          case ')' => depth -= 1
          case _ =>
        }
        i += 1
      }
    }
    if (depth == 0) i else -1
  }

  /** Skip whitespace and comments starting at `i`. */
  private def skipWs(q: String, i0: Int): Int = {
    var i = i0
    var moved = true
    while (moved) {
      moved = false
      while (i < q.length && q(i).isWhitespace) { i += 1; moved = true }
      if (i < q.length && (q.startsWith("--", i) || q.startsWith("/*", i))) {
        i = skipNonCode(q, i); moved = true
      }
    }
    i
  }

  /** Parse `WITH RECURSIVE cte[, cte]* rest` → (ctes, rest). */
  private def parseList(q: String): Option[(Seq[Cte], String)] =
    ListHead.findPrefixMatchOf(q).flatMap { pm =>
      val ctes = mutable.ListBuffer.empty[Cte]
      var pos = pm.end
      var bad = false
      var more = true
      while (more && !bad) {
        CteHead.findPrefixMatchOf(q.substring(pos)) match {
          case None => bad = true
          case Some(m) =>
            val bodyStart = pos + m.end
            val end = scanBalanced(q, bodyStart)
            if (end < 0) bad = true
            else {
              ctes += Cte(m.group(1),
                Option(m.group(3)).map(_.split(",").map(_.trim).toSeq),
                q.substring(bodyStart, end - 1))
              pos = skipWs(q, end)
              if (pos < q.length && q(pos) == ',') pos = skipWs(q, pos + 1)
              else more = false
            }
        }
      }
      if (bad || ctes.isEmpty) None else Some((ctes.toSeq, q.substring(pos)))
    }

  /** First top-level UNION in `body` → (base, step, isUnionAll). */
  private def splitTopUnion(body: String): Option[(String, String, Boolean)] = {
    var depth = 0
    var i = 0
    while (i < body.length) {
      val skip = skipNonCode(body, i)
      if (skip >= 0) i = skip
      else body(i) match {
        case '(' => depth += 1; i += 1
        case ')' => depth -= 1; i += 1
        case c if depth == 0 && (c == 'u' || c == 'U') &&
            body.regionMatches(true, i, "UNION", 0, 5) &&
            (i == 0 || (!body(i - 1).isLetterOrDigit && body(i - 1) != '_')) &&
            (i + 5 >= body.length || !body(i + 5).isLetterOrDigit) =>
          val after = body.substring(i + 5)
          val trimmed = after.dropWhile(_.isWhitespace)
          def kw(w: String): Boolean = trimmed.regionMatches(true, 0, w, 0, w.length) &&
            (trimmed.length == w.length || !trimmed(w.length).isLetterOrDigit)
          val isAll = kw("ALL")
          // UNION DISTINCT is PostgreSQL/openGauss-legal spelling of
          // plain UNION: consume the token or the step would begin
          // "DISTINCT SELECT ..." and fail to parse downstream
          val step =
            if (isAll) trimmed.substring(3)
            else if (kw("DISTINCT")) trimmed.substring(8)
            else after
          return Some((body.substring(0, i), step, isAll))
        case _ => i += 1
      }
    }
    None
  }

  /** True iff `s(i)` begins a whole-word, unqualified (not preceded by
   *  '.') occurrence of `ident`, outside non-code regions (caller
   *  guarantees the region property by scanning with [[skipNonCode]]). */
  private def wordAt(s: String, i: Int, ident: String): Boolean =
    s.regionMatches(true, i, ident, 0, ident.length) &&
      (i == 0 || (!s(i - 1).isLetterOrDigit && s(i - 1) != '_' && s(i - 1) != '.')) &&
      (i + ident.length >= s.length ||
        (!s(i + ident.length).isLetterOrDigit && s(i + ident.length) != '_'))

  /**
   * Count TABLE references to `ident`: whole-word occurrences standing
   * in table-reference POSITION — the previous significant token is
   * FROM, JOIN, or TABLE, or a comma while inside a FROM list. Mere
   * name sharing does not count (PostgreSQL scoping lets an alias or a
   * bare column shadow the CTE name: `SELECT x FROM t2 r` inside CTE r
   * is NOT a self-reference), and neither do qualifier uses `ident.col`
   * (their previous token is ON/=/AND/...) nor schema prefixes
   * `ident.tbl` (excluded by the trailing-dot check).
   *
   * State machine: `inFrom` tracks whether a depth-0 comma separates
   * FROM-list items (set by FROM, cleared by the clause keywords that
   * end a FROM list); parens push/pop it so a subquery's SELECT list
   * never sees the outer FROM state. ON/USING/join-type words do NOT
   * clear it — `FROM a JOIN b ON c.x = d.y, t2` keeps t2 a table ref.
   * A '(' in table position (after FROM/JOIN/comma-in-FROM) opens a
   * parenthesized join tree, not a scalar expression: `prev` is kept
   * so the first identifier inside still counts as a table reference
   * (`FROM (r JOIN e ON ...)` is legal PG), and the inside stays a
   * FROM list. A derived table `FROM (SELECT ...)` is unaffected —
   * its leading SELECT clears the state.
   */
  private[graft] def countRefs(s: String, ident: String): Int = {
    val endsFrom = Set("select", "where", "group", "having", "order",
      "limit", "offset", "window", "union", "intersect", "except", "qualify",
      "values")
    var n = 0; var i = 0
    var inFrom = false
    var stack = List.empty[Boolean]
    var prev = ""
    def wordChar(c: Char) = c.isLetterOrDigit || c == '_'
    while (i < s.length) {
      val skip = skipNonCode(s, i)
      if (skip >= 0) i = skip
      else {
        val c = s(i)
        if (wordChar(c)) {
          var j = i
          while (j < s.length && wordChar(s(j))) j += 1
          val word = s.substring(i, j).toLowerCase
          val tablePos = prev == "from" || prev == "join" || prev == "table" ||
            (prev == "," && inFrom)
          if (tablePos && wordAt(s, i, ident) && j - i == ident.length &&
              !(j < s.length && s(j) == '.')) n += 1
          if (word == "from") inFrom = true
          else if (endsFrom(word)) inFrom = false
          prev = word
          i = j
        } else {
          var keepPrev = false
          if (c == '(') {
            val tablePos = prev == "from" || prev == "join" ||
              prev == "table" || (prev == "," && inFrom)
            stack = inFrom :: stack
            // paren'd join tree: still a FROM list inside, and the
            // first identifier is still in table position
            inFrom = tablePos
            keepPrev = tablePos
          } else if (c == ')') stack match {
            case h :: t => inFrom = h; stack = t
            case Nil => inFrom = false
          }
          if (!c.isWhitespace && !keepPrev) prev = c.toString
          i += 1
        }
      }
    }
    n
  }

  /** Replace unqualified whole-word references to `ident` in code
   *  regions with `to` (literals/comments/quoted identifiers intact).
   *  Unlike [[countRefs]] this is position-BLIND: it also rewrites an
   *  alias or bare column that happens to share `ident`'s name — a
   *  query that shadows an EARLIER CTE's name with a local alias and
   *  needs the rewrite path is the one documented unsupported corner
   *  (quote the alias to disambiguate). */
  private[graft] def replaceIdent(s: String, ident: String, to: String): String = {
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val skip = skipNonCode(s, i)
      if (skip >= 0) { sb.append(s.substring(i, skip)); i = skip }
      else if (wordAt(s, i, ident)) { sb.append(to); i += ident.length }
      else { sb.append(s(i)); i += 1 }
    }
    sb.toString
  }
}
