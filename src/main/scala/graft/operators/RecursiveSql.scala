package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * SQL-level recursive CTE surface (reference capability: WITH RECURSIVE,
 * src/common/backend/parser/gram.y:23981 — openGauss accepts both
 * `UNION ALL` and `UNION` recursion).
 *
 * Spark 4.1 parses recursive CTEs natively but only in `UNION ALL` form
 * (UNION_NOT_SUPPORTED_IN_RECURSIVE_CTE otherwise) — yet the UNION
 * (distinct) form is exactly the one graph queries need: on a cyclic
 * edge set a UNION ALL recursion re-derives the same rows forever,
 * while UNION's set semantics make the fixpoint finite. This object
 * closes that gap: the linear-recursion shape
 *
 *   WITH RECURSIVE name[(cols)] AS (base UNION step) [, more ctes] rest
 *
 * is rewritten onto [[Iterate.fixpoint]] with semi-naive (delta)
 * evaluation — each round runs `step` with `name` bound to only the
 * rows DISCOVERED last round, keeps the set-difference against the
 * accumulated result, and stops when a round adds nothing. Rounds are
 * lineage-truncated through reliable checkpoints like every other graft
 * fixpoint. Anything that doesn't match the shape (UNION ALL recursion,
 * non-recursive WITH, a first CTE that never references itself, plain
 * SQL) delegates to `spark.sql` untouched.
 *
 * Scoping: the recursive CTE materializes under a UNIQUIFIED temp-view
 * name and every self/downstream reference is rewritten to it, so a
 * pre-existing temp view with the CTE's name is shadowed for this query
 * only (standard CTE scoping) and survives intact. Trailing CTEs after
 * the recursive one become a plain `WITH` over that view. Both scanners
 * are comment- (`--`, `/* */`) and quote-aware (`'…''…'`, `"…"`,
 * backticks), so tokens inside literals or comments never corrupt the
 * split.
 *
 * Like the reference (and PostgreSQL), recursion must be LINEAR: a step
 * that references the CTE more than once is rejected with an error
 * (PostgreSQL: "recursive reference ... must not appear more than
 * once") rather than silently evaluated against the delta twice, which
 * would under-compute the fixpoint. Only the FIRST CTE in the list may
 * be the recursive one — same restriction documented for the reference's
 * common case; later self-referential CTEs fail in the native parser.
 */
object RecursiveSql {

  private final case class Parsed(name: String, cols: Option[Seq[String]],
      base: String, step: String, rest: String)

  private val viewSeq = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Run `query`, rewriting a UNION-distinct recursive CTE onto the
   *  fixpoint operator; all other SQL goes to the native parser. */
  def sql(spark: SparkSession, query: String, maxIter: Int = 100): DataFrame =
    parse(query) match {
      case None => spark.sql(query)
      case Some(p) =>
        val refs = countRefs(p.step, p.name)
        if (refs == 0) spark.sql(query) // not actually recursive — native
        else if (refs > 1) throw new IllegalArgumentException(
          s"recursive reference to query \"${p.name}\" must not appear " +
            "more than once (linear recursion only, as in PostgreSQL/openGauss)")
        else {
          // uniquified working view: a temp view named `name` outside
          // this query is shadowed, not clobbered
          val view = s"${p.name}__graft_rec_${viewSeq.incrementAndGet()}"
          val step = replaceIdent(p.step, p.name, view)
          val rest = {
            val r = replaceIdent(p.rest, p.name, view)
            // trailing CTEs in the WITH RECURSIVE list: the recursive
            // view is materialized, so they are a plain WITH
            if (r.startsWith(",")) "WITH " + r.drop(1) else r
          }
          val base0 = spark.sql(p.base).distinct()
          val base = p.cols.map(cs => base0.toDF(cs: _*)).getOrElse(base0)
          val outCols = base.columns.toSeq
          try {
            // state = accumulated rows; __fresh marks last round's delta
            // (the same marker shape as Iterate.hopDistances' frontier)
            val init = base.withColumn("__fresh", lit(true))
            val acc = Iterate.fixpoint(init, maxIter, s"WITH RECURSIVE ${p.name}") { st =>
              st.filter(col("__fresh")).drop("__fresh")
                .createOrReplaceTempView(view)
              val prev = st.drop("__fresh")
              val fresh = spark.sql(step).toDF(outCols: _*).except(prev)
              prev.withColumn("__fresh", lit(false))
                .unionByName(fresh.withColumn("__fresh", lit(true)))
            } { (_, next) => next.filter(col("__fresh")).count() }
            acc.drop("__fresh").createOrReplaceTempView(view)
            spark.sql(rest)
          } finally spark.catalog.dropTempView(view)
        }
    }

  private val Head =
    """(?is)^\s*WITH\s+RECURSIVE\s+([A-Za-z_][A-Za-z0-9_]*)\s*(\(([^)]*)\))?\s*AS\s*\(""".r

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

  private def parse(q: String): Option[Parsed] =
    Head.findPrefixMatchOf(q).flatMap { m =>
      val name = m.group(1)
      val cols = Option(m.group(3)).map(_.split(",").map(_.trim).toSeq)
      // scan the CTE body to its balanced closing paren, skipping
      // comments and quoted regions
      var depth = 1
      var i = m.end
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
      if (depth != 0) None
      else {
        val body = q.substring(m.end, i - 1)
        val rest = q.substring(i).trim
        splitTopUnion(body).collect {
          // UNION ALL recursion parses natively — delegate by no-match
          case (base, step, false) => Parsed(name, cols, base, step, rest)
        }
      }
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
          val isAll = trimmed.regionMatches(true, 0, "ALL", 0, 3) &&
            (trimmed.length == 3 || !trimmed(3).isLetterOrDigit)
          return Some((body.substring(0, i),
            if (isAll) trimmed.substring(3) else after, isAll))
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

  /** Count unqualified whole-word references to `ident` in code regions. */
  private[operators] def countRefs(s: String, ident: String): Int = {
    var n = 0; var i = 0
    while (i < s.length) {
      val skip = skipNonCode(s, i)
      if (skip >= 0) i = skip
      else if (wordAt(s, i, ident)) { n += 1; i += ident.length }
      else i += 1
    }
    n
  }

  /** Replace unqualified whole-word references to `ident` in code
   *  regions with `to` (literals/comments/quoted identifiers intact). */
  private[operators] def replaceIdent(s: String, ident: String, to: String): String = {
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
