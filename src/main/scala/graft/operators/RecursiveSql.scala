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
 * closes that gap: the single-CTE linear-recursion shape
 *
 *   WITH RECURSIVE name[(cols)] AS (base UNION step) rest
 *
 * is rewritten onto [[Iterate.fixpoint]] with semi-naive (delta)
 * evaluation — each round runs `step` with `name` bound to only the
 * rows DISCOVERED last round, keeps the set-difference against the
 * accumulated result, and stops when a round adds nothing. Rounds are
 * lineage-truncated through reliable checkpoints like every other graft
 * fixpoint. Anything that doesn't match the shape (UNION ALL recursion,
 * non-recursive WITH, plain SQL) delegates to `spark.sql` untouched.
 *
 * Like the reference (and PostgreSQL), recursion is LINEAR: the step's
 * self-reference is evaluated against the working delta, so a step that
 * mentions `name` twice gets delta for both mentions.
 */
object RecursiveSql {

  private final case class Parsed(name: String, cols: Option[Seq[String]],
      base: String, step: String, rest: String)

  /** Run `query`, rewriting a UNION-distinct recursive CTE onto the
   *  fixpoint operator; all other SQL goes to the native parser. */
  def sql(spark: SparkSession, query: String, maxIter: Int = 100): DataFrame =
    parse(query) match {
      case None => spark.sql(query)
      case Some(p) =>
        val base0 = spark.sql(p.base).distinct()
        val base = p.cols.map(cs => base0.toDF(cs: _*)).getOrElse(base0)
        val outCols = base.columns.toSeq
        // state = accumulated rows; __fresh marks last round's delta
        // (the same marker shape as Iterate.hopDistances' frontier)
        val init = base.withColumn("__fresh", lit(true))
        val acc = Iterate.fixpoint(init, maxIter, s"WITH RECURSIVE ${p.name}") { st =>
          st.filter(col("__fresh")).drop("__fresh")
            .createOrReplaceTempView(p.name)
          val prev = st.drop("__fresh")
          val fresh = spark.sql(p.step).toDF(outCols: _*).except(prev)
          prev.withColumn("__fresh", lit(false))
            .unionByName(fresh.withColumn("__fresh", lit(true)))
        } { (_, next) => next.filter(col("__fresh")).count() }
        acc.drop("__fresh").createOrReplaceTempView(p.name)
        val out = spark.sql(p.rest)
        spark.catalog.dropTempView(p.name)
        out
    }

  private val Head =
    """(?is)^\s*WITH\s+RECURSIVE\s+([A-Za-z_][A-Za-z0-9_]*)\s*(\(([^)]*)\))?\s*AS\s*\(""".r

  private def parse(q: String): Option[Parsed] =
    Head.findPrefixMatchOf(q).flatMap { m =>
      val name = m.group(1)
      val cols = Option(m.group(3)).map(_.split(",").map(_.trim).toSeq)
      // scan the CTE body to its balanced closing paren (string-literal
      // aware, so a ')' inside quotes doesn't end the body)
      var depth = 1
      var i = m.end
      while (i < q.length && depth > 0) {
        q(i) match {
          case '(' => depth += 1
          case ')' => depth -= 1
          case '\'' =>
            i += 1
            while (i < q.length && q(i) != '\'') i += 1
          case _ =>
        }
        i += 1
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
      body(i) match {
        case '(' => depth += 1; i += 1
        case ')' => depth -= 1; i += 1
        case '\'' =>
          i += 1
          while (i < body.length && body(i) != '\'') i += 1
          i += 1
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
}
