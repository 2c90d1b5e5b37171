package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Hierarchical label paths — the contrib/ltree surface re-expressed as
 * pure codegen'd Column ops over dot-separated label strings.
 *
 * Reference: /root/reference/contrib/ltree/ltree_op.cpp (nlevel,
 * subltree/subpath, index, @> ancestor, lca — lca_inner:377 caps the
 * common prefix at numlevel-1 of EVERY input, i.e. the result is a
 * strictly-proper ancestor), lquery_op.cpp (`~` pattern match with
 * `*{n,m}` level wildcards and `a|b` alternation).
 *
 * Representation: a path is a STRING of '.'-joined labels
 * (`[A-Za-z0-9_]+`), exactly ltree's text form. Every per-row op below
 * compiles to split/slice/locate expressions that stay inside
 * whole-stage codegen — no UDFs.
 *
 * Scale design: the interesting op at 100 TB is the ancestor JOIN
 * ("all rows under any of these subtrees"). ltree serves it with a
 * GiST index; a LIKE-prefix theta join would be O(n·m). [[ancestorJoin]]
 * instead EXPLODES each row's ≤depth ancestor prefixes (depth is tiny
 * and bounded — here 4, rarely >16 in real taxonomies) and equi-joins
 * on the prefix, so the plan is a plain shuffled/broadcast hash join on
 * a string key: fully parallel, skew-safe under AQE, no theta join.
 */
object Ltree {
  private val DOT = "\\."

  /** Number of labels — ltree nlevel(). */
  def nlevel(p: Column): Column = size(split(p, DOT))

  /** ltree subpath(ltree, offset, len) — 0-based offset like PG. */
  def subpath(p: Column, offset: Int, len: Int): Column =
    array_join(slice(split(p, DOT), offset + 1, len), ".")

  /** ltree subltree(ltree, start, end) — labels [start, end), 0-based. */
  def subltree(p: Column, start: Int, end: Int): Column =
    subpath(p, start, end - start)

  // locate() in functions._ takes a literal substring only; the
  // registry form accepts a Column needle.
  private def locate_dyn(needle: Column, hay: Column): Column =
    call_function("locate", needle, hay)

  /** ltree index(a, b): 0-based label position of subpath b in a, -1 if
    * absent. Label-boundary-safe via '.'-delimited containment: wrap
    * both in dots, locate, then count the dots before the match. */
  def ltreeIndex(a: Column, b: Column): Column = {
    val a2 = concat(lit("."), a, lit("."))
    val b2 = concat(lit("."), b, lit("."))
    val pos = locate_dyn(b2, a2)
    // chars of a2 strictly before the match start: the leading '.' plus
    // each complete earlier label and its separator — so the prefix
    // holds exactly as many dots as complete labels, and that count IS
    // the 0-based index (PG docs: index('0.1.2.3.5.4.5.6.8.5.6.8',
    // '5.6') = 6).
    val prefix = substring(a2, lit(1), pos - 1)
    val dots = length(prefix) - length(regexp_replace(prefix, DOT, ""))
    when(pos === 0, lit(-1)).otherwise(dots)
  }

  /** ltree @> : a is an ancestor of b, or equal (ltree_op.cpp inner_isparent). */
  def isAncestor(a: Column, b: Column): Column =
    (b === a) || b.startsWith(concat(a, lit(".")))

  /**
   * Compile an lquery to a Java/RE2-free anchored regex over the text
   * form. Supported grammar (lquery_op.cpp subset): '.'-separated
   * atoms, each either a label, an `a|b|c` alternation, `!a`
   * (negation, single-label), `*` (any number of labels), or `*{n,m}` /
   * `*{n}` / `*{n,}` bounded level wildcards.
   */
  def lqueryRegex(lquery: String): String = {
    val L = "[A-Za-z0-9_]+"
    // one label possibly carrying trailing modifier flags
    // (lquery_op.cpp: `@` case-insensitive, `*` prefix, `%`
    // underscore-word match; flags compose)
    def label(a0: String): String = {
      var a = a0; var ci = false; var pre = false; var word = false
      var done = false
      while (!done && a.nonEmpty) a.last match {
        case '@' => ci = true; a = a.init
        case '*' => pre = true; a = a.init
        case '%' => word = true; a = a.init
        case _ => done = true
      }
      require(a.matches(L), s"bad lquery atom: $a0")
      val q = java.util.regex.Pattern.quote(a)
      val core =
        if (word) s"(?:[A-Za-z0-9]+_)*$q(?:_[A-Za-z0-9]+)*"
        else if (pre) s"$q[A-Za-z0-9_]*"
        else q
      if (ci) s"(?i:$core)" else core
    }
    val atoms = lquery.split("\\.", -1).map(_.trim)
    val parts = atoms.map {
      case "*" => s"(?:$L\\.)*"
      case a if a.startsWith("*{") && a.endsWith("}") =>
        val body = a.substring(2, a.length - 1)
        val (lo, hi) = body.split(",", -1) match {
          case Array(n) => (n.trim.toInt, n.trim.toInt)
          case Array(n, "") => (n.trim.toInt, -1)
          case Array(n, m) => (n.trim.toInt, m.trim.toInt)
          case _ => throw new IllegalArgumentException(s"bad lquery atom: $a")
        }
        if (hi < 0) s"(?:$L\\.){$lo,}"
        else s"(?:$L\\.){$lo,$hi}"
      case a if a.startsWith("!") =>
        s"(?!${label(a.substring(1))}\\.)$L\\."
      case a if a.contains("|") =>
        val alts = a.split("\\|").map(label).mkString("|")
        s"(?:$alts)\\."
      case a => label(a) + "\\."
    }
    // match against path + trailing '.' so every atom consumes "label."
    "^" + parts.mkString + "$"
  }

  /** ltree ~ lquery. */
  def lqueryMatch(p: Column, lquery: String): Column =
    concat(p, lit(".")).rlike(lqueryRegex(lquery))

  /**
   * Group-wise lca via the min/max trick: any common label-prefix of
   * the lexicographic min and max path is common to ALL paths in the
   * group, so LCP(group) = LCP(min, max); PG then caps the result at
   * nlevel-1 of every input (lca_inner:377 `numlevel - 1`), i.e. at
   * min(nlevel)-1 over the group. One aggregate pass — three scalar
   * aggregates (min, max, min(nlevel)) and a closed-form prefix
   * computation; no per-group list materialization.
   */
  def lcaAgg(p: Column): Column = {
    val mn = split(min(p), DOT)
    val mx = split(max(p), DOT)
    val cap = min(nlevel(p)) - 1
    val k0 = size(filter(
      sequence(lit(1), least(size(mn), size(mx))),
      i => slice(mn, lit(1), i) === slice(mx, lit(1), i)))
    val k = least(k0, cap)
    array_join(slice(mn, lit(1), k), ".")
  }

  /**
   * ltxtquery `@` match (ltxtquery_op.cpp): boolean word search over
   * the LABELS of a path — an atom matches if ANY label equals it,
   * composed with `&`, `|`, `!` and parentheses ('!' binds tightest,
   * then '&', then '|'). Compiles to array_contains over the split
   * labels — pure codegen, no regex.
   */
  def ltxtMatch(p: Column, q: String): Column = {
    sealed trait N
    case class Atom(w: String) extends N
    case class Not(n: N) extends N
    case class And(l: N, r: N) extends N
    case class Or(l: N, r: N) extends N
    val toks = q.replace("(", " ( ").replace(")", " ) ")
      .replace("&", " & ").replace("|", " | ").replace("!", " ! ")
      .trim.split("\\s+").filter(_.nonEmpty).toList
    // recursive descent: or := and ('|' and)*; and := un ('&' un)*;
    // un := '!' un | '(' or ')' | word
    var rest = toks
    def parseOr(): N = {
      var n = parseAnd()
      while (rest.headOption.contains("|")) { rest = rest.tail; n = Or(n, parseAnd()) }
      n
    }
    def parseAnd(): N = {
      var n = parseUn()
      while (rest.headOption.contains("&")) { rest = rest.tail; n = And(n, parseUn()) }
      n
    }
    def parseUn(): N = rest match {
      case "!" :: t => rest = t; Not(parseUn())
      case "(" :: t =>
        rest = t; val n = parseOr()
        require(rest.headOption.contains(")"), s"graft: unbalanced ltxtquery: $q")
        rest = rest.tail; n
      case w :: t =>
        require(w.matches("[A-Za-z0-9_]+"), s"graft: bad ltxtquery atom: $w")
        rest = t; Atom(w)
      case Nil => throw new IllegalArgumentException(s"graft: empty ltxtquery: $q")
    }
    val tree = parseOr()
    require(rest.isEmpty, s"graft: trailing ltxtquery tokens: $rest")
    val labels = split(p, DOT)
    def compile(n: N): Column = n match {
      case Atom(w) => array_contains(labels, w)
      case Not(x) => !compile(x)
      case And(l, r) => compile(l) && compile(r)
      case Or(l, r) => compile(l) || compile(r)
    }
    compile(tree)
  }

  /**
   * Ancestor join at scale: rows (with path column) joined to a set of
   * subtree roots — returns rows whose path is a descendant-or-self of
   * any root. Explodes each row's ancestor prefixes (≤ depth of the
   * tree) and equi-joins on the prefix string: a plain hash join, no
   * LIKE theta join, no per-root scan.
   */
  def ancestorJoin(rows: DataFrame, pathCol: String, roots: DataFrame,
                   rootCol: String): DataFrame = {
    val labels = split(col(pathCol), DOT)
    val pref = rows.withColumn("_anc",
      explode(transform(sequence(lit(1), size(labels)),
        i => array_join(slice(labels, lit(1), i), "."))))
    pref.join(roots, pref("_anc") === roots(rootCol)).drop("_anc")
  }
}
