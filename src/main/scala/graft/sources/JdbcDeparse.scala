package graft.sources

/**
 * Dialect-aware remote-SQL deparse — the heterogeneous-FDW half of the
 * reference's FDW family (contrib: mysql_fdw deparse.c quotes with
 * backticks and appends `LIMIT n`; oracle_fdw deparses `FETCH FIRST n
 * ROWS ONLY` and double-quoted identifiers; postgres_fdw deparse.c
 * quotes with double quotes and `LIMIT n`). C85's JdbcSource rides
 * Spark's own dialect registry for scans it plans itself; this module
 * is for the dblink-style path where the library AUTHORS the remote
 * SQL (`JdbcSource.readDeparsed`) — the text must follow the REMOTE
 * engine's quoting, literal and row-limit rules, not the local ones.
 *
 * Scale note: a deparsed query ships the WHERE/ORDER/LIMIT to the
 * remote engine — the selective probe never crosses the wire, same
 * contract as the FDWs it mirrors. The deparse itself is plan-time
 * string work.
 */
object JdbcDeparse {

  /** A pushable predicate (the FDW deparse subset: column-vs-literal
    * comparisons and null tests, AND-composed). */
  sealed trait Pred
  final case class Cmp(col: String, op: String, value: Any) extends Pred {
    require(Set("=", "<>", "<", "<=", ">", ">=").contains(op),
      s"graft: unsupported deparse operator '$op'")
  }
  final case class IsNull(col: String, not: Boolean = false) extends Pred

  sealed abstract class Dialect(val name: String) {
    /** Identifier quoting per the remote engine's rules. */
    def quoteIdent(id: String): String
    /** Append the engine's row-limit clause to a complete SELECT. */
    def limitClause(n: Long): String
    /** Literal rendering ('' doubling is the portable string escape —
      * mysql_fdw sets the session to ANSI-compatible literal handling
      * the same way). */
    def literal(v: Any): String = v match {
      case null => "NULL"
      case s: String => "'" + s.replace("'", "''") + "'"
      case n: Number => n.toString
      case other => throw new IllegalArgumentException(
        s"graft: cannot deparse literal $other for $name")
    }
    protected def quoteWith(q: Char, id: String): String =
      s"$q${id.replace(q.toString, s"$q$q")}$q"
    /** Quote a possibly schema-qualified relation name part-by-part. */
    def quoteTable(t: String): String =
      t.split("\\.", -1).map(quoteIdent).mkString(".")
  }

  /** mysql_fdw: backtick identifiers (doubled inside), LIMIT n. */
  case object MySql extends Dialect("mysql") {
    def quoteIdent(id: String): String = quoteWith('`', id)
    def limitClause(n: Long): String = s" LIMIT $n"
  }

  /** oracle_fdw: double-quoted identifiers, FETCH FIRST (12c+ row
    * limiting — oracle_fdw's modern deparse; there is no LIMIT). */
  case object Oracle extends Dialect("oracle") {
    def quoteIdent(id: String): String = quoteWith('"', id)
    def limitClause(n: Long): String = s" FETCH FIRST $n ROWS ONLY"
  }

  /** postgres_fdw: double-quoted identifiers, LIMIT n. */
  case object Postgres extends Dialect("postgresql") {
    def quoteIdent(id: String): String = quoteWith('"', id)
    def limitClause(n: Long): String = s" LIMIT $n"
  }

  /** Derby (the live in-process engine): SQL-standard quoting and the
    * standard OFFSET/FETCH row limit. */
  case object Derby extends Dialect("derby") {
    def quoteIdent(id: String): String = quoteWith('"', id)
    def limitClause(n: Long): String = s" FETCH FIRST $n ROWS ONLY"
  }

  /** Resolve the dialect from a JDBC url, like JdbcDialects.get. */
  def forUrl(url: String): Dialect = {
    val u = url.toLowerCase(java.util.Locale.ROOT)
    if (u.startsWith("jdbc:mysql:") || u.startsWith("jdbc:mariadb:")) MySql
    else if (u.startsWith("jdbc:oracle:")) Oracle
    else if (u.startsWith("jdbc:postgresql:")) Postgres
    else if (u.startsWith("jdbc:derby:")) Derby
    else throw new IllegalArgumentException(
      s"graft: no deparse dialect for url '$url'")
  }

  private def predSql(d: Dialect, p: Pred): String = p match {
    case Cmp(c, op, v) => s"${d.quoteIdent(c)} $op ${d.literal(v)}"
    case IsNull(c, not) =>
      s"${d.quoteIdent(c)} IS ${if (not) "NOT " else ""}NULL"
  }

  /** Deparse a full remote SELECT in the dialect's rules: quoted
    * target list and relation, AND-composed WHERE, ORDER BY (bool =
    * ascending), and the dialect's row-limit clause. */
  def select(d: Dialect, table: String, cols: Seq[String],
      where: Seq[Pred] = Seq.empty,
      orderBy: Seq[(String, Boolean)] = Seq.empty,
      limit: Option[Long] = None): String = {
    require(cols.nonEmpty, "graft: deparse needs an explicit column list")
    val sb = new StringBuilder("SELECT ")
    sb.append(cols.map(d.quoteIdent).mkString(", "))
    sb.append(" FROM ").append(d.quoteTable(table))
    if (where.nonEmpty)
      sb.append(" WHERE ").append(where.map(predSql(d, _)).mkString(" AND "))
    if (orderBy.nonEmpty)
      sb.append(" ORDER BY ").append(orderBy.map { case (c, asc) =>
        d.quoteIdent(c) + (if (asc) " ASC" else " DESC")
      }.mkString(", "))
    limit.foreach(n => sb.append(d.limitClause(n)))
    sb.toString
  }
}
