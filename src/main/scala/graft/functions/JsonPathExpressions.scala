package graft.functions

import com.fasterxml.jackson.databind.JsonNode

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * SQL/JSON path queries over jsonb — the `@?` operator /
 * jsonb_path_exists / jsonb_path_query_first surface (reference:
 * src/common/backend/utils/adt/jsonpath.cpp, jsonpath_exec.cpp).
 * Implements the LAX-mode core of the language:
 *
 *   $ .key  [*]  [n]  ? (@<path> <op> <literal>)  ? (exists (@<path>))
 *
 * with comparison ops ==, !=, <, <=, >, >= over numbers (numeric
 * compare, 5 == 5.0), strings ("double-quoted", as SQL/JSON spec),
 * booleans and null. Lax semantics as PG executes them: `.key` on an
 * array auto-unwraps and maps over the elements; `[*]` on a
 * non-array treats it as a singleton; a filter keeps the item when
 * the predicate holds with `@` bound to it, and a predicate path
 * yielding several values compares existentially (any match).
 *
 * The path is parsed ONCE at expression construction (driver side);
 * per row the compiled call parses the document and walks the tiny
 * step list.
 */
object JsonPath {
  sealed trait Step
  final case class Key(k: String) extends Step
  case object Wild extends Step
  final case class Idx(i: Int) extends Step
  final case class Filt(pred: Pred) extends Step

  /** `@<path> <op> <lit>`; op "ex" = exists(@<path>). */
  final case class Pred(path: Seq[Step], op: String, lit: JsonNode)

  def parse(s: String): Seq[Step] = new P(s).parsePath()

  private final class P(s: String) {
    private var i = 0
    private def err(msg: String): Nothing =
      throw new IllegalArgumentException(s"graft: bad jsonpath at $i in '$s': $msg")
    private def ws(): Unit = while (i < s.length && s.charAt(i).isWhitespace) i += 1
    private def eat(c: Char): Unit = {
      ws()
      if (i >= s.length || s.charAt(i) != c) err(s"expected '$c'")
      i += 1
    }
    private def peekIs(c: Char): Boolean = { ws(); i < s.length && s.charAt(i) == c }

    def parsePath(): Seq[Step] = {
      eat('$')
      val steps = parseSteps()
      ws()
      if (i < s.length) err("trailing input")
      steps
    }

    /** steps after a `$` or `@` anchor. */
    def parseSteps(): Seq[Step] = {
      val out = Seq.newBuilder[Step]
      var go = true
      while (go) {
        ws()
        if (i >= s.length) go = false
        else s.charAt(i) match {
          case '.' =>
            i += 1
            val start = i
            while (i < s.length && (s.charAt(i).isLetterOrDigit || s.charAt(i) == '_')) i += 1
            if (i == start) err("expected a key after '.'")
            out += Key(s.substring(start, i))
          case '[' =>
            i += 1
            ws()
            if (peekIs('*')) { i += 1; eat(']'); out += Wild }
            else {
              val start = i
              if (peekIs('-')) i += 1
              while (i < s.length && s.charAt(i).isDigit) i += 1
              if (i == start) err("expected * or an index in []")
              val idx = s.substring(start, i).toInt
              eat(']')
              out += Idx(idx)
            }
          case '?' =>
            i += 1
            eat('(')
            out += Filt(parsePred())
            eat(')')
          case _ => go = false
        }
      }
      out.result()
    }

    private def parsePred(): Pred = {
      ws()
      if (s.startsWith("exists", i)) {
        i += 6
        eat('(')
        eat('@')
        val p = parseSteps()
        eat(')')
        Pred(p, "ex", null)
      } else {
        eat('@')
        val p = parseSteps()
        ws()
        val ops = Seq("==", "!=", "<=", ">=", "<", ">")
        val op = ops.find(o => s.startsWith(o, i))
          .getOrElse(err("expected a comparison operator"))
        i += op.length
        ws()
        Pred(p, op, parseLit())
      }
    }

    private def parseLit(): JsonNode = {
      ws()
      val start = i
      if (peekIs('"')) {
        i += 1
        val sb = new StringBuilder
        while (i < s.length && s.charAt(i) != '"') {
          if (s.charAt(i) == '\\' && i + 1 < s.length) i += 1
          sb.append(s.charAt(i)); i += 1
        }
        eat('"')
        com.fasterxml.jackson.databind.node.TextNode.valueOf(sb.toString)
      } else if (s.startsWith("true", i)) { i += 4
        com.fasterxml.jackson.databind.node.BooleanNode.TRUE
      } else if (s.startsWith("false", i)) { i += 5
        com.fasterxml.jackson.databind.node.BooleanNode.FALSE
      } else if (s.startsWith("null", i)) { i += 4
        com.fasterxml.jackson.databind.node.NullNode.getInstance
      } else {
        if (peekIs('-')) i += 1
        while (i < s.length && (s.charAt(i).isDigit || s.charAt(i) == '.')) i += 1
        if (i == start) err("expected a literal")
        com.fasterxml.jackson.databind.node.DecimalNode.valueOf(
          new java.math.BigDecimal(s.substring(start, i)))
      }
    }
  }

  /** Lax-mode evaluation: the node list a path yields. */
  def eval(root: JsonNode, steps: Seq[Step]): Seq[JsonNode] = {
    var cur: Seq[JsonNode] = Seq(root)
    steps.foreach { st =>
      cur = cur.flatMap { n =>
        st match {
          case Key(k) =>
            // lax: auto-unwrap arrays for member access
            val targets = if (n.isArray) iter(n) else Seq(n)
            targets.flatMap(t => Option(if (t.isObject) t.get(k) else null))
          case Wild =>
            if (n.isArray) iter(n) else Seq(n) // lax singleton
          case Idx(ix) =>
            if (!n.isArray) Seq.empty
            else {
              val at = if (ix < 0) ix + n.size() else ix
              if (at >= 0 && at < n.size()) Seq(n.get(at)) else Seq.empty
            }
          case Filt(p) =>
            val targets = if (n.isArray) iter(n) else Seq(n) // lax unwrap
            targets.filter(t => predHolds(t, p))
        }
      }
    }
    cur
  }

  private def iter(a: JsonNode): Seq[JsonNode] = {
    val b = Seq.newBuilder[JsonNode]
    val it = a.elements()
    while (it.hasNext) b += it.next()
    b.result()
  }

  private def predHolds(item: JsonNode, p: Pred): Boolean = {
    val vs = eval(item, p.path)
    if (p.op == "ex") vs.nonEmpty
    else vs.exists(v => cmp(v, p.lit, p.op))
  }

  private def cmp(a: JsonNode, b: JsonNode, op: String): Boolean = {
    if (a.isContainerNode || b.isContainerNode) return false
    val c: Option[Int] =
      if (a.isNumber && b.isNumber) Some(a.decimalValue.compareTo(b.decimalValue))
      else if (a.isTextual && b.isTextual) Some(a.asText.compareTo(b.asText))
      else if (a.isBoolean && b.isBoolean) Some(a.asBoolean.compareTo(b.asBoolean))
      else if (a.isNull && b.isNull) Some(0)
      else None
    op match {
      case "==" => c.contains(0)
      case "!=" => c.exists(_ != 0)
      case "<"  => c.exists(_ < 0)
      case "<=" => c.exists(_ <= 0)
      case ">"  => c.exists(_ > 0)
      case ">=" => c.exists(_ >= 0)
      case _    => false
    }
  }

  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graft.Bridge

  /** `target @? path` / jsonb_path_exists. */
  def pathExists(target: Column, path: String): Column =
    Bridge.column(JsonbPathOp(Bridge.expression(target), path, first = false))

  /** jsonb_path_query_first, rendered canonically (null if no match). */
  def pathQueryFirst(target: Column, path: String): Column =
    Bridge.column(JsonbPathOp(Bridge.expression(target), path, first = true))
}

/** jsonb_path_exists (`first=false`, boolean) or
  * jsonb_path_query_first (`first=true`, canonical text or null). */
case class JsonbPathOp(child: Expression, path: String, first: Boolean)
    extends UnaryExpression {
  @transient private lazy val steps: Seq[JsonPath.Step] = JsonPath.parse(path)
  // parse eagerly at construction so bad paths fail at planning time
  JsonPath.parse(path)

  override def dataType: DataType = if (first) StringType else BooleanType
  override def nullable: Boolean = first || super.nullable
  override def nullIntolerant: Boolean = true
  override def prettyName: String =
    if (first) "jsonb_path_query_first" else "jsonb_path_exists"

  def eval1(a: UTF8String): Any = {
    val vs = JsonPath.eval(Jsonb.parse(a), steps)
    if (first) {
      if (vs.isEmpty) null
      else UTF8String.fromString(Jsonb.render(vs.head))
    } else vs.nonEmpty
  }

  override def nullSafeEval(a: Any): Any = eval1(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("jsonbPathOp", this, classOf[JsonbPathOp].getName)
    if (first)
      nullSafeCodeGen(ctx, ev, a => s"""
         |Object r = $ref.eval1($a);
         |if (r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = (UTF8String) r; }
       """.stripMargin)
    else
      nullSafeCodeGen(ctx, ev, a => s"${ev.value} = (Boolean) $ref.eval1($a);")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
