package graft.functions

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, Literal, UnaryExpression}
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * jsonb containment and existence (PG/openGauss `@>`, `<@`, `?`,
 * `?|`, `?&`; reference: src/common/backend/utils/adt/jsonb_op.cpp
 * jsonb_contains/jsonb_exists* over JsonbDeepContains in
 * jsonb_util.cpp). Semantics implemented exactly:
 *
 *  - object ⊇ object: every key/value of the query appears in the
 *    target, values compared by recursive containment
 *  - array ⊇ array: every query element is contained in SOME target
 *    element (order-insensitive, duplicates irrelevant)
 *  - array ⊇ scalar: the TOP-LEVEL special case only — a root array
 *    contains a primitive iff the primitive equals an element
 *  - scalars: equality; numbers compare NUMERICALLY (5 == 5.0), as
 *    jsonb's numeric type does
 *  - `?` key existence: object → key present; array → string element
 *    equal; string scalar → equals the key
 *
 * Parsing uses Jackson (on every Spark classpath — Spark's own JSON
 * datasource is built on it); a constant (foldable) query side is
 * parsed ONCE per expression instance, so the per-row work on the
 * hot path is a single parse of the target document plus the tree
 * walk, called from generated code (whole-stage codegen intact).
 */
object Jsonb {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graft.Bridge

  /** `target @> query`. */
  def contains(target: Column, query: Column): Column =
    Bridge.column(JsonbContains(Bridge.expression(target), Bridge.expression(query)))
  def contains(target: Column, query: String): Column =
    contains(target, org.apache.spark.sql.functions.lit(query))
  /** `query <@ target` (operand order as PG writes it). */
  def containedBy(query: Column, target: Column): Column =
    Bridge.column(JsonbContains(Bridge.expression(target), Bridge.expression(query)))
  /** `target ? key`. */
  def existsKey(target: Column, key: String): Column =
    Bridge.column(JsonbExists(Bridge.expression(target), Seq(key), all = false))
  /** `target ?| keys`. */
  def existsAny(target: Column, keys: Seq[String]): Column =
    Bridge.column(JsonbExists(Bridge.expression(target), keys, all = false))
  /** `target ?& keys`. */
  def existsAll(target: Column, keys: Seq[String]): Column =
    Bridge.column(JsonbExists(Bridge.expression(target), keys, all = true))

  private val mapper = new ObjectMapper()

  def parse(s: UTF8String): JsonNode = {
    val n = mapper.readTree(s.toString)
    require(n != null, "graft: invalid jsonb: empty input")
    n
  }

  /** JsonbDeepContains. `top` marks the root call (array-⊇-scalar). */
  def contains(a: JsonNode, b: JsonNode, top: Boolean): Boolean = {
    if (a.isObject && b.isObject) {
      val it = b.fields()
      var ok = true
      while (ok && it.hasNext) {
        val e = it.next()
        val av = a.get(e.getKey)
        ok = av != null && contains(av, e.getValue, top = false)
      }
      ok
    } else if (a.isArray && b.isArray) {
      val it = b.elements()
      var ok = true
      while (ok && it.hasNext) {
        val want = it.next()
        val ait = a.elements()
        var found = false
        while (!found && ait.hasNext) found = contains(ait.next(), want, top = false)
        ok = found
      }
      ok
    } else if (a.isArray && !b.isContainerNode) {
      if (!top) false
      else {
        val ait = a.elements()
        var found = false
        while (!found && ait.hasNext) found = scalarEq(ait.next(), b)
        found
      }
    } else if (!a.isContainerNode && !b.isContainerNode) {
      scalarEq(a, b)
    } else false
  }

  def scalarEq(a: JsonNode, b: JsonNode): Boolean = {
    if (a.isNumber && b.isNumber) a.decimalValue.compareTo(b.decimalValue) == 0
    else if (a.isTextual && b.isTextual) a.asText == b.asText
    else if (a.isBoolean && b.isBoolean) a.asBoolean == b.asBoolean
    else a.isNull && b.isNull
  }

  /** jsonb_exists: `?` */
  def exists(a: JsonNode, key: String): Boolean = {
    if (a.isObject) a.has(key)
    else if (a.isArray) {
      val it = a.elements()
      var found = false
      while (!found && it.hasNext) {
        val e = it.next()
        found = e.isTextual && e.asText == key
      }
      found
    } else a.isTextual && a.asText == key
  }
}

/** `target @> query` (or `<@` by swapping operands at the API). */
case class JsonbContains(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = BooleanType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (left.dataType == StringType && right.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"jsonb_contains needs two string (json) operands, got " +
        s"${left.dataType.sql} / ${right.dataType.sql}")
  }
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "jsonb_contains"

  // a literal query parses once per expression instance, not per row
  @transient private lazy val constRight: JsonNode = right match {
    case Literal(v: UTF8String, StringType) => Jsonb.parse(v)
    case _ => null
  }

  def eval2(a: UTF8String, b: UTF8String): Boolean = {
    val q = if (constRight != null) constRight else Jsonb.parse(b)
    Jsonb.contains(Jsonb.parse(a), q, top = true)
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    eval2(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("jsonbContains", this, classOf[JsonbContains].getName)
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $ref.eval2($a, $b);")
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** `target ? key` / `?| keys` / `?& keys` (mode Any=`?|`, All=`?&`;
  * a single key behaves identically under either mode). */
case class JsonbExists(child: Expression, keys: Seq[String], all: Boolean)
    extends UnaryExpression {
  require(keys.nonEmpty, "jsonb exists needs at least one key")
  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = if (all) "jsonb_exists_all" else "jsonb_exists_any"

  private val keyArr: Array[String] = keys.toArray

  def eval1(a: UTF8String): Boolean = {
    val n = Jsonb.parse(a)
    if (all) keyArr.forall(Jsonb.exists(n, _)) else keyArr.exists(Jsonb.exists(n, _))
  }

  override def nullSafeEval(a: Any): Any = eval1(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("jsonbExists", this, classOf[JsonbExists].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.eval1($a);")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
