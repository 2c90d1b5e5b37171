package graft.functions

import com.fasterxml.jackson.databind.JsonNode

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * jsonb field/element/path extraction — PG/openGauss `->`, `->>`,
 * `#>`, `#>>` and the named forms jsonb_extract_path(_text)
 * (reference: src/common/backend/utils/adt/jsonfuncs.cpp
 * jsonb_object_field / jsonb_array_element / get_jsonb_path_all).
 * Semantics implemented exactly:
 *
 *  - `-> text`: object → member value as canonical jsonb; anything
 *    else (array/scalar/missing key) → NULL
 *  - `-> int`: array → element at index, NEGATIVE counts from the
 *    end (jsonb behavior); anything else / out of range → NULL
 *  - `->>`: same selection, rendered as text — strings unquoted,
 *    json null → SQL NULL, containers/numbers/bools → canonical text
 *  - `#> '{a,2}'`: stepwise descent; an array step requires the path
 *    element to parse as an integer (else NULL); the EMPTY path
 *    returns the (canonicalized) input, as PG does
 *
 * Single parse of the target per row, tree walk, called from
 * generated code — whole-stage codegen stays intact (the same shape
 * as [[JsonbContains]]).
 */
object JsonbGet {
  /** One selection step; null-safe on the JsonNode level. */
  def step(n: JsonNode, key: String, idx: Int, byKey: Boolean): JsonNode = {
    if (n == null) return null
    if (byKey) {
      if (!n.isObject) null else n.get(key) // null when missing
    } else {
      if (!n.isArray) null
      else {
        val sz = n.size
        val i = if (idx < 0) sz + idx else idx
        if (i < 0 || i >= sz) null else n.get(i)
      }
    }
  }

  /** Render a selected node: jsonb form (canonical) or text form. */
  def out(n: JsonNode, text: Boolean): UTF8String = {
    if (n == null) return null
    if (text) {
      if (n.isNull) null
      else if (n.isTextual) UTF8String.fromString(n.asText)
      else UTF8String.fromString(Jsonb.render(n))
    } else UTF8String.fromString(Jsonb.render(n))
  }

  def walk(root: JsonNode, path: Array[String]): JsonNode = {
    var n = root
    var i = 0
    while (i < path.length && n != null) {
      val p = path(i)
      n =
        if (n.isObject) n.get(p)
        else if (n.isArray) {
          val idx =
            try Integer.parseInt(p)
            catch { case _: NumberFormatException => return null }
          step(n, null, idx, byKey = false)
        } else null
      i += 1
    }
    n
  }
}

/** `x::jsonb` — PG's jsonb cast CANONICALIZES (jsonb_in: parse into
  * the binary form, render with (length, bytes) key order and ", "/
  * ": " spacing); identity only for already-canonical text. The
  * `::json` cast, by contrast, preserves the input text and stays an
  * identity upstream. */
case class JsonbNorm(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult = {
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"jsonb cast needs a string operand, got ${child.dataType.sql}")
  }
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "jsonb_norm"

  def eval1(a: UTF8String): UTF8String =
    UTF8String.fromString(Jsonb.render(Jsonb.parse(a)))

  override def nullSafeEval(a: Any): Any = eval1(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("jsonbNorm", this, classOf[JsonbNorm].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.eval1($a);")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** `j -> k` / `j ->> k` — k either a text key or an int index. */
case class JsonbGet(left: Expression, right: Expression, text: Boolean)
    extends BinaryExpression {
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult = {
    if (left.dataType == StringType &&
        (right.dataType == StringType || right.dataType == IntegerType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"jsonb get needs (json string, text key | int index), got " +
        s"${left.dataType.sql} / ${right.dataType.sql}")
  }
  override def nullIntolerant: Boolean = true
  // missing keys / wrong container kinds select SQL NULL even for
  // non-null inputs
  override def nullable: Boolean = true
  override def prettyName: String =
    if (text) "jsonb_get_text" else "jsonb_get"

  private val byKey = right.dataType == StringType

  def eval2(a: UTF8String, b: Any): UTF8String = {
    val root = Jsonb.parse(a)
    val sel =
      if (byKey) JsonbGet.step(root, b.asInstanceOf[UTF8String].toString, 0, byKey = true)
      else JsonbGet.step(root, null, b.asInstanceOf[Int], byKey = false)
    JsonbGet.out(sel, text)
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    eval2(a.asInstanceOf[UTF8String], b)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("jsonbGet", this, classOf[JsonbGet].getName)
    val box = if (byKey) "" else "(Integer)"
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""${ev.value} = $ref.eval2($a, $box($b));
         |if (${ev.value} == null) { ${ev.isNull} = true; }""".stripMargin)
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** `j #> '{a,2}'` / `j #>> ...` / jsonb_extract_path(_text). */
case class JsonbGetPath(child: Expression, path: Seq[String], text: Boolean)
    extends UnaryExpression {
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult = {
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"jsonb path get needs a json string operand, got ${child.dataType.sql}")
  }
  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true
  override def prettyName: String =
    if (text) "jsonb_get_path_text" else "jsonb_get_path"

  @transient private lazy val steps: Array[String] = path.toArray

  def eval1(a: UTF8String): UTF8String =
    JsonbGet.out(JsonbGet.walk(Jsonb.parse(a), steps), text)

  override def nullSafeEval(a: Any): Any = eval1(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("jsonbGetPath", this, classOf[JsonbGetPath].getName)
    nullSafeCodeGen(ctx, ev, a =>
      s"""${ev.value} = $ref.eval1($a);
         |if (${ev.value} == null) { ${ev.isNull} = true; }""".stripMargin)
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
