package graft.functions

import com.fasterxml.jackson.databind.JsonNode
import com.fasterxml.jackson.databind.node.{ArrayNode, BooleanNode, DecimalNode, JsonNodeFactory, NullNode, ObjectNode, TextNode}

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * The rest of the reference's jsonb SQL surface (builtin_funcs.ini:
 * jsonb_typeof, jsonb_array_length, jsonb_object_keys,
 * jsonb_array_elements(_text), jsonb_each(_text), jsonb_cmp and the
 * eq/ne/lt/le/gt/ge family, jsonb_build_object/array, 3416/3435/
 * 3445/...; jsonb_op.cpp + jsonb_util.cpp).
 *
 * jsonb_cmp mirrors compareJsonbSuperHeaderValue (jsonb_util.cpp:154)
 * over the parsed tree: type-rank order Null < String < Number <
 * Bool < Array < Object (the JsonbValue enum); a ROOT scalar is PG's
 * raw-scalar pseudo-array and sorts BELOW a real root array; same-
 * type containers compare by COUNT first (the iterator observes
 * nElems/nPairs at the BEGIN token) and contents only when counts
 * tie; object pairs iterate in jsonb's physical (length, bytes) key
 * order; numbers compare numerically (numeric_cmp ≈ BigDecimal);
 * strings compare by code unit (the reference uses the database
 * collation — C-locale builds give the same byte order).
 *
 * The set-returning functions (object_keys, array_elements, each)
 * return ARRAYS here — `explode(...)` is Spark's lateral spelling —
 * in the same storage order PG emits the set.
 */
object JsonbMore {
  private val fac = JsonNodeFactory.instance

  private def rank(n: JsonNode): Int =
    if (n.isNull) 0
    else if (n.isTextual) 1
    else if (n.isNumber) 2
    else if (n.isBoolean) 3
    else if (n.isArray) 4
    else 5

  /** jsonb object iteration order: key length, then bytewise. */
  def sortedKeys(n: JsonNode): Array[String] = {
    val it = n.fieldNames()
    val b = scala.collection.mutable.ArrayBuffer.empty[String]
    while (it.hasNext) b += it.next()
    b.sortInPlaceBy(k => (k.length, k))
    b.toArray
  }

  private def cmpScalar(a: JsonNode, b: JsonNode): Int = rank(a) match {
    case 0 => 0
    case 1 => a.asText.compareTo(b.asText)
    case 2 => a.decimalValue.compareTo(b.decimalValue)
    case 3 => java.lang.Boolean.compare(a.asBoolean, b.asBoolean)
    case _ => throw new IllegalStateException("not a scalar")
  }

  /** Nested-value comparison (below the root). */
  def cmpValue(a: JsonNode, b: JsonNode): Int = {
    val (ra, rb) = (rank(a), rank(b))
    if (ra != rb) return Integer.compare(ra, rb)
    if (ra <= 3) return cmpScalar(a, b)
    if (a.isArray) {
      if (a.size != b.size) return Integer.compare(a.size, b.size)
      var i = 0
      while (i < a.size) {
        val c = cmpValue(a.get(i), b.get(i))
        if (c != 0) return c
        i += 1
      }
      0
    } else {
      if (a.size != b.size) return Integer.compare(a.size, b.size)
      val (ka, kb) = (sortedKeys(a), sortedKeys(b))
      var i = 0
      while (i < ka.length) {
        // keys compare by (length, bytes) — the iteration order itself
        val c =
          if (ka(i).length != kb(i).length)
            Integer.compare(ka(i).length, kb(i).length)
          else ka(i).compareTo(kb(i))
        if (c != 0) return c
        val cv = cmpValue(a.get(ka(i)), b.get(kb(i)))
        if (cv != 0) return cv
        i += 1
      }
      0
    }
  }

  /** Root comparison with PG's raw-scalar pseudo-array rule. */
  def cmpRoot(a: JsonNode, b: JsonNode): Int = {
    val aScalar = !a.isContainerNode
    val bScalar = !b.isContainerNode
    if (aScalar && bScalar) cmpValue(a, b)
    else if (aScalar && b.isArray) -1 // raw scalar < real array
    else if (bScalar && a.isArray) 1
    else if (aScalar) -1 // pseudo-ARRAY < object
    else if (bScalar) 1
    else cmpValue(a, b)
  }

  def typeofName(n: JsonNode): String =
    if (n.isNull) "null"
    else if (n.isTextual) "string"
    else if (n.isNumber) "number"
    else if (n.isBoolean) "boolean"
    else if (n.isArray) "array"
    else "object"

  /** jsonb_build_object/array value mapping: SQL value → JsonNode
    * (text → string, like PG's text arguments). */
  def toNode(v: Any, t: DataType): JsonNode = v match {
    case null => NullNode.instance
    case s: UTF8String => TextNode.valueOf(s.toString)
    case i: Int => DecimalNode.valueOf(new java.math.BigDecimal(i))
    case l: Long => DecimalNode.valueOf(new java.math.BigDecimal(l))
    case d: Double => DecimalNode.valueOf(new java.math.BigDecimal(d.toString))
    case f: Float => DecimalNode.valueOf(new java.math.BigDecimal(f.toString))
    case dec: org.apache.spark.sql.types.Decimal =>
      DecimalNode.valueOf(dec.toJavaBigDecimal)
    case b: Boolean => if (b) BooleanNode.TRUE else BooleanNode.FALSE
    case s: Short => DecimalNode.valueOf(new java.math.BigDecimal(s.toInt))
    case b: Byte => DecimalNode.valueOf(new java.math.BigDecimal(b.toInt))
    case other => throw new IllegalArgumentException(
      s"graft: jsonb_build: unsupported argument type ${t.sql} ($other)")
  }
}

/** jsonb_cmp(a, b) → int; the eq/ne/lt/le/gt/ge family derives. */
case class JsonbCmp(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"jsonb_cmp needs two json string operands, got " +
        s"${left.dataType.sql} / ${right.dataType.sql}")
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "jsonb_cmp"

  def eval2(a: UTF8String, b: UTF8String): Int = {
    val c = JsonbMore.cmpRoot(Jsonb.parse(a), Jsonb.parse(b))
    if (c < 0) -1 else if (c > 0) 1 else 0
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    eval2(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("jsonbCmp", this, classOf[JsonbCmp].getName)
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $ref.eval2($a, $b);")
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/**
 * The single-argument jsonb inspectors:
 * mode 0 = jsonb_typeof, 1 = jsonb_array_length (PG errors on
 * non-arrays, scalars included), 2 = jsonb_object_keys (array of
 * keys, storage order), 3/4 = jsonb_array_elements(_text),
 * 5/6 = jsonb_each(_text) (array<struct<key,value>>).
 */
case class JsonbInspect(child: Expression, mode: Int)
    extends UnaryExpression {
  override def dataType: DataType = mode match {
    case 0 => StringType
    case 1 => IntegerType
    case 2 => ArrayType(StringType, containsNull = false)
    case 3 | 4 => ArrayType(StringType, containsNull = true)
    case _ => ArrayType(StructType(Seq(
      StructField("key", StringType, nullable = false),
      StructField("value", StringType, nullable = true))),
      containsNull = false)
  }
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs a json string operand, got ${child.dataType.sql}")
  override def nullIntolerant: Boolean = true
  override def prettyName: String = mode match {
    case 0 => "jsonb_typeof"
    case 1 => "jsonb_array_length"
    case 2 => "jsonb_object_keys"
    case 3 => "jsonb_array_elements"
    case 4 => "jsonb_array_elements_text"
    case 5 => "jsonb_each"
    case 6 => "jsonb_each_text"
  }

  private def outText(n: JsonNode, text: Boolean): UTF8String =
    if (text && n.isNull) null
    else if (text && n.isTextual) UTF8String.fromString(n.asText)
    else UTF8String.fromString(Jsonb.render(n))

  def eval1(a: UTF8String): Any = {
    val n = Jsonb.parse(a)
    mode match {
      case 0 => UTF8String.fromString(JsonbMore.typeofName(n))
      case 1 =>
        if (n.isArray) n.size
        else if (n.isContainerNode) throw new IllegalArgumentException(
          "graft: cannot get array length of a non-array")
        else throw new IllegalArgumentException(
          "graft: cannot get array length of a scalar")
      case 2 =>
        if (!n.isObject) throw new IllegalArgumentException(
          "graft: cannot call jsonb_object_keys on a non-object")
        new GenericArrayData(
          JsonbMore.sortedKeys(n).map(UTF8String.fromString(_): Any))
      case 3 | 4 =>
        if (!n.isArray) throw new IllegalArgumentException(
          s"graft: cannot extract elements from a ${JsonbMore.typeofName(n)}")
        val out = new Array[Any](n.size)
        var i = 0
        while (i < n.size) { out(i) = outText(n.get(i), mode == 4); i += 1 }
        new GenericArrayData(out)
      case _ =>
        if (!n.isObject) throw new IllegalArgumentException(
          s"graft: cannot deconstruct a ${JsonbMore.typeofName(n)}")
        val ks = JsonbMore.sortedKeys(n)
        val out = new Array[Any](ks.length)
        var i = 0
        while (i < ks.length) {
          out(i) = new GenericInternalRow(Array[Any](
            UTF8String.fromString(ks(i)), outText(n.get(ks(i)), mode == 6)))
          i += 1
        }
        new GenericArrayData(out)
    }
  }

  override def nullSafeEval(a: Any): Any = eval1(a.asInstanceOf[UTF8String])

  // eval1 never returns null (wrong kinds THROW, like PG); the only
  // unboxing is the int mode
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("jsonbInspect", this, classOf[JsonbInspect].getName)
    nullSafeCodeGen(ctx, ev, a =>
      if (mode == 1) s"${ev.value} = ((Integer) $ref.eval1($a)).intValue();"
      else {
        val cast = org.apache.spark.sql.catalyst.expressions.codegen
          .CodeGenerator.boxedType(dataType)
        s"${ev.value} = ($cast) $ref.eval1($a);"
      })
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** jsonb_build_object(k1, v1, ...) / jsonb_build_array(v1, ...) —
  * canonical jsonb from SQL values (strings become json strings, as
  * PG's text arguments do). */
case class JsonbBuild(children: Seq[Expression], obj: Boolean)
    extends Expression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def dataType: DataType = StringType
  override def nullable: Boolean = false
  override def foldable: Boolean = children.forall(_.foldable)
  override def checkInputDataTypes(): TypeCheckResult =
    if (obj && children.length % 2 != 0)
      TypeCheckResult.TypeCheckFailure(
        "jsonb_build_object needs an even number of arguments")
    else TypeCheckResult.TypeCheckSuccess
  override def prettyName: String =
    if (obj) "jsonb_build_object" else "jsonb_build_array"

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val vals = children.map(c => (c.eval(input), c.dataType))
    val node: JsonNode =
      if (obj) {
        val o = new ObjectNode(JsonNodeFactory.instance)
        vals.grouped(2).foreach { case Seq((k, _), (v, vt)) =>
          if (k == null) throw new IllegalArgumentException(
            "graft: jsonb_build_object: null key")
          o.set[JsonNode](k.asInstanceOf[UTF8String].toString,
            JsonbMore.toNode(v, vt))
        }
        o
      } else {
        val a = new ArrayNode(JsonNodeFactory.instance)
        vals.foreach { case (v, vt) => a.add(JsonbMore.toNode(v, vt)) }
        a
      }
    UTF8String.fromString(Jsonb.render(node))
  }

  override protected def withNewChildrenInternal(
      cs: IndexedSeq[Expression]): Expression = copy(children = cs)
}
