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
  /** `a || b` (canonical text result). */
  def concatJson(a: Column, b: Column): Column =
    Bridge.column(JsonbConcat(Bridge.expression(a), Bridge.expression(b)))
  def concatJson(a: Column, b: String): Column =
    concatJson(a, org.apache.spark.sql.functions.lit(b))
  /** `target - key`. */
  def deleteKey(target: Column, key: String): Column =
    Bridge.column(JsonbDelete(Bridge.expression(target),
      JsonbDelete.DelKey(key)))
  /** `target - idx`. */
  def deleteIdx(target: Column, idx: Int): Column =
    Bridge.column(JsonbDelete(Bridge.expression(target),
      JsonbDelete.DelIdx(idx)))
  /** `target #- path`. */
  def deletePath(target: Column, path: Seq[String]): Column =
    Bridge.column(JsonbDelete(Bridge.expression(target),
      JsonbDelete.DelPath(path)))
  /** jsonb_set(target, path, value[, createMissing]). */
  def setJson(target: Column, path: Seq[String], value: Column,
      createMissing: Boolean = true): Column =
    Bridge.column(JsonbSetInsert(Bridge.expression(target),
      Bridge.expression(value), path, insert = false, flag = createMissing))
  def setJson(target: Column, path: Seq[String], value: String): Column =
    setJson(target, path, org.apache.spark.sql.functions.lit(value))
  /** jsonb_insert(target, path, value[, insertAfter]). */
  def insertJson(target: Column, path: Seq[String], value: Column,
      insertAfter: Boolean = false): Column =
    Bridge.column(JsonbSetInsert(Bridge.expression(target),
      Bridge.expression(value), path, insert = true, flag = insertAfter))
  def insertJson(target: Column, path: Seq[String], value: String): Column =
    insertJson(target, path, org.apache.spark.sql.functions.lit(value))

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

  // -----------------------------------------------------------------
  // concat / delete (jsonb_concat, jsonb_delete, jsonb_delete_path —
  // jsonfuncs.cpp / jsonb_util.cpp) + PG-canonical rendering
  // -----------------------------------------------------------------

  /** Render in jsonb's canonical text form: object keys in storage
    * order (length, then bytewise), `", "` and `": "` separators —
    * deterministic, so results can cross an exact gate. */
  def render(n: JsonNode): String = {
    val sb = new StringBuilder
    renderTo(n, sb)
    sb.toString
  }

  private def renderTo(n: JsonNode, sb: StringBuilder): Unit = {
    if (n.isObject) {
      val keys = {
        val it = n.fieldNames()
        val b = scala.collection.mutable.ArrayBuffer.empty[String]
        while (it.hasNext) b += it.next()
        b.sortInPlaceBy(k => (k.length, k))
      }
      sb.append('{')
      var first = true
      keys.foreach { k =>
        if (!first) sb.append(", ")
        first = false
        sb.append(com.fasterxml.jackson.databind.node.TextNode.valueOf(k).toString)
        sb.append(": ")
        renderTo(n.get(k), sb)
      }
      sb.append('}')
    } else if (n.isArray) {
      sb.append('[')
      val it = n.elements()
      var first = true
      while (it.hasNext) {
        if (!first) sb.append(", ")
        first = false
        renderTo(it.next(), sb)
      }
      sb.append(']')
    } else sb.append(n.toString)
  }

  /** `a || b`: object+object merges (right wins); otherwise both
    * sides become arrays (non-array → single-element) and concat. */
  def concatNodes(a: JsonNode, b: JsonNode): JsonNode = {
    import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
    if (a.isObject && b.isObject) {
      val out = mapper.createObjectNode()
      out.setAll(a.asInstanceOf[ObjectNode])
      out.setAll(b.asInstanceOf[ObjectNode])
      out
    } else {
      val out = mapper.createArrayNode()
      def add(n: JsonNode): Unit =
        if (n.isArray) out.addAll(n.asInstanceOf[ArrayNode])
        else out.add(n)
      add(a); add(b)
      out
    }
  }

  /** `a - key`: drop an object key / all equal string array elements. */
  def deleteKey(a: JsonNode, key: String): JsonNode = {
    import com.fasterxml.jackson.databind.node.ObjectNode
    if (a.isObject) {
      val out = a.deepCopy[ObjectNode]()
      out.remove(key)
      out
    } else if (a.isArray) {
      val out = mapper.createArrayNode()
      val it = a.elements()
      while (it.hasNext) {
        val e = it.next()
        if (!(e.isTextual && e.asText == key)) out.add(e)
      }
      out
    } else throw new IllegalArgumentException(
      "graft: cannot delete from scalar jsonb")
  }

  /** `a - idx`: drop the array element at idx (negative from the
    * end; out of range → unchanged). Objects error, as PG does. */
  def deleteIdx(a: JsonNode, idx: Int): JsonNode = {
    if (!a.isArray) throw new IllegalArgumentException(
      if (a.isObject) "graft: cannot delete from object using integer index"
      else "graft: cannot delete from scalar jsonb")
    val n = a.size()
    val at = if (idx < 0) idx + n else idx
    if (at < 0 || at >= n) a
    else {
      val out = mapper.createArrayNode()
      var i = 0
      val it = a.elements()
      while (it.hasNext) {
        val e = it.next()
        if (i != at) out.add(e)
        i += 1
      }
      out
    }
  }

  /** `a #- path`: delete at a path of object keys / array indices
    * (indices as text, like PG's text[]); a missing intermediate
    * step leaves the document unchanged. */
  def deletePath(a: JsonNode, path: Seq[String]): JsonNode = {
    require(path.nonEmpty, "jsonb #- needs a non-empty path")
    if (path.length == 1) {
      if (a.isArray && isInt(path.head)) deleteIdx(a, path.head.toInt)
      else if (a.isArray) a // string step on an array: PG deletes string elems? no — path steps on arrays must be integers; no-op like missing
      else if (a.isObject) deleteKey(a, path.head)
      else throw new IllegalArgumentException(
        "graft: cannot delete path in scalar jsonb")
    } else {
      val step = path.head
      if (a.isObject) {
        val child = a.get(step)
        if (child == null) a
        else {
          val out = a.deepCopy[com.fasterxml.jackson.databind.node.ObjectNode]()
          out.set(step, deletePath(child, path.tail))
          out
        }
      } else if (a.isArray && isInt(step)) {
        val n = a.size()
        val at0 = step.toInt
        val at = if (at0 < 0) at0 + n else at0
        if (at < 0 || at >= n) a
        else {
          val out = mapper.createArrayNode()
          var i = 0
          val it = a.elements()
          while (it.hasNext) {
            val e = it.next()
            if (i == at) out.add(deletePath(e, path.tail)) else out.add(e)
            i += 1
          }
          out
        }
      } else if (a.isArray) a
      else throw new IllegalArgumentException(
        "graft: cannot delete path in scalar jsonb")
    }
  }

  /** jsonb_set (jsonfuncs.cpp setPath): replace the item at `path`,
    * adding it when `createMissing` and only the LAST step is absent;
    * a missing intermediate step returns the target unchanged. */
  def setPath(a: JsonNode, path: Seq[String], v: JsonNode,
      createMissing: Boolean): JsonNode = {
    require(path.nonEmpty, "jsonb_set needs a non-empty path")
    import com.fasterxml.jackson.databind.node.ObjectNode
    if (path.length == 1) {
      val step = path.head
      if (a.isObject) {
        if (a.has(step) || createMissing) {
          val out = a.deepCopy[ObjectNode]()
          out.set(step, v)
          out
        } else a
      } else if (a.isArray) {
        if (!isInt(step)) throw new IllegalArgumentException(
          s"graft: path element is not an integer: '$step'")
        val n = a.size()
        val at0 = step.toInt
        val at = if (at0 < 0) at0 + n else at0
        if (at >= 0 && at < n) {
          val out = mapper.createArrayNode()
          var i = 0
          val it = a.elements()
          while (it.hasNext) {
            val e = it.next()
            if (i == at) out.add(v) else out.add(e)
            i += 1
          }
          out
        } else if (!createMissing) a
        else {
          // out-of-range + create: prepend below, append above (PG)
          val out = mapper.createArrayNode()
          if (at < 0) out.add(v)
          out.addAll(a.asInstanceOf[com.fasterxml.jackson.databind.node.ArrayNode])
          if (at >= n) out.add(v)
          out
        }
      } else throw new IllegalArgumentException(
        "graft: cannot set path in scalar jsonb")
    } else {
      val step = path.head
      if (a.isObject) {
        val child = a.get(step)
        if (child == null) a
        else {
          val out = a.deepCopy[ObjectNode]()
          out.set(step, setPath(child, path.tail, v, createMissing))
          out
        }
      } else if (a.isArray && isInt(step)) {
        val n = a.size()
        val at0 = step.toInt
        val at = if (at0 < 0) at0 + n else at0
        if (at < 0 || at >= n) a
        else {
          val out = mapper.createArrayNode()
          var i = 0
          val it = a.elements()
          while (it.hasNext) {
            val e = it.next()
            if (i == at) out.add(setPath(e, path.tail, v, createMissing))
            else out.add(e)
            i += 1
          }
          out
        }
      } else if (a.isArray) throw new IllegalArgumentException(
        s"graft: path element is not an integer: '$step'")
      else throw new IllegalArgumentException(
        "graft: cannot set path in scalar jsonb")
    }
  }

  /** jsonb_insert: insert `v` at `path` — before (or after, with
    * `after`) an array index; as a NEW object key (an existing key
    * errors, as PG's "cannot replace existing key"). */
  def insertPath(a: JsonNode, path: Seq[String], v: JsonNode,
      after: Boolean): JsonNode = {
    require(path.nonEmpty, "jsonb_insert needs a non-empty path")
    import com.fasterxml.jackson.databind.node.ObjectNode
    if (path.length == 1) {
      val step = path.head
      if (a.isObject) {
        if (a.has(step)) throw new IllegalArgumentException(
          "graft: cannot replace existing key with jsonb_insert")
        val out = a.deepCopy[ObjectNode]()
        out.set(step, v)
        out
      } else if (a.isArray) {
        if (!isInt(step)) throw new IllegalArgumentException(
          s"graft: path element is not an integer: '$step'")
        val n = a.size()
        val at0 = step.toInt
        val base = if (at0 < 0) at0 + n else at0
        val at = math.max(0, math.min(n, base + (if (after) 1 else 0)))
        val out = mapper.createArrayNode()
        var i = 0
        val it = a.elements()
        while (it.hasNext) {
          val e = it.next()
          if (i == at) out.add(v)
          out.add(e)
          i += 1
        }
        if (at >= n) out.add(v)
        out
      } else throw new IllegalArgumentException(
        "graft: cannot insert path in scalar jsonb")
    } else {
      val step = path.head
      if (a.isObject) {
        val child = a.get(step)
        if (child == null) a
        else {
          val out = a.deepCopy[ObjectNode]()
          out.set(step, insertPath(child, path.tail, v, after))
          out
        }
      } else if (a.isArray && isInt(step)) {
        val n = a.size()
        val at0 = step.toInt
        val at = if (at0 < 0) at0 + n else at0
        if (at < 0 || at >= n) a
        else {
          val out = mapper.createArrayNode()
          var i = 0
          val it = a.elements()
          while (it.hasNext) {
            val e = it.next()
            if (i == at) out.add(insertPath(e, path.tail, v, after))
            else out.add(e)
            i += 1
          }
          out
        }
      } else throw new IllegalArgumentException(
        "graft: cannot insert path in scalar jsonb")
    }
  }

  private def isInt(s: String): Boolean =
    s.nonEmpty && s.forall(c => c.isDigit || c == '-') &&
      (s.count(_ == '-') == 0 || (s.head == '-' && s.count(_ == '-') == 1)) &&
      s.exists(_.isDigit)

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

/** `a || b` rendered back to canonical text. One parse per operand,
  * merge/concat walk, canonical render — inside generated code. */
case class JsonbConcat(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "jsonb_concat"

  def eval2(a: UTF8String, b: UTF8String): UTF8String =
    UTF8String.fromString(
      Jsonb.render(Jsonb.concatNodes(Jsonb.parse(a), Jsonb.parse(b))))

  override def nullSafeEval(a: Any, b: Any): Any =
    eval2(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("jsonbConcat", this, classOf[JsonbConcat].getName)
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $ref.eval2($a, $b);")
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** jsonb_set / jsonb_insert (insert=false/true; flag = createMissing
  * for set, insertAfter for insert), canonical text result. */
case class JsonbSetInsert(left: Expression, right: Expression,
    path: Seq[String], insert: Boolean, flag: Boolean)
    extends BinaryExpression {
  require(path.nonEmpty, "jsonb set/insert needs a non-empty path")
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = if (insert) "jsonb_insert" else "jsonb_set"

  def eval2(a: UTF8String, b: UTF8String): UTF8String = {
    val t = Jsonb.parse(a)
    val v = Jsonb.parse(b)
    val out = if (insert) Jsonb.insertPath(t, path, v, after = flag)
              else Jsonb.setPath(t, path, v, createMissing = flag)
    UTF8String.fromString(Jsonb.render(out))
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    eval2(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("jsonbSetInsert", this,
      classOf[JsonbSetInsert].getName)
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $ref.eval2($a, $b);")
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object JsonbDelete {
  sealed trait Op
  final case class DelKey(key: String) extends Op
  final case class DelIdx(idx: Int) extends Op
  final case class DelPath(path: Seq[String]) extends Op
}

/** `target - key` / `target - idx` / `target #- path`, canonical
  * text result. */
case class JsonbDelete(child: Expression, op: JsonbDelete.Op)
    extends UnaryExpression {
  import JsonbDelete._
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = op match {
    case _: DelKey => "jsonb_delete"
    case _: DelIdx => "jsonb_delete_idx"
    case _: DelPath => "jsonb_delete_path"
  }

  def eval1(a: UTF8String): UTF8String = {
    val n = Jsonb.parse(a)
    val out = op match {
      case DelKey(k) => Jsonb.deleteKey(n, k)
      case DelIdx(i) => Jsonb.deleteIdx(n, i)
      case DelPath(p) => Jsonb.deletePath(n, p)
    }
    UTF8String.fromString(Jsonb.render(out))
  }

  override def nullSafeEval(a: Any): Any = eval1(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("jsonbDelete", this, classOf[JsonbDelete].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.eval1($a);")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
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
