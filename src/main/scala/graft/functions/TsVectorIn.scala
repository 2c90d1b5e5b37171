package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * tsvector input syntax — PG's `'cat:1,3 "fat rat":2B dog'::tsvector`
 * literal (reference: src/common/backend/utils/adt/tsvector.c
 * tsvector_in over tsvector_parse.c gettoken_tsvector): whitespace-
 * separated entries, each a lexeme (single-quoted with '' doubling,
 * or bare with backslash escapes) plus an optional `:pos[,pos…]`
 * list where each position may carry an A/B/C/D weight letter.
 * Values normalize exactly like tsvector_in: entries sorted by
 * lexeme, positions sorted unique, positions clamped to LIMITPOS
 * (16383) and capped at MAXNUMPOS (256) per lexeme, duplicate
 * lexemes merged (position union). Weight letters parse and are
 * dropped — the engine's tsvector layout carries positions only
 * (ts_rank_weighted covers the weighted-rank surface separately).
 *
 * The output is the SAME struct-array layout [[TsVector]] produces,
 * so the whole manipulation surface (tsvector_length,
 * tsvector_to_array, ts_delete, strip, `@@` matching) composes on a
 * parsed literal exactly as on a computed vector.
 */
case class ParseTsVector(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ParseTsVector.tsvType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"parse_tsvector needs a string operand, got ${child.dataType.sql}")
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "parse_tsvector"

  def eval1(in: UTF8String): GenericArrayData = {
    val s = in.toString
    val m = new java.util.TreeMap[String, java.util.TreeSet[Integer]]()
    var i = 0
    val n = s.length
    def err(what: String): Nothing = throw new IllegalArgumentException(
      s"graft: parse_tsvector: $what in tsvector: '$s'")
    while (i < n) {
      while (i < n && s.charAt(i).isWhitespace) i += 1
      if (i < n) {
        // lexeme
        val lex = new StringBuilder
        if (s.charAt(i) == '\'') {
          i += 1
          var closed = false
          while (i < n && !closed) {
            if (s.charAt(i) == '\'') {
              if (i + 1 < n && s.charAt(i + 1) == '\'') { lex.append('\''); i += 2 }
              else { closed = true; i += 1 }
            } else { lex.append(s.charAt(i)); i += 1 }
          }
          if (!closed) err("unterminated quoted lexeme")
        } else {
          while (i < n && !s.charAt(i).isWhitespace && s.charAt(i) != ':') {
            if (s.charAt(i) == '\\' && i + 1 < n) { lex.append(s.charAt(i + 1)); i += 2 }
            else { lex.append(s.charAt(i)); i += 1 }
          }
        }
        if (lex.isEmpty) err("empty lexeme")
        var set = m.get(lex.toString)
        if (set == null) { set = new java.util.TreeSet[Integer](); m.put(lex.toString, set) }
        // positions
        if (i < n && s.charAt(i) == ':') {
          i += 1
          var more = true
          while (more) {
            val st = i
            while (i < n && s.charAt(i).isDigit) i += 1
            if (i == st) err("missing position")
            val pos = try s.substring(st, i).toInt
                      catch { case _: NumberFormatException => err("position overflow") }
            if (pos <= 0) err("wrong position info")
            // weight letter parses and drops (layout carries positions only)
            if (i < n && "ABCDabcd*".indexOf(s.charAt(i)) >= 0) i += 1
            if (set.size < 256) set.add(math.min(pos, 16383))
            if (i < n && s.charAt(i) == ',') i += 1 else more = false
          }
          if (i < n && !s.charAt(i).isWhitespace) err("syntax error")
        }
      }
    }
    val out = new Array[Any](m.size)
    val it = m.entrySet().iterator()
    var j = 0
    while (it.hasNext) {
      val e = it.next()
      val ps = new Array[Any](e.getValue.size)
      val pit = e.getValue.iterator()
      var k = 0
      while (pit.hasNext) { ps(k) = pit.next().intValue; k += 1 }
      out(j) = new GenericInternalRow(Array[Any](
        UTF8String.fromString(e.getKey), new GenericArrayData(ps)))
      j += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(a: Any): Any = eval1(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("parseTsv", this, classOf[ParseTsVector].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.eval1($a);")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/**
 * `tsvector || tsvector` — tsvector_op.cpp tsvector_concat: the
 * right side's positions shift by the LEFT side's maximum position
 * (clamped to LIMITPOS 16383), entries merge by lexeme with position
 * union, output sorted by lexeme. Stripped right-side entries stay
 * stripped unless the left contributes positions for the lexeme.
 */
case class TsvConcat(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = ParseTsVector.tsvType
  override def checkInputDataTypes(): TypeCheckResult =
    if (ParseTsVector.isTsv(left.dataType) && ParseTsVector.isTsv(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"tsvector_concat needs two tsvector operands, got " +
        s"${left.dataType.sql} / ${right.dataType.sql}")
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "tsvector_concat"

  def eval2(a: Any, b: Any): GenericArrayData = {
    val (av, bv) = (a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      b.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
    val m = new java.util.TreeMap[String, java.util.TreeSet[Integer]]()
    var maxpos = 0
    var i = 0
    while (i < av.numElements) {
      val e = av.getStruct(i, 2)
      val lex = e.getUTF8String(0).toString
      val ps = e.getArray(1)
      var set = m.get(lex)
      if (set == null) { set = new java.util.TreeSet[Integer](); m.put(lex, set) }
      var j = 0
      while (j < ps.numElements) {
        val p = ps.getInt(j)
        if (p > maxpos) maxpos = p
        set.add(p); j += 1
      }
      i += 1
    }
    i = 0
    while (i < bv.numElements) {
      val e = bv.getStruct(i, 2)
      val lex = e.getUTF8String(0).toString
      val ps = e.getArray(1)
      var set = m.get(lex)
      if (set == null) { set = new java.util.TreeSet[Integer](); m.put(lex, set) }
      var j = 0
      while (j < ps.numElements) {
        if (set.size < 256) set.add(math.min(ps.getInt(j) + maxpos, 16383))
        j += 1
      }
      i += 1
    }
    val out = new Array[Any](m.size)
    val it = m.entrySet().iterator()
    var k = 0
    while (it.hasNext) {
      val e = it.next()
      val arr = new Array[Any](e.getValue.size)
      val pit = e.getValue.iterator()
      var x = 0
      while (pit.hasNext) { arr(x) = pit.next().intValue; x += 1 }
      out(k) = new GenericInternalRow(Array[Any](
        UTF8String.fromString(e.getKey), new GenericArrayData(arr)))
      k += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(a: Any, b: Any): Any = eval2(a, b)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("tsvConcat", this, classOf[TsvConcat].getName)
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $ref.eval2($a, $b);")
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object ParseTsVector {
  /** The engine's tsvector layout — identical to [[TsVector]]'s. */
  val tsvType: DataType = ArrayType(StructType(Seq(
    StructField("lex", StringType, nullable = false),
    StructField("positions", ArrayType(IntegerType, containsNull = false),
      nullable = false))), containsNull = false)

  /** Is this the tsvector struct-array layout? (dispatch test) */
  def isTsv(t: DataType): Boolean = t match {
    case ArrayType(st: StructType, _) =>
      st.fieldNames.sameElements(Array("lex", "positions"))
    case _ => false
  }
}
