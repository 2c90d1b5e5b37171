package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Vector text I/O (reference: contrib/datavec/sql/datavec--0.7.2.sql:8-23
 * vector_in/vector_out; :763 sparsevec_in — '{i:v,...}/dim').
 *
 * Dense format: '[1,2,3]' — comma separated, whitespace tolerated on
 * input. Sparse format: '{i:v,...}/dim' with 1-BASED indices in the
 * text form (the reference's convention); parsed structs carry 0-based
 * ascending indices to match the rest of the graft sparse surface.
 *
 * Output formatting uses Java's shortest-round-trip float string —
 * parse(format(v)) == v exactly, which is the property queries rely
 * on; the reference prints %g with FLT_DIG digits instead, so the text
 * differs cosmetically (e.g. "1.0" vs "1") but never in value.
 */

/** Shared strict element grammar for the vector text forms: the
  * reference parses with strtof then REJECTS what Java's parseFloat
  * would quietly accept (ref test battery datavec/test/expected/
  * vector_type.out:34-49,65-73 — literal NaN "not allowed", literal
  * ±Infinity "not allowed", decimal overflow "out of range"; Java
  * extras like "1f" or hex floats are plain syntax errors).
  * Underflow flushes to ±0 exactly like strtof (:74-85). */
private[functions] object VecText {
  private val FloatRx =
    java.util.regex.Pattern.compile(
      "[+-]?(\\d+(\\.\\d*)?|\\.\\d+)([eE][+-]?\\d+)?")
  val MaxDim = 16000 // vector.h:4 VECTOR_MAX_DIM (= HALFVEC_MAX_DIM)

  def parseElem(raw: String, whole: String, typ: String): Float = {
    val t = raw.trim
    if (FloatRx.matcher(t).matches()) {
      val f = java.lang.Float.parseFloat(t)
      if (f.isInfinite)
        throw new IllegalArgumentException(
          s"""graft: "$t" is out of range for type $typ""")
      // fp16 admission belongs to the halfvec PARSE (halfvec.cpp:252
      // renders the original token text, not the parsed float — the
      // reference says `"65520" is out of range`, never "65520.0")
      if (typ == "halfvec" && !f.isNaN &&
          (HalfFloat.fromFloat(f) & 0x7fff) == 0x7c00)
        throw new IllegalArgumentException(
          s"""graft: "$t" is out of range for type $typ""")
      f
    } else {
      val l = t.toLowerCase
      if (l == "nan" || l == "+nan" || l == "-nan")
        throw new IllegalArgumentException(
          s"graft: NaN not allowed in $typ")
      else if (Set("inf", "infinity", "+inf", "+infinity", "-inf",
          "-infinity")(l))
        throw new IllegalArgumentException(
          s"graft: infinite value not allowed in $typ")
      else
        throw new IllegalArgumentException(
          s"graft: invalid input syntax for type $typ: $whole")
    }
  }
}

/** parse_vector('[1,2,3]') → array<float>. Malformed input throws,
  * with the reference's admission rules (see [[VecText]]; empty and
  * >16000-dim vectors rejected like vector_in). `typ` names the type
  * in every error — halfvec_in reports "halfvec", not "vector"
  * (halfvec.cpp CheckElement), and adds the fp16 range admission. */
case class ParseVector(child: Expression, typ: String = "vector")
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = s"parse_$typ"
  override def nullSafeEval(a: Any): Any = {
    val s = a.asInstanceOf[UTF8String].toString.trim
    if (s.length < 2 || s.charAt(0) != '[' || s.charAt(s.length - 1) != ']')
      throw new IllegalArgumentException(
        s"graft: malformed $typ literal (expected '[v1,v2,...]'): $s")
    val body = s.substring(1, s.length - 1).trim
    if (body.isEmpty)
      throw new IllegalArgumentException(
        s"graft: $typ must have at least 1 dimension")
    val parts = body.split(",", -1) // -1: keep trailing empties ("[1,]" must reject)
    if (parts.length > VecText.MaxDim)
      throw new IllegalArgumentException(
        s"graft: $typ cannot have more than ${VecText.MaxDim} dimensions")
    val out = new Array[Float](parts.length)
    var i = 0
    while (i < parts.length) {
      out(i) = VecText.parseElem(parts(i), s, typ)
      i += 1
    }
    new GenericArrayData(out)
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** vector_to_string(array<float>) → '[v1,v2,...]' (shortest round-trip). */
case class VectorToString(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "vector_to_string"
  override def nullSafeEval(a: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val sb = new java.lang.StringBuilder(2 + 10 * n)
    sb.append('[')
    var i = 0
    while (i < n) {
      if (i > 0) sb.append(',')
      sb.append(arr.getFloat(i))
      i += 1
    }
    sb.append(']')
    UTF8String.fromString(sb.toString)
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object SparseVectorType {
  val schema: StructType = StructType(Seq(
    StructField("indices", ArrayType(IntegerType, containsNull = false), nullable = false),
    StructField("values", ArrayType(FloatType, containsNull = false), nullable = false),
    StructField("dim", IntegerType, nullable = false)))
}

/**
 * parse_sparsevec('{1:1.5,3:2}/5') → struct(indices, values, dim) with
 * 0-based ascending indices. Requires strictly ascending 1-based input
 * indices within [1, dim] (the reference rejects unsorted/out-of-range
 * input too); malformed input throws.
 */
case class ParseSparseVector(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = SparseVectorType.schema
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "parse_sparsevec"
  override def nullSafeEval(a: Any): Any = {
    val s = a.asInstanceOf[UTF8String].toString.trim
    val slash = s.lastIndexOf('/')
    if (s.isEmpty || s.charAt(0) != '{' || slash < 0 ||
        s.lastIndexOf('}') != slash - 1)
      throw new IllegalArgumentException(
        s"graft: malformed sparsevec literal (expected '{i:v,...}/dim'): $s")
    val dim =
      try Integer.parseInt(s.substring(slash + 1).trim)
      catch {
        case _: NumberFormatException =>
          throw new IllegalArgumentException(s"graft: malformed sparsevec dim in: $s")
      }
    // sparsevec.h:4 SPARSEVEC_MAX_DIM 1e9; zero-dim rejected like
    // the dense type
    if (dim < 1)
      throw new IllegalArgumentException(
        "graft: sparsevec must have at least 1 dimension")
    if (dim > 1000000000)
      throw new IllegalArgumentException(
        "graft: sparsevec cannot have more than 1000000000 dimensions")
    val body = s.substring(1, slash - 1).trim
    val (idx, vals) =
      if (body.isEmpty) (Array.emptyIntArray, Array.emptyFloatArray)
      else {
        val parts = body.split(",", -1) // -1: keep trailing empties ("[1,]" must reject)
        val ii = new Array[Int](parts.length)
        val vv = new Array[Float](parts.length)
        var i = 0
        while (i < parts.length) {
          val kv = parts(i).split(":", 2)
          if (kv.length != 2)
            throw new IllegalArgumentException(
              s"graft: malformed sparsevec entry '${parts(i)}' in: $s")
          try ii(i) = Integer.parseInt(kv(0).trim) - 1 // text is 1-based
          catch {
            case _: NumberFormatException =>
              throw new IllegalArgumentException(
                s"graft: malformed sparsevec entry '${parts(i)}' in: $s")
          }
          vv(i) = VecText.parseElem(kv(1), s, "sparsevec")
          if (ii(i) < 0 || ii(i) >= dim)
            throw new IllegalArgumentException(
              s"graft: sparsevec index ${ii(i) + 1} out of range 1..$dim in: $s")
          if (i > 0 && ii(i) <= ii(i - 1))
            throw new IllegalArgumentException(
              s"graft: sparsevec indices must be strictly ascending in: $s")
          i += 1
        }
        // the reference DROPS explicit zeros at parse (sparsevec.out:
        // 160-164 — '{1:0,2:1,3:0}/3' reads back as '{2:1}/3'), so a
        // stored sparsevec never carries zero entries
        val nz = vv.count(_ != 0f)
        if (nz == vv.length) (ii, vv)
        else {
          val ci = new Array[Int](nz); val cv = new Array[Float](nz)
          var k = 0; var j = 0
          while (j < vv.length) {
            if (vv(j) != 0f) { ci(k) = ii(j); cv(k) = vv(j); k += 1 }
            j += 1
          }
          (ci, cv)
        }
      }
    InternalRow(new GenericArrayData(idx), new GenericArrayData(vals), dim)
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/**
 * Dimension enforcement — the analogue of the reference's typmod check
 * on `vector(n)` columns (ref: sql 0.7.2 vector_typmod_in; inserts of
 * wrong-dimension vectors error). Returns the vector unchanged or
 * throws, so pipelines put it at ingest boundaries.
 */
case class AssertDims(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = left.dataType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "assert_dims"
  override def nullSafeEval(v: Any, d: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val dim = d.asInstanceOf[Int]
    if (arr.numElements() != dim)
      throw new IllegalArgumentException(
        s"graft: expected vector($dim), got ${arr.numElements()} dimensions")
    arr
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/**
 * sparsevec_to_vector: scatter (indices, values) into a dense
 * array<float> of `dim` zeros (ref: sparsevec.cpp sparsevec_to_vector).
 */
case class SparseToDense(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "sparsevec_to_vector"
  override def nullSafeEval(idxA: Any, valA: Any, dimA: Any): Any = {
    val idx = idxA.asInstanceOf[ArrayData]
    val vals = valA.asInstanceOf[ArrayData]
    val dim = dimA.asInstanceOf[Int]
    val out = new Array[Float](dim)
    var i = 0
    while (i < idx.numElements()) {
      val p = idx.getInt(i)
      if (p < 0 || p >= dim)
        throw new IllegalArgumentException(
          s"graft: sparsevec index $p out of range 0..${dim - 1}")
      out(p) = vals.getFloat(i)
      i += 1
    }
    new GenericArrayData(out)
  }
  override protected def withNewChildrenInternal(f: Expression, s: Expression, t: Expression): Expression =
    copy(first = f, second = s, third = t)
}

/**
 * Feature-hashed dense fold of a sparsevec (the hashing trick):
 * out[i mod dim] += v, double accumulation in entry order, cast to
 * float per slot. ONE pass over the entries — the equivalent HOF
 * spelling (transform over a sequence × aggregate) walks every
 * accumulator slot per entry (dim× the work, interpreted). Used by
 * the sparsevec_l2_ops index BUILD (candidate-generation proxy only:
 * the statement's exact sparse merge-scan reranks, so fold collisions
 * never affect results at full probe).
 */
case class SparseProxyFold(left: Expression, right: Expression, dim: Int)
    extends BinaryExpression with CodegenFallback {
  require(dim >= 1, "graft: proxy dim must be >= 1")
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "sparse_proxy_fold"
  override def nullSafeEval(idxA: Any, valA: Any): Any = {
    val idx = idxA.asInstanceOf[ArrayData]
    val vals = valA.asInstanceOf[ArrayData]
    val acc = new Array[Double](dim)
    var k = 0
    val n = idx.numElements()
    while (k < n) {
      acc(((idx.getInt(k) % dim) + dim) % dim) += vals.getFloat(k).toDouble
      k += 1
    }
    new GenericArrayData(acc.map(_.toFloat))
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/**
 * sparsevec_cmp: lexicographic compare of two sparse vectors AS IF
 * dense (absent entries are exact zeros), then by dim — the same order
 * vector_cmp gives on their dense forms (ref: sparsevec.cpp
 * sparsevec_cmp). Merge-scan over the index lists; never densifies.
 */
case class SparseVectorCompare(aIdx: Expression, aVal: Expression,
    bIdx: Expression, bVal: Expression, aDim: Expression, bDim: Expression)
    extends Expression with CodegenFallback {
  override def children: Seq[Expression] = Seq(aIdx, aVal, bIdx, bVal, aDim, bDim)
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = children.exists(_.nullable)
  override def prettyName: String = "sparsevec_cmp"
  override def eval(input: InternalRow): Any = {
    val vs = children.map(_.eval(input))
    if (vs.exists(_ == null)) return null
    val Seq(ai, av, bi, bv, adO, bdO) = vs
    val aIdxD = ai.asInstanceOf[ArrayData]; val aValD = av.asInstanceOf[ArrayData]
    val bIdxD = bi.asInstanceOf[ArrayData]; val bValD = bv.asInstanceOf[ArrayData]
    val ad = adO.asInstanceOf[Int]; val bd = bdO.asInstanceOf[Int]
    val shared = math.min(ad, bd)
    var i = 0; var j = 0
    while (i < aIdxD.numElements() || j < bIdxD.numElements()) {
      val ia = if (i < aIdxD.numElements()) aIdxD.getInt(i) else Int.MaxValue
      val ib = if (j < bIdxD.numElements()) bIdxD.getInt(j) else Int.MaxValue
      val pos = math.min(ia, ib)
      if (pos >= shared) {
        // a nonzero past the shorter vector's dim decides like a
        // dense compare of unequal lengths: prefix equal → shorter first
        return Integer.compare(ad, bd) match {
          case 0 =>
            val va = if (ia == pos) aValD.getFloat(i) else 0f
            val vb = if (ib == pos) bValD.getFloat(j) else 0f
            java.lang.Float.compare(va, vb).sign
          case c => c.sign
        }
      }
      val va = if (ia == pos) aValD.getFloat(i) else 0f
      val vb = if (ib == pos) bValD.getFloat(j) else 0f
      val c = java.lang.Float.compare(va, vb)
      if (c != 0) return c.sign
      if (ia == pos) i += 1
      if (ib == pos) j += 1
    }
    Integer.compare(ad, bd).sign
  }
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): Expression =
    copy(aIdx = cs(0), aVal = cs(1), bIdx = cs(2), bVal = cs(3), aDim = cs(4), bDim = cs(5))
}

/** sparsevec_to_string(indices(0-based), values, dim) → '{i:v,...}/dim'. */
case class SparseVectorToString(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "sparsevec_to_string"
  override def nullSafeEval(idxA: Any, valA: Any, dimA: Any): Any = {
    val idx = idxA.asInstanceOf[ArrayData]
    val vals = valA.asInstanceOf[ArrayData]
    val dim = dimA.asInstanceOf[Int]
    if (idx.numElements() != vals.numElements())
      throw new IllegalArgumentException(
        s"graft: sparsevec indices/values lengths differ: " +
          s"${idx.numElements()} vs ${vals.numElements()}")
    val n = idx.numElements()
    val sb = new java.lang.StringBuilder(4 + 12 * n)
    sb.append('{')
    var i = 0
    while (i < n) {
      if (i > 0) sb.append(',')
      sb.append(idx.getInt(i) + 1).append(':').append(vals.getFloat(i))
      i += 1
    }
    sb.append("}/").append(dim)
    UTF8String.fromString(sb.toString)
  }
  override protected def withNewChildrenInternal(f: Expression, s: Expression, t: Expression): Expression =
    copy(first = f, second = s, third = t)
}
