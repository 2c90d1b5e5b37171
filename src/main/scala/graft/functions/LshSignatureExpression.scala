package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/**
 * Random-hyperplane LSH band buckets in one compiled pass
 * (reference semantics: sign-bit signatures over Gaussian hyperplanes as
 * in the standard SimHash/RHP literature; the banding mirrors
 * graft.operators.Lsh).
 *
 * Replaces the higher-order-function formulation
 * (`transform(planes, dot>=0)` + `aggregate(slice(sig), acc*2+x)` —
 * Lsh.signature/bandBucket): those lambdas are interpreted per
 * hyperplane/per bit, the repo's measured 25-95x HOF penalty. Here the
 * nbits × dim dot products and the bit packing run in one JVM loop per
 * row.
 *
 * Output: array<long> of length `bands`; element b packs sign bits
 * [b*r, (b+1)*r) MSB-first — the exact values the HOF formulation
 * produced, so banded-join candidates are unchanged.
 *
 * Hyperplanes ride along as a flattened IndexedSeq (structural equality
 * keeps the expression canonicalizable); they are materialized to a
 * primitive array once per executor via a transient lazy val, not per
 * row.
 */
case class LshSignature(child: Expression, planesFlat: IndexedSeq[Float],
    dim: Int, bands: Int, r: Int)
    extends UnaryExpression with CodegenFallback {
  require(planesFlat.length == dim.toLong * bands * r,
    s"planesFlat must hold bands*r=${bands * r} planes of dim $dim")
  require(r >= 1 && r <= 63, "r must fit a long bucket")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "lsh_signature"

  @transient private lazy val planes: Array[Float] = planesFlat.toArray

  override def nullSafeEval(a: Any): Any = {
    val vec = a.asInstanceOf[ArrayData]
    require(vec.numElements() == dim,
      s"graft: lsh_signature expects dim-$dim vectors, got ${vec.numElements()}")
    val v = vec.toFloatArray()
    val out = new Array[Long](bands)
    val nbits = bands * r
    var bit = 0
    while (bit < nbits) {
      var dot = 0.0
      val base = bit * dim
      var i = 0
      while (i < dim) { dot += v(i).toDouble * planes(base + i).toDouble; i += 1 }
      if (dot >= 0.0) out(bit / r) |= 1L << (r - 1 - bit % r)
      bit += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
