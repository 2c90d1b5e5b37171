package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.functions._

/**
 * Public Column facade over the graft vector kernel — the Spark-side
 * equivalent of the operator surface in the reference's datavec extension
 * (reference: contrib/datavec/sql/datavec--0.7.2.sql).
 *
 * `vector` = array<float>. Inputs are cast to array<float> here so callers
 * can pass array<double> literals or parquet float arrays alike.
 */
object VectorFunctions {
  private def lift(e: Expression): Column = Bridge.column(e)
  private def vec(c: Column): Column = c.cast("array<float>")
  private def ex(c: Column): Expression = Bridge.expression(c)

  private def dist(metric: String)(a: Column, b: Column): Column =
    lift(VectorDistance(ex(vec(a)), ex(vec(b)), metric))

  /** `<->` l2 distance (ref: vector.cpp l2_distance). */
  val l2Distance: (Column, Column) => Column = dist(VectorMetrics.L2)
  /** l2_squared_distance. */
  val l2SquaredDistance: (Column, Column) => Column = dist(VectorMetrics.L2Sq)
  /** inner_product. */
  val innerProduct: (Column, Column) => Column = dist(VectorMetrics.Ip)
  /** `<#>` negative inner product (ORDER BY-friendly). */
  val negInnerProduct: (Column, Column) => Column = dist(VectorMetrics.NegIp)
  /** `<=>` cosine distance. */
  val cosineDistance: (Column, Column) => Column = dist(VectorMetrics.Cosine)
  /** `<+>` l1 distance. */
  val l1Distance: (Column, Column) => Column = dist(VectorMetrics.L1)
  /** spherical_distance (acos(ip)/pi over unit vectors). */
  val sphericalDistance: (Column, Column) => Column = dist(VectorMetrics.Spherical)

  /** vector_norm / l2 norm. */
  def l2Norm(a: Column): Column = lift(VectorL2Norm(ex(vec(a))))
  /** l2_normalize → array<double> (cast to array<float> for storage parity). */
  def l2Normalize(a: Column): Column = lift(VectorL2Normalize(ex(vec(a))))
  /** vector_dims. */
  def vectorDims(a: Column): Column = size(a)
  /** halfvec emulation: round-trip fp32 through IEEE binary16. */
  def halfvec(a: Column): Column = lift(HalfVecRoundTrip(ex(vec(a))))
  /** binary_quantize → packed bit string (MSB-first, like varbit). */
  def binaryQuantize(a: Column): Column = lift(BinaryQuantize(ex(vec(a))))
  /** hamming_distance over packed bit strings. */
  def hammingDistance(a: Column, b: Column): Column =
    lift(BitDistance(ex(a), ex(b), "hamming"))
  /** jaccard_distance over packed bit strings. */
  def jaccardDistance(a: Column, b: Column): Column =
    lift(BitDistance(ex(a), ex(b), "jaccard"))
  /** vector_cmp: lexicographic -1/0/1 (ref: vector.cpp vector_cmp). */
  def vectorCmp(a: Column, b: Column): Column =
    lift(VectorCompare(ex(vec(a)), ex(vec(b))))

  // --- halfvec composite ops (ref: halfvec_add/sub/mul/concat/avg are
  // fp16 arithmetic: operate on the fp16 grid, re-quantize the result) ---
  /** halfvec_add. */
  def halfvecAdd(a: Column, b: Column): Column =
    halfvec(vectorAdd(halfvec(a), halfvec(b)))
  /** halfvec_sub. */
  def halfvecSub(a: Column, b: Column): Column =
    halfvec(vectorSub(halfvec(a), halfvec(b)))
  /** halfvec_mul. */
  def halfvecMul(a: Column, b: Column): Column =
    halfvec(vectorMul(halfvec(a), halfvec(b)))
  /** halfvec_concat. */
  def halfvecConcat(a: Column, b: Column): Column =
    vectorConcat(halfvec(a), halfvec(b))

  /** Pack fp32 vector into fp16 bytes (2 per element) — halfvec storage. */
  def packHalf(a: Column): Column = lift(PackHalf(ex(vec(a))))
  /** Distance directly over packed-fp16 vectors (no unpack materialized). */
  def packedHalfDistance(a: Column, b: Column, metric: String): Column =
    lift(PackedHalfDistance(ex(a), ex(b), metric))

  /** Sparse vector distance over (indices sorted asc, values) pairs. */
  def sparseDistance(aIdx: Column, aVal: Column, bIdx: Column, bVal: Column,
      metric: String): Column =
    lift(SparseVectorDistance(
      ex(aIdx.cast("array<int>")), ex(aVal.cast("array<float>")),
      ex(bIdx.cast("array<int>")), ex(bVal.cast("array<float>")), metric))

  // --- elementwise arithmetic (ref: vector.cpp vector_add/sub/mul) ---
  // fp32 math like the reference: operate on float elements, keep float.
  /** vector_add: elementwise a+b. */
  def vectorAdd(a: Column, b: Column): Column =
    zip_with(vec(a), vec(b), (x, y) => (x + y).cast("float"))
  /** vector_sub: elementwise a-b. */
  def vectorSub(a: Column, b: Column): Column =
    zip_with(vec(a), vec(b), (x, y) => (x - y).cast("float"))
  /** vector_mul: elementwise a*b. */
  def vectorMul(a: Column, b: Column): Column =
    zip_with(vec(a), vec(b), (x, y) => (x * y).cast("float"))
  /** vector_concat. */
  def vectorConcat(a: Column, b: Column): Column = concat(vec(a), vec(b))
  /** subvector(v, start(1-based), count) (ref: vector.cpp subvector). */
  def subvector(a: Column, start: Int, count: Int): Column =
    slice(vec(a), start, count)
}
