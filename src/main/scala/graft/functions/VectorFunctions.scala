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
  /** packed fp16 bytes -> array<float> (exact decode; codec read side). */
  def unpackHalf(a: Column): Column = lift(UnpackHalf(ex(a)))
  /** Distance directly over packed-fp16 vectors (no unpack materialized). */
  def packedHalfDistance(a: Column, b: Column, metric: String): Column =
    lift(PackedHalfDistance(ex(a), ex(b), metric))

  /** Sparse vector distance over (indices sorted asc, values) pairs. */
  def sparseDistance(aIdx: Column, aVal: Column, bIdx: Column, bVal: Column,
      metric: String): Column =
    lift(SparseVectorDistance(
      ex(aIdx.cast("array<int>")), ex(aVal.cast("array<float>")),
      ex(bIdx.cast("array<int>")), ex(bVal.cast("array<float>")), metric))

  // --- sparsevec norms (ref: sparsevec.cpp sparsevec_l2_norm /
  // sparsevec_l2_normalize, sql:787-830): absent entries are exact
  // zeros, so norms reduce to the stored values ---
  /** sparsevec l2 norm over the stored values. */
  def sparseL2Norm(values: Column): Column = l2Norm(values)
  /** sparsevec l2_normalize: normalized values (indices unchanged). */
  def sparseL2Normalize(values: Column): Column = l2Normalize(values)

  // --- vector text I/O (ref: sql:8-23 vector_in/vector_out, :763
  // sparsevec_in '{i:v,...}/dim') ---
  /** parse_vector('[1,2,3]') → array<float>. */
  def parseVector(s: Column): Column = lift(ParseVector(ex(s)))
  /** vector_to_string: '[v1,v2,...]' (shortest round-trip formatting). */
  def vectorToString(v: Column): Column = lift(VectorToString(ex(vec(v))))
  /** parse_sparsevec('{1:1.5}/5') → struct(indices 0-based, values, dim). */
  def parseSparsevec(s: Column): Column = lift(ParseSparseVector(ex(s)))
  /** sparsevec_to_string(indices 0-based, values, dim) → '{i:v,...}/dim'. */
  def sparsevecToString(idx: Column, vals: Column, dim: Column): Column =
    lift(SparseVectorToString(ex(idx.cast("array<int>")),
      ex(vals.cast("array<float>")), ex(dim.cast("int"))))

  // --- type conversions + comparisons (ref: sql 0.7.2
  // vector_to_sparsevec / sparsevec_to_vector / halfvec_cmp /
  // sparsevec_cmp; casts between the three vector types) ---
  /** vector_to_sparsevec: keep nonzero entries as (indices asc, values). */
  def toSparse(v: Column): Column = {
    val kept = filter(transform(vec(v), (x, i) => struct(i.as("i"), x.as("v"))),
      t => t.getField("v") =!= 0f)
    struct(transform(kept, t => t.getField("i")).as("indices"),
      transform(kept, t => t.getField("v")).as("values"),
      size(v).as("dim"))
  }
  /** sparsevec_to_vector: scatter into a dense zero array. */
  def sparseToDense(idx: Column, vals: Column, dim: Column): Column =
    lift(SparseToDense(ex(idx.cast("array<int>")),
      ex(vals.cast("array<float>")), ex(dim.cast("int"))))
  /** halfvec_cmp: lexicographic compare on the fp16 grid. */
  def halfvecCmp(a: Column, b: Column): Column =
    vectorCmp(halfvec(a), halfvec(b))
  /** vector(n) typmod analogue: pass through or throw on wrong dims. */
  def assertDims(v: Column, dims: Int): Column =
    lift(AssertDims(ex(vec(v)), ex(lit(dims))))
  /** sparsevec_cmp: dense-order compare without densifying. */
  def sparseCmp(aIdx: Column, aVal: Column, bIdx: Column, bVal: Column,
      aDim: Column, bDim: Column): Column =
    lift(SparseVectorCompare(
      ex(aIdx.cast("array<int>")), ex(aVal.cast("array<float>")),
      ex(bIdx.cast("array<int>")), ex(bVal.cast("array<float>")),
      ex(aDim.cast("int")), ex(bDim.cast("int"))))

  // --- halfvec aggregates (ref: sql:505-530 avg/sum(halfvec) via
  // halfvec_accum: accumulate in float8, emit back on the fp16 grid) ---
  /** avg(halfvec): fp64 accumulation over fp16-grid inputs, fp16 result. */
  def halfvecAvg(c: Column): Column =
    halfvec(VectorAggregates.vecAvg(halfvec(c)))
  /** sum(halfvec): fp64 accumulation over fp16-grid inputs, fp16 result. */
  def halfvecSum(c: Column): Column =
    halfvec(VectorAggregates.vecSum(halfvec(c)))

  // --- elementwise arithmetic (ref: vector.cpp vector_add/sub/mul) ---
  // fp32 math like the reference: operate on float elements, keep
  // float — WITH the reference's admission semantics
  // (vector_type.out:183-208): dimension mismatch errors (zip_with
  // would silently null-pad), a finite-input op producing ±Inf is
  // "overflow", and a nonzero×nonzero product collapsing to 0 is
  // "underflow".
  private val FInf = Float.PositiveInfinity
  // both checks live INSIDE the zip lambda so each operand expression
  // evaluates exactly once per row (a wrapper re-referencing the
  // operands would re-run nested composite arithmetic up to 3× per
  // level). The element arrays are containsNull = false by type, so a
  // null element can only be zip_with's length padding — i.e. the
  // reference's "different vector dimensions" error.
  private def checked(x: Column, y: Column, r: Column): Column =
    when(x.isNull || y.isNull,
      raise_error(lit("graft: different vector dimensions"))
        .cast("float"))
      .when(abs(r) === lit(FInf) && abs(x) =!= lit(FInf) && abs(y) =!= lit(FInf),
        raise_error(lit("graft: value out of range: overflow")).cast("float"))
      .otherwise(r)
  /** vector_add: elementwise a+b. */
  def vectorAdd(a: Column, b: Column): Column =
    zip_with(vec(a), vec(b), (x, y) => checked(x, y, (x + y).cast("float")))
  /** vector_sub: elementwise a-b. */
  def vectorSub(a: Column, b: Column): Column =
    zip_with(vec(a), vec(b), (x, y) => checked(x, y, (x - y).cast("float")))
  /** vector_mul: elementwise a*b (underflow checked like the ref). */
  def vectorMul(a: Column, b: Column): Column =
    zip_with(vec(a), vec(b), (x, y) => {
      val r = (x * y).cast("float")
      when(x.isNotNull && y.isNotNull &&
          r === lit(0f) && x =!= lit(0f) && y =!= lit(0f),
        raise_error(lit("graft: value out of range: underflow")).cast("float"))
        .otherwise(checked(x, y, r))
    })
  /** halfvec_in: the halfvec text form composes the dense grammar
    * with the fp16 admission (halfvec.out:54-64 — "[65520]" is out
    * of range at parse even though it is a valid fp32). The parse is
    * halfvec-TYPED so every admission error names halfvec and renders
    * the original token text ("65520", not 65520.0 — halfvec.cpp
    * CheckElement / :252), then rounds through binary16. */
  def parseHalfvec(c: Column): Column = halfvec(lift(ParseVector(ex(c), "halfvec")))

  /** vector_concat. */
  def vectorConcat(a: Column, b: Column): Column = concat(vec(a), vec(b))
  /** subvector(v, start(1-based), count) (ref: vector.cpp subvector). */
  def subvector(a: Column, start: Int, count: Int): Column =
    slice(vec(a), start, count)

  /**
   * Scalar (int8) quantization — the compression tier between halfvec
   * (A18) and binary_quantize (A12): code = round((x−lo)/(hi−lo)·254 −
   * 127) ∈ [−127, 127] against a corpus-wide [lo, hi] range (pgvector
   * 0.7's scalar-quantized index storage shape; the reference's
   * datavec stops at fp16 + bit — this extends the same axis).
   * 4× smaller than fp32, and quantized L2 is pure INTEGER arithmetic:
   * dist²(a, b) = Σ(qa−qb)² scaled by ((hi−lo)/254)² — so rankings
   * are engine-exact with no float tolerance at all.
   */
  def int8Quantize(v: Column, lo: Column, hi: Column): Column =
    transform(vec(v), x =>
      round((x.cast("double") - lo) / (hi - lo) * 254 - 127, 0).cast("int"))

  /** Integer squared L2 between two int8 code arrays. */
  def int8DistSq(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => ((x - y) * (x - y)).cast("long")),
      lit(0L), (acc, v) => acc + v)
}
