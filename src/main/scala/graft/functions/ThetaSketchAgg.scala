package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

/**
 * Theta/KMV sketch (k minimum values; public design: Beyer et al.
 * "On Synopses for Distinct-Value Estimation", the Theta-sketch family)
 * — the mergeable distinct-count sketch that, unlike HyperLogLog
 * (`approx_count_distinct`), supports SET OPERATIONS: intersection and
 * union cardinalities across group sketches, the "how many users did
 * BOTH" question a training-data/analytics pipeline asks constantly.
 *
 * State = the k smallest distinct 64-bit hashes (unsigned order via a
 * sign-bit flip, so plain signed compares work everywhere, SQL
 * included). Below k distinct values the sketch is EXACT (theta = max:
 * the estimate is the retained count itself — which is what makes a
 * hash-exact driver gate possible); saturated, theta = the k-th
 * smallest hash and |retained| / P(theta) estimates the cardinality
 * with relative error ~1/√(k−2). The k-smallest SET is a pure function
 * of the input set — merge order and partitioning cannot change it, so
 * results are deterministic at any parallelism (spec-asserted).
 *
 * Set-op estimators are plain Column arithmetic over the sketch struct
 * (no UDF): retained sets intersect/union below min(theta), divided by
 * P(min theta).
 */
final class ThetaBuffer(val k: Int) {
  private var arr = new Array[Long](math.max(4, 2 * k))
  private var n = 0
  private var saturatedMax = Long.MaxValue // k-th smallest once saturated
  private var compacted = true

  def add(flipped: Long): Unit = {
    if (n == arr.length) compact()
    if (flipped < saturatedMax) { arr(n) = flipped; n += 1; compacted = false }
  }

  /** Sort, dedupe, truncate to the k smallest distinct hashes. */
  def compact(): Unit = if (!compacted) {
    java.util.Arrays.sort(arr, 0, n)
    var o = 0
    var i = 0
    while (i < n && o < k) {
      if (o == 0 || arr(i) != arr(o - 1)) { arr(o) = arr(i); o += 1 }
      i += 1
    }
    n = o
    if (n == k) saturatedMax = arr(k - 1)
    compacted = true
  }

  def mergeFrom(o: ThetaBuffer): Unit = {
    o.compact()
    var i = 0
    while (i < o.n) { add(o.arr(i)); i += 1 }
  }

  /** (theta, retained-below-theta ascending). Exact mode: theta = MAX. */
  def result(): (Long, Array[Long]) = {
    compact()
    if (n < k) (Long.MaxValue, java.util.Arrays.copyOf(arr, n))
    else (arr(k - 1), java.util.Arrays.copyOf(arr, k - 1))
  }

  def serializedSize: Int = { compact(); 4 + 4 + 8 * n }
  def writeTo(bb: java.nio.ByteBuffer): Unit = {
    bb.putInt(k).putInt(n)
    var i = 0
    while (i < n) { bb.putLong(arr(i)); i += 1 }
  }
  def readFrom(bb: java.nio.ByteBuffer, count: Int): Unit = {
    var i = 0
    while (i < count) { arr(i) = bb.getLong(); i += 1 }
    n = count
    compacted = false
    compact()
  }
}

/** theta sketch per group: struct(k, theta, hashes). Mergeable partials
  * (map-side combine), bounded O(k) buffer, flat serialization. */
case class ThetaSketchAgg(child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[ThetaBuffer] with UnaryLike[Expression] {
  require(k >= 16, "graft: theta sketch needs k >= 16")

  override def prettyName: String = "theta_sketch"
  override def nullable: Boolean = false
  override def dataType: DataType = ThetaSketch.sketchType

  override def createAggregationBuffer(): ThetaBuffer = new ThetaBuffer(k)

  override def update(b: ThetaBuffer, input: InternalRow): ThetaBuffer = {
    val v = child.eval(input) // already a 64-bit hash (see ThetaSketch.sketch)
    if (v != null) b.add(v.asInstanceOf[Long] ^ Long.MinValue)
    b
  }

  override def merge(b: ThetaBuffer, o: ThetaBuffer): ThetaBuffer = {
    b.mergeFrom(o); b
  }

  override def eval(b: ThetaBuffer): Any = {
    val (theta, hs) = b.result()
    InternalRow(k, theta, new GenericArrayData(hs))
  }

  override def serialize(b: ThetaBuffer): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(b.serializedSize)
    b.writeTo(bb)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): ThetaBuffer = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val b = new ThetaBuffer(bb.getInt())
    b.readFrom(bb, bb.getInt())
    b
  }

  override def withNewMutableAggBufferOffset(o: Int): ThetaSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): ThetaSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): ThetaSketchAgg =
    copy(child = c)
}

object ThetaSketch {
  val sketchType: StructType = StructType(Seq(
    StructField("k", IntegerType, nullable = false),
    StructField("theta", LongType, nullable = false),
    StructField("hashes", ArrayType(LongType, containsNull = false),
      nullable = false)))

  /** Sketch aggregate over any column (xxhash64 inside; 64-bit hash
    * collisions are the usual ~n²/2⁶⁴ caveat). NULLs don't count:
    * xxhash64 of a null input returns its SEED, not null, so the null
    * must be filtered before hashing. */
  def sketch(c: Column, k: Int = 4096): Column =
    Bridge.column(ThetaSketchAgg(
      Bridge.expression(when(c.isNull, lit(null)).otherwise(xxhash64(c))),
      k).toAggregateExpression())

  /** P(theta): the fraction of hash space below theta. Exact-mode
    * theta (= Long.MaxValue) gives 1.0, so every estimator below
    * degrades to the exact retained count without a branch. */
  private def pFrac(theta: Column): Column =
    (theta.cast("double") + lit(9.223372036854776e18)) /
      lit(1.8446744073709552e19)

  /** Distinct-count estimate (exact while the group had < k values). */
  def estimate(sk: Column): Column =
    size(sk.getField("hashes")).cast("double") / pFrac(sk.getField("theta"))

  /** |A ∩ B| estimate: common retained hashes below min theta. */
  def intersectionEstimate(a: Column, b: Column): Column = {
    val th = least(a.getField("theta"), b.getField("theta"))
    size(filter(array_intersect(a.getField("hashes"), b.getField("hashes")),
      h => h < th)).cast("double") / pFrac(th)
  }

  /** |A ∪ B| estimate: distinct union of retained hashes below min
    * theta (KMV union with the combined retained set). */
  def unionEstimate(a: Column, b: Column): Column = {
    val th = least(a.getField("theta"), b.getField("theta"))
    size(filter(array_union(a.getField("hashes"), b.getField("hashes")),
      h => h < th)).cast("double") / pFrac(th)
  }
}
