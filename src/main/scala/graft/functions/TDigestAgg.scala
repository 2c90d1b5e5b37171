package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

/**
 * Merging t-digest (Dunning & Ertl, "Computing Extremely Accurate
 * Quantiles Using t-Digests") — the mergeable percentile sketch for the
 * 100 TB path. The EXACT `percentiles` query sorts inside each group,
 * so its parallelism is bounded by group count; this sketch aggregates
 * with map-side partials whose buffer is O(compression) centroids
 * regardless of input size, and partials merge associatively across
 * any partitioning. Rank error concentrates at ~1/compression around
 * the median and shrinks quadratically toward the tails (the k1 scale
 * function); min/max are tracked exactly.
 *
 * Buffer layout: merged centroid arrays (ascending means) plus a small
 * unmerged insert buffer, compressed on overflow — update cost is
 * amortized O(log n) sorts of tiny arrays, never an object graph.
 * serialize() flushes and writes flat primitives (16 bytes/centroid),
 * the same discipline as TopKPairsAgg.
 */
final class TDigestBuffer(val compression: Double) {
  private val bufCap = 512
  private val buf = new Array[Double](bufCap)
  private var bufN = 0
  var means: Array[Double] = Array.emptyDoubleArray
  var weights: Array[Double] = Array.emptyDoubleArray
  var total: Double = 0.0
  var lo: Double = Double.PositiveInfinity
  var hi: Double = Double.NegativeInfinity

  def add(v: Double): Unit = {
    if (bufN == bufCap) flush()
    buf(bufN) = v; bufN += 1
    if (v < lo) lo = v
    if (v > hi) hi = v
  }

  /** k1 scale function: equal k-steps give centroids ~uniform in k. */
  @inline private def k(q: Double): Double =
    compression / (2.0 * math.Pi) * math.asin(2.0 * math.min(1.0, math.max(0.0, q)) - 1.0)

  def flush(): Unit = if (bufN > 0) {
    val ms = java.util.Arrays.copyOf(buf, bufN)
    java.util.Arrays.sort(ms)
    mergeSorted(ms, Array.fill(bufN)(1.0))
    bufN = 0
  }

  /** Merge an ascending centroid run into the digest, then compress. */
  def mergeSorted(ms: Array[Double], ws: Array[Double]): Unit = {
    // two-pointer merge of ascending sequences
    val n = means.length + ms.length
    val am = new Array[Double](n); val aw = new Array[Double](n)
    var i = 0; var j = 0; var o = 0
    while (i < means.length || j < ms.length) {
      if (j >= ms.length || (i < means.length && means(i) <= ms(j))) {
        am(o) = means(i); aw(o) = weights(i); i += 1
      } else { am(o) = ms(j); aw(o) = ws(j); j += 1 }
      o += 1
    }
    val newTotal = total + ws.sum
    // single compress pass under the k1 size bound
    val om = new Array[Double](n); val ow = new Array[Double](n)
    var nc = 0
    var wSoFar = 0.0
    var curM = am(0); var curW = aw(0)
    var kLeft = k(0.0)
    var t = 1
    while (t < n) {
      val qRight = (wSoFar + curW + aw(t)) / newTotal
      if (k(qRight) - kLeft <= 1.0) {
        // absorb: weighted mean stays within the accumulating centroid
        curM += (am(t) - curM) * aw(t) / (curW + aw(t))
        curW += aw(t)
      } else {
        om(nc) = curM; ow(nc) = curW; nc += 1
        wSoFar += curW
        kLeft = k(wSoFar / newTotal)
        curM = am(t); curW = aw(t)
      }
      t += 1
    }
    om(nc) = curM; ow(nc) = curW; nc += 1
    means = java.util.Arrays.copyOf(om, nc)
    weights = java.util.Arrays.copyOf(ow, nc)
    total = newTotal
  }

  def mergeFrom(o: TDigestBuffer): Unit = {
    o.flush(); flush()
    if (o.means.nonEmpty) mergeSorted(o.means, o.weights)
    if (o.lo < lo) lo = o.lo
    if (o.hi > hi) hi = o.hi
  }

  /** Quantile estimate: linear interpolation between centroid midpoints,
   *  clamped to the exact min/max at the tails. */
  def quantile(q: Double): Double = {
    flush()
    if (total == 0.0) return Double.NaN
    if (means.length == 1) return means(0)
    val target = q * total
    // cumulative weight at centroid midpoints
    var cum = 0.0
    var prevMid = 0.0; var prevMean = lo
    var i = 0
    while (i < means.length) {
      val mid = cum + weights(i) / 2.0
      if (target < mid) {
        val span = mid - prevMid
        val frac = if (span <= 0) 0.0 else (target - prevMid) / span
        return prevMean + (means(i) - prevMean) * frac
      }
      cum += weights(i)
      prevMid = mid; prevMean = means(i)
      i += 1
    }
    // beyond the last midpoint: interpolate toward the exact max
    val span = total - prevMid
    val frac = if (span <= 0) 1.0 else (target - prevMid) / span
    math.min(hi, prevMean + (hi - prevMean) * frac)
  }

  def serializedSize: Int = { flush(); 8 * 4 + 4 + 16 * means.length }
}

/**
 * approx percentiles per group as a Catalyst TypedImperativeAggregate:
 * array<double>, one entry per requested quantile. Mergeable partials
 * (map-side combine applies), O(compression) buffer, flat-primitive
 * serialization. Approximate by design → rows-only gate + error-bound
 * spec (reference analogue: the percentile_approx family).
 */
case class TDigestAgg(child: Expression, percentages: Seq[Double],
    compression: Double = 100.0,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TDigestBuffer] with UnaryLike[Expression] {
  require(percentages.nonEmpty && percentages.forall(p => p >= 0 && p <= 1))

  override def prettyName: String = "tdigest_percentiles"
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def createAggregationBuffer(): TDigestBuffer =
    new TDigestBuffer(compression)

  override def update(b: TDigestBuffer, input: InternalRow): TDigestBuffer = {
    val v = child.eval(input)
    if (v != null) b.add(v.asInstanceOf[Double])
    b
  }

  override def merge(b: TDigestBuffer, o: TDigestBuffer): TDigestBuffer = {
    b.mergeFrom(o); b
  }

  override def eval(b: TDigestBuffer): Any =
    new GenericArrayData(percentages.map(b.quantile).toArray)

  override def serialize(b: TDigestBuffer): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(b.serializedSize)
    bb.putDouble(b.compression).putDouble(b.total).putDouble(b.lo).putDouble(b.hi)
    bb.putInt(b.means.length)
    var i = 0
    while (i < b.means.length) {
      bb.putDouble(b.means(i)).putDouble(b.weights(i)); i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TDigestBuffer = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val b = new TDigestBuffer(bb.getDouble())
    val total = bb.getDouble()
    b.lo = bb.getDouble(); b.hi = bb.getDouble()
    val n = bb.getInt()
    val ms = new Array[Double](n); val ws = new Array[Double](n)
    var i = 0
    while (i < n) { ms(i) = bb.getDouble(); ws(i) = bb.getDouble(); i += 1 }
    b.means = ms; b.weights = ws; b.total = total
    b
  }

  override def withNewMutableAggBufferOffset(o: Int): TDigestAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TDigestAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): TDigestAgg =
    copy(child = c)
}

object TDigest {
  /** approx percentiles column: array<double> aligned with `ps`. */
  def percentilesApprox(c: Column, ps: Seq[Double],
      compression: Double = 100.0): Column =
    Bridge.column(TDigestAgg(Bridge.expression(c.cast("double")), ps,
      compression).toAggregateExpression())
}
