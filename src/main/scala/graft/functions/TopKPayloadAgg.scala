package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.TernaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/**
 * [[TopKPairsBuffer]] variant that carries one extra long payload per
 * entry through the heap (the ordering is still (dist, id); the payload
 * just rides along). Exists so per-key top-k rankings that must emit an
 * auxiliary aggregate alongside the ranking key — e.g. BM25 retrieval's
 * matched-term count per (query, doc) — can use the bounded heap
 * instead of re-joining the ranked k rows back to the scored set (which
 * would execute the scoring pipeline twice).
 *
 * Memory: exactly k*(8+8+8) bytes per group; partial (map-side)
 * aggregation ships at most k entries per partition per group as a
 * flat 24-bytes-per-entry blob.
 */
final class TopKPayloadBuffer(val k: Int) {
  val ids = new Array[Long](k)
  val dists = new Array[Double](k)
  val payloads = new Array[Long](k)
  var size = 0

  /** a-entry worse than b-entry (larger dist, then larger id)? */
  @inline private def worse(da: Double, ia: Long, db: Double, ib: Long): Boolean = {
    val c = java.lang.Double.compare(da, db)
    c > 0 || (c == 0 && ia > ib)
  }

  @inline private def swap(i: Int, j: Int): Unit = {
    val td = dists(i); dists(i) = dists(j); dists(j) = td
    val ti = ids(i); ids(i) = ids(j); ids(j) = ti
    val tp = payloads(i); payloads(i) = payloads(j); payloads(j) = tp
  }

  private def siftUp(i0: Int): Unit = {
    var i = i0
    while (i > 0) {
      val p = (i - 1) / 2
      if (worse(dists(i), ids(i), dists(p), ids(p))) { swap(i, p); i = p }
      else return
    }
  }

  private def siftDown(): Unit = {
    var i = 0
    while (true) {
      val l = 2 * i + 1; val r = l + 1
      var m = i
      if (l < size && worse(dists(l), ids(l), dists(m), ids(m))) m = l
      if (r < size && worse(dists(r), ids(r), dists(m), ids(m))) m = r
      if (m == i) return
      swap(i, m)
      i = m
    }
  }

  def insert(id: Long, dist: Double, payload: Long): Unit = {
    if (size < k) {
      ids(size) = id; dists(size) = dist; payloads(size) = payload; size += 1
      siftUp(size - 1)
    } else if (k > 0 && worse(dists(0), ids(0), dist, id)) {
      ids(0) = id; dists(0) = dist; payloads(0) = payload
      siftDown()
    }
  }

  def mergeFrom(o: TopKPayloadBuffer): Unit = {
    var i = 0
    while (i < o.size) { insert(o.ids(i), o.dists(i), o.payloads(i)); i += 1 }
  }

  /** (id, dist, payload) sorted ascending by (dist, id) — best first. */
  def sorted(): Array[(Long, Double, Long)] = {
    val out = (0 until size).map(i => (ids(i), dists(i), payloads(i))).toArray
    java.util.Arrays.sort(out, new java.util.Comparator[(Long, Double, Long)] {
      override def compare(a: (Long, Double, Long), b: (Long, Double, Long)): Int = {
        val c = java.lang.Double.compare(a._2, b._2)
        if (c != 0) c else java.lang.Long.compare(a._1, b._1)
      }
    })
    out
  }
}

/**
 * Bounded top-k (id, dist, payload) per group — [[TopKPairsAgg]] with a
 * payload column. Output: array<struct<nid:long, dist:double,
 * payload:long>> ascending by (dist, id).
 */
case class TopKPayloadAgg(first: Expression, second: Expression,
    third: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKPayloadBuffer] with TernaryLike[Expression] {
  require(k > 0, "k must be positive")

  override def prettyName: String = "topk_payload"
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("nid", LongType, nullable = false),
    StructField("dist", DoubleType, nullable = false),
    StructField("payload", LongType, nullable = false))), containsNull = false)

  override def createAggregationBuffer(): TopKPayloadBuffer = new TopKPayloadBuffer(k)

  override def update(b: TopKPayloadBuffer, input: InternalRow): TopKPayloadBuffer = {
    val idv = first.eval(input)
    val dv = second.eval(input)
    val pv = third.eval(input)
    if (idv != null && dv != null && pv != null)
      b.insert(idv.asInstanceOf[Long], dv.asInstanceOf[Double],
        pv.asInstanceOf[Long])
    b
  }

  override def merge(b: TopKPayloadBuffer, o: TopKPayloadBuffer): TopKPayloadBuffer = {
    b.mergeFrom(o); b
  }

  override def eval(b: TopKPayloadBuffer): Any =
    new GenericArrayData(b.sorted().map { case (id, d, p) =>
      new GenericInternalRow(Array[Any](id, d, p))
    })

  override def serialize(b: TopKPayloadBuffer): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 + 24 * b.size)
    bb.putInt(b.k).putInt(b.size)
    var i = 0
    while (i < b.size) {
      bb.putLong(b.ids(i)).putDouble(b.dists(i)).putLong(b.payloads(i))
      i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKPayloadBuffer = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val b = new TopKPayloadBuffer(bb.getInt())
    val n = bb.getInt()
    var i = 0
    while (i < n) {
      val id = bb.getLong(); val d = bb.getDouble(); val p = bb.getLong()
      b.insert(id, d, p)
      i += 1
    }
    b
  }

  override def withNewMutableAggBufferOffset(o: Int): TopKPayloadAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKPayloadAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(f: Expression, s: Expression,
      t: Expression): TopKPayloadAgg =
    copy(first = f, second = s, third = t)
}
