package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Mergeable Misra–Gries heavy-hitters sketch (Misra & Gries 1982;
 * mergeability per Agarwal et al., "Mergeable Summaries"): at most `k`
 * counters per partial; decrement-all on overflow. Guarantees after
 * arbitrary merges: every item with true frequency > n/k is present,
 * and each reported count under-estimates by at most n/k. That makes
 * it a CANDIDATE generator for exact two-pass heavy hitters — sketch
 * finds a superset of the frequent items in one map-side-combinable
 * pass over 100 TB, then an exact count of just the candidates
 * verifies; the final output is deterministic despite the sketch's
 * merge-order-dependent internals (the vocab_topk query does exactly
 * this, which is why it can be gated HASH-EXACT).
 *
 * Buffer: string -> count map bounded at k entries; serialization is
 * length-prefixed UTF-8 + longs, same flat discipline as TopKPairsAgg.
 */
final class MGBuffer(val k: Int) {
  val counts = new java.util.HashMap[String, Long](k * 2)

  def add(s: String, w: Long = 1L): Unit = {
    val cur = counts.get(s)
    if (cur != 0L || counts.containsKey(s)) counts.put(s, cur + w)
    else if (counts.size < k) counts.put(s, w)
    else decrementAll(w)
  }

  /** Decrement every counter by `w` (the arriving item is absorbed too),
   *  dropping counters that reach zero — the MG overflow step. */
  private def decrementAll(w: Long): Unit = {
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (e.getValue <= w) it.remove() else e.setValue(e.getValue - w)
    }
  }

  def mergeFrom(o: MGBuffer): Unit = {
    // canonical merge (Agarwal et al.): combine counters unbounded,
    // then ONE re-trim — subtract the (k+1)-th largest count from all,
    // dropping non-positives. Keeps the summed error bounds of the
    // two inputs plus n_merge/(k+1).
    val it = o.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      counts.put(e.getKey, counts.get(e.getKey) + e.getValue)
    }
    if (counts.size > k) {
      val vals = new java.util.ArrayList[java.lang.Long](
        counts.values().asInstanceOf[java.util.Collection[java.lang.Long]])
      java.util.Collections.sort(vals)
      decrementAll(vals.get(vals.size - k - 1))
    }
  }
}

/**
 * Aggregate: array<struct<item:string, count:long>> of the (at most k)
 * surviving MG counters, ordered by descending count then item. Counts
 * are the sketch's LOWER BOUNDS, not exact frequencies — re-count the
 * candidates exactly for a deterministic result (rows-only on its own).
 */
case class MisraGriesAgg(child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[MGBuffer] with UnaryLike[Expression] {
  require(k > 0)

  override def prettyName: String = "misra_gries"
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("count", LongType, nullable = false))), containsNull = false)

  override def createAggregationBuffer(): MGBuffer = new MGBuffer(k)

  override def update(b: MGBuffer, input: InternalRow): MGBuffer = {
    val v = child.eval(input)
    if (v != null) b.add(v.asInstanceOf[UTF8String].toString)
    b
  }

  override def merge(b: MGBuffer, o: MGBuffer): MGBuffer = { b.mergeFrom(o); b }

  override def eval(b: MGBuffer): Any = {
    val entries = new java.util.ArrayList(b.counts.entrySet())
    java.util.Collections.sort(entries,
      new java.util.Comparator[java.util.Map.Entry[String, Long]] {
        override def compare(a: java.util.Map.Entry[String, Long],
            c: java.util.Map.Entry[String, Long]): Int = {
          val d = java.lang.Long.compare(c.getValue, a.getValue)
          if (d != 0) d else a.getKey.compareTo(c.getKey)
        }
      })
    val out = new Array[Any](entries.size())
    var i = 0
    while (i < entries.size()) {
      val e = entries.get(i)
      out(i) = org.apache.spark.sql.catalyst.InternalRow(
        UTF8String.fromString(e.getKey), e.getValue)
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(b: MGBuffer): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(b.k); out.writeInt(b.counts.size())
    val it = b.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val bytes = e.getKey.getBytes("UTF-8")
      out.writeInt(bytes.length); out.write(bytes); out.writeLong(e.getValue)
    }
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): MGBuffer = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val b = new MGBuffer(in.readInt())
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val sb = new Array[Byte](len); in.readFully(sb)
      b.counts.put(new String(sb, "UTF-8"), in.readLong())
      i += 1
    }
    b
  }

  override def withNewMutableAggBufferOffset(o: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): MisraGriesAgg =
    copy(child = c)
}

object HeavyHitters {
  /** MG sketch column: array<struct<item,count>> candidate heavy hitters. */
  def sketch(c: Column, k: Int): Column =
    Bridge.column(MisraGriesAgg(Bridge.expression(c), k).toAggregateExpression())
}
