package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

/**
 * Elementwise vector aggregates — avg(vector) / sum(vector)
 * (reference: contrib/datavec/sql/datavec--0.7.2.sql vector_accum /
 * vector_avg / vector_combine: accumulate per-element in float8, emit
 * fp32).
 *
 * A Catalyst TypedImperativeAggregate over a primitive double[] buffer:
 * map-side partials ship as flat 8-bytes-per-element blobs (the
 * previous Aggregator round-tripped the accumulator through
 * Encoders.kryo on every partial exchange). One buffer per group —
 * no row explosion, scales to arbitrarily many rows.
 */
final class VecAccum(var count: Long, var sums: Array[Double])

case class VectorAccumAgg(child: Expression, avg: Boolean,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[VecAccum] with UnaryLike[Expression] {

  override def prettyName: String = if (avg) "vec_avg" else "vec_sum"
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)

  override def createAggregationBuffer(): VecAccum = new VecAccum(0L, null)

  override def update(b: VecAccum, input: InternalRow): VecAccum = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      val n = arr.numElements()
      if (b.sums == null) b.sums = new Array[Double](n)
      else require(b.sums.length == n,
        s"graft: vector dims differ in aggregate: ${b.sums.length} vs $n")
      var i = 0
      while (i < n) { b.sums(i) += arr.getFloat(i).toDouble; i += 1 }
      b.count += 1
    }
    b
  }

  override def merge(x: VecAccum, y: VecAccum): VecAccum =
    if (y.sums == null) x
    else if (x.sums == null) y
    else {
      require(x.sums.length == y.sums.length,
        "graft: vector dims differ in aggregate merge")
      var i = 0
      while (i < x.sums.length) { x.sums(i) += y.sums(i); i += 1 }
      x.count += y.count
      x
    }

  override def eval(b: VecAccum): Any =
    if (b.sums == null) null
    else {
      val out = new Array[Float](b.sums.length)
      var i = 0
      while (i < out.length) {
        val d = if (avg) b.sums(i) / b.count else b.sums(i)
        out(i) = d.toFloat
        // the fp64 accumulator survives what the fp32 RESULT cannot:
        // sum('[3e38]','[3e38]') errors in the reference
        // (vector_type.out:686) rather than emitting Inf. avg can
        // never trigger this (|sum/count| ≤ max input magnitude).
        if (out(i).isInfinite && !d.isInfinite)
          throw new IllegalArgumentException(
            "graft: value out of range: overflow")
        i += 1
      }
      new GenericArrayData(out)
    }

  override def serialize(b: VecAccum): Array[Byte] = {
    val n = if (b.sums == null) -1 else b.sums.length
    val bb = java.nio.ByteBuffer.allocate(12 + math.max(n, 0) * 8)
    bb.putLong(b.count).putInt(n)
    var i = 0
    while (i < n) { bb.putDouble(b.sums(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): VecAccum = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val count = bb.getLong()
    val n = bb.getInt()
    if (n < 0) new VecAccum(count, null)
    else {
      val sums = new Array[Double](n)
      var i = 0
      while (i < n) { sums(i) = bb.getDouble(); i += 1 }
      new VecAccum(count, sums)
    }
  }

  override def withNewMutableAggBufferOffset(o: Int): VectorAccumAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): VectorAccumAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): VectorAccumAgg =
    copy(child = c)
}

object VectorAggregates {
  private def agg(c: Column, avg: Boolean): Column =
    Bridge.column(VectorAccumAgg(
      Bridge.expression(c.cast("array<float>")), avg).toAggregateExpression())
  /** sum(vector): elementwise fp64 accumulation, fp32 result. */
  def vecSum(c: Column): Column = agg(c, avg = false)
  /** avg(vector): elementwise fp64 accumulation, fp32 result. */
  def vecAvg(c: Column): Column = agg(c, avg = true)
}
