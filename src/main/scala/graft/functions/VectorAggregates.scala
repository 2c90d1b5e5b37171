package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/**
 * Elementwise vector aggregates — avg(vector) / sum(vector)
 * (reference: contrib/datavec/sql/datavec--0.7.2.sql vector_accum /
 * vector_avg / vector_combine: accumulate per-element in float8, emit fp32).
 *
 * Implemented as Spark `Aggregator`s (ScalaAggregator is a true partial
 * aggregate: map-side combine per partition, merge of one double[] per
 * partition — no row explosion, scales to arbitrarily many rows).
 */
private[graft] final class VecAccum(
    var count: Long, var sums: Array[Double]) extends Serializable

private[graft] sealed abstract class VecAggBase(avg: Boolean)
    extends Aggregator[Seq[Float], VecAccum, Seq[Float]] {
  override def zero: VecAccum = new VecAccum(0L, null)
  override def reduce(b: VecAccum, a: Seq[Float]): VecAccum = {
    if (a != null) {
      if (b.sums == null) b.sums = new Array[Double](a.length)
      else require(b.sums.length == a.length,
        s"graft: vector dims differ in aggregate: ${b.sums.length} vs ${a.length}")
      var i = 0
      while (i < a.length) { b.sums(i) += a(i).toDouble; i += 1 }
      b.count += 1
    }
    b
  }
  override def merge(x: VecAccum, y: VecAccum): VecAccum = {
    if (y.sums == null) x
    else if (x.sums == null) y
    else {
      require(x.sums.length == y.sums.length,
        s"graft: vector dims differ in aggregate merge")
      var i = 0
      while (i < x.sums.length) { x.sums(i) += y.sums(i); i += 1 }
      x.count += y.count
      x
    }
  }
  override def finish(b: VecAccum): Seq[Float] =
    if (b.sums == null) null
    else {
      val out = new Array[Float](b.sums.length)
      var i = 0
      while (i < out.length) {
        out(i) = (if (avg) b.sums(i) / b.count else b.sums(i)).toFloat
        i += 1
      }
      out.toIndexedSeq
    }
  override def bufferEncoder: Encoder[VecAccum] = Encoders.kryo[VecAccum]
  override def outputEncoder: Encoder[Seq[Float]] =
    org.apache.spark.sql.catalyst.encoders.AgnosticEncoders.IterableEncoder(
      scala.reflect.classTag[Seq[Float]],
      org.apache.spark.sql.catalyst.encoders.AgnosticEncoders.PrimitiveFloatEncoder,
      containsNull = false, lenientSerialization = false
    ).asInstanceOf[Encoder[Seq[Float]]]
}

object VectorAggregates {
  private object SumAgg extends VecAggBase(avg = false)
  private object AvgAgg extends VecAggBase(avg = true)
  /** sum(vector): elementwise fp64 accumulation, fp32 result. */
  def vecSum(c: Column): Column = udaf(SumAgg).apply(c.cast("array<float>"))
  /** avg(vector): elementwise fp64 accumulation, fp32 result. */
  def vecAvg(c: Column): Column = udaf(AvgAgg).apply(c.cast("array<float>"))
}
