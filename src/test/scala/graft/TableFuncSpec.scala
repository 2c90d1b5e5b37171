package graft

import graft.operators.TableFunc
import org.apache.spark.sql.functions._

/**
 * normal_rand (tablefunc.cpp:137) deterministic analogue: moments and
 * distribution shape of the generated deviates, plus determinism and
 * parameter response.
 */
class TableFuncSpec extends SparkSpec {

  test("moments match (mean 10, stddev 5) within sampling tolerance") {
    val vals = TableFunc.normalRand(spark, 20000, 10.0, 5.0, 42L)
      .select(col("val_micro") / 1e6).collect().map(_.getDouble(0))
    val n = vals.length
    val mean = vals.sum / n
    val variance = vals.map(v => (v - mean) * (v - mean)).sum / n
    assert(math.abs(mean - 10.0) < 0.15, s"mean $mean")
    assert(math.abs(math.sqrt(variance) - 5.0) < 0.15,
      s"stddev ${math.sqrt(variance)}")
    // ~68.3% within one sigma
    val within1 = vals.count(v => math.abs(v - 10.0) <= 5.0).toDouble / n
    assert(within1 > 0.66 && within1 < 0.70, s"within-1-sigma $within1")
  }

  test("deterministic per seed; different seeds differ") {
    val a = TableFunc.normalRand(spark, 100, 0.0, 1.0, 7L).collect().toSeq
    val b = TableFunc.normalRand(spark, 100, 0.0, 1.0, 7L).collect().toSeq
    val c = TableFunc.normalRand(spark, 100, 0.0, 1.0, 8L).collect().toSeq
    assert(a == b)
    assert(a != c)
  }

  test("mean/stddev parameters shift and scale the stream") {
    val base = TableFunc.normalRand(spark, 500, 0.0, 1.0, 1L)
      .select(col("val_micro")).collect().map(_.getLong(0))
    val scaled = TableFunc.normalRand(spark, 500, 3.0, 2.0, 1L)
      .select(col("val_micro")).collect().map(_.getLong(0))
    // floor(3 + 2z in micros) == floor(3e6 + 2*(z-micros exactified))
    // only approximately due to quantization — check on the doubles
    base.zip(scaled).foreach { case (z, s) =>
      assert(math.abs((3e6 + 2.0 * z) - s) <= 2.0,
        s"scale mismatch: z=$z s=$s")
    }
  }
}
