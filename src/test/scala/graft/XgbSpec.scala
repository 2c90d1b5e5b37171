package graft

import graft.operators.Ml
import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

/**
 * xgboost_gs contracts (ref: deepsql/madlib_modules/xgboost_gs/
 * xgboost_sklearn.py_in — grid-searched regularized boosting):
 *  - λ = γ = 0 reduces bit-for-bit to the unregularized stump chain;
 *  - the production driver loop lands on exactly the model the shared
 *    SQL chain computes, including the γ-pruned single-leaf rounds;
 *  - λ shrinks leaf magnitudes, γ prunes low-gain splits;
 *  - the grid search ranks cells by exact held-out SSE and its loop
 *    matches the composed multi-chain SQL text.
 */
class XgbSpec extends SparkSpec with Matchers {
  import spark.implicits._

  /** Planted step: y = 100 for x1 <= 20 else 500, mild noise. */
  private def stepDf = (0 until 400).map { i =>
    val x1 = (i % 50).toLong; val x2 = (i % 31).toLong
    (x1, x2, (if (x1 <= 20) 100L else 500L) + (i % 3))
  }.toDF("x1", "x2", "y")

  test("xgbTrain at lambda = gamma = 0 == gbdt bit-for-bit") {
    val df = stepDf
    val (f0g, gm) = Ml.gbdt(df, 3, 0.5)
    val (f0x, xm) = Ml.xgbTrain(df, 3, 0.5, 0.0, 0.0)
    assert(f0g === f0x)
    assert(gm.toSeq === xm.toSeq)
    assert(xm.forall(_._1 != 0)) // all rounds genuinely split
  }

  test("xgbTrain: production loop == shared SQL chain (regularized)") {
    val df = stepDf
    df.createOrReplaceTempView("pts")
    val (_, model) = Ml.xgbTrain(df, 3, 0.5, 10.0, 2.0)
    val sqlM = spark.sql(Ml.xgbSql(3, 0.5, 10.0, 2.0)).collect()
      .map(r => (r.getInt(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
    assert(sqlM.toSeq === model.toSeq)
  }

  test("lambda shrinks leaf magnitudes toward zero") {
    val df = stepDf
    val (_, free) = Ml.xgbTrain(df, 1, 1.0, 0.0, 0.0)
    val (_, damp) = Ml.xgbTrain(df, 1, 1.0, 1000.0, 0.0)
    // same split (λ damps both sides of this clean step equally)...
    assert(free.head._1 === damp.head._1 && free.head._2 === damp.head._2)
    // ...but strictly smaller leaves
    assert(math.abs(damp.head._3) < math.abs(free.head._3))
    assert(math.abs(damp.head._4) < math.abs(free.head._4))
  }

  test("gamma prunes a low-gain split to a single-leaf round (loop == chain)") {
    // nearly-flat target: the best split's gain is tiny, so a modest
    // γ rejects it; the round must emit (feat 0, w = lr·R/(n+λ)) and
    // later rounds, now fitting only the shrunken residual, likewise
    val df = (0 until 200).map { i =>
      ((i % 10).toLong, (i % 7).toLong, 1000L + (i % 2))
    }.toDF("x1", "x2", "y")
    df.createOrReplaceTempView("pts")
    val (f0, model) = Ml.xgbTrain(df, 2, 0.5, 0.0, 5.0)
    assert(model.forall(_._1 == 0), s"expected only leaf rounds: $model")
    assert(model.forall(t => t._3 === t._4))
    // with γ = 0 the same data DOES split — the gate is live
    val (_, unpruned) = Ml.xgbTrain(df, 2, 0.5, 0.0, 0.0)
    assert(unpruned.exists(_._1 != 0))
    val sqlM = spark.sql(Ml.xgbSql(2, 0.5, 0.0, 5.0)).collect()
      .map(r => (r.getInt(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
    assert(sqlM.toSeq === model.toSeq)
    // residual mean after the leaf rounds is near zero
    val resid = f0 + model.map(_._4).sum
    assert(math.abs(resid - 1000.5) < 1.0)
  }

  test("unsplittable features: loop AND chain emit the single-leaf fallback") {
    // single-valued x1 and x2 → no candidate split exists at all; the
    // driver's None path and the chain's -Inf sentinel row must agree
    val df = (0 until 100).map(i => (7L, 3L, 100L + (i % 2)))
      .toDF("x1", "x2", "y")
    df.createOrReplaceTempView("pts")
    val (f0, model) = Ml.xgbTrain(df, 2, 0.5, 0.0, 0.0)
    assert(model.forall(_._1 == 0))
    val sqlM = spark.sql(Ml.xgbSql(2, 0.5, 0.0, 0.0)).collect()
      .map(r => (r.getInt(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
    assert(sqlM.toSeq === model.toSeq)
    assert(math.abs(f0 + model.map(_._4).sum - 100.5) < 0.5)
    intercept[IllegalArgumentException] { // empty training set rejects
      Ml.xgbTrain(df.limit(0), 1, 0.5, 0.0, 0.0)
    }
  }

  test("grid search rejects an id distribution that empties a split side") {
    val df = (0 until 40).map(i => ((i * 5).toLong, (i % 9).toLong,
      (i % 5).toLong, 100L)).toDF("id", "x1", "x2", "y")
    // ids all ≡ 0 (mod 5): the 20% side is empty
    intercept[IllegalArgumentException] {
      Ml.xgbGridSearch(spark, df, Seq(Ml.XgbParams(1, 0.5, 0.0, 0.0)))
    }
  }

  test("grid search ranks by exact held-out SSE; loop == composed SQL") {
    val df = (0 until 500).map { i =>
      val x1 = (i % 50).toLong; val x2 = (i % 31).toLong
      (i.toLong, x1, x2, (if (x1 <= 20) 100L else 500L) + (i % 5))
    }.toDF("id", "x1", "x2", "y")
    df.createOrReplaceTempView("pts")
    val grid = Seq(
      Ml.XgbParams(2, 0.5, 0.0, 0.0),
      Ml.XgbParams(2, 1.0, 0.0, 0.0),
      Ml.XgbParams(2, 1.0, 1e5, 0.0)) // λ so big the model barely moves
    val got = Ml.xgbGridSearch(spark, df, grid).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getLong(5)))
    val viaSql = spark.sql(Ml.xgbGridSql(grid)).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getLong(5)))
    assert(got.toSeq === viaSql.toSeq)
    // ranks are 1..k and SSE ascends with them
    assert(got.map(_._1).toSeq === (1 to grid.size))
    assert(got.map(_._6).toSeq === got.map(_._6).sortBy(identity).toSeq)
    // η = 1 on a clean step fits the plateaus in 2 rounds: it must
    // beat η = 0.5, and the λ-frozen cell must come last
    assert(got.head._3 === 1.0 && got.head._4 === 0.0)
    assert(got.last._4 === 1e5)
  }
}
