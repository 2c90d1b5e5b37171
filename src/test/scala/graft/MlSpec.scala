package graft

import graft.operators.Ml
import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

/**
 * DB4AI contracts:
 *  - the production DataFrame-loop trainers (kmeans, logregr) land on
 *    exactly the same model as the shared SQL chains the gates run —
 *    the gate text and the operator are one algorithm;
 *  - the general driver-solve linregr agrees with the closed-form
 *    Cramer path;
 *  - trainers recover planted structure on synthetic data.
 */
class MlSpec extends SparkSpec with Matchers {
  import spark.implicits._

  private def pts2 = {
    // two well-separated blobs + two medium ones, deterministic
    val rows = (0 until 400).map { i =>
      val g = i % 4
      val x = (g * 20 + (i * 7) % 11).toLong
      val y = (g * 15 + (i * 13) % 9).toLong
      (x, y)
    }
    rows.toDF("x", "y")
  }

  test("kmeans: production loop == shared SQL chain (assignments and centroids)") {
    val df = pts2
    df.createOrReplaceTempView("pts")
    val sqlOut = spark.sql(Ml.kmeansSql(4, 3))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val (assigned, cents) = Ml.kmeans(df, 4, 3)
    val loopOut = assigned.groupBy("cl")
      .agg(count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"))
      .orderBy("cl")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(sqlOut.toSeq === loopOut.toSeq)
    // centroids: SQL chain's final row must equal the loop's state
    val sqlCents = spark.sql(Ml.kmeansSql(4, 3))
      .collect().map(r => (r.getDouble(4), r.getDouble(5)))
    assert(sqlCents.toSeq === cents.toSeq)
  }

  test("kmeans recovers separated blobs") {
    val df = (0 until 300).map { i =>
      val g = i % 3
      (g * 1000L + i % 5, g * 1000L + (i * 3) % 7)
    }.toDF("x", "y")
    // k=3: x % 3 init scatters across blobs, Lloyd must still converge
    val (assigned, _) = Ml.kmeans(df, 3, 5)
    val purity = assigned
      .withColumn("blob", (col("x") / 1000).cast("int"))
      .groupBy("blob").agg(countDistinct("cl").as("k")).collect()
    purity.foreach(r => assert(r.getLong(1) === 1L,
      s"blob ${r.getInt(0)} split across clusters"))
  }

  test("logregr: production loop == shared SQL chain weights") {
    val df = (0 until 500).map { i =>
      val x1 = (i % 50) / 50.0
      val x2 = (i % 31) / 31.0
      (x1, x2, if (x1 + x2 > 0.8) 1 else 0)
    }.toDF("x1", "x2", "y")
    df.createOrReplaceTempView("pts")
    val sqlW = spark.sql(Ml.logregrSql(3, 0.5)).collect()(0)
    val w = Ml.logregr(df, 3, 0.5)
    assert(sqlW.getDouble(0) === w(0))
    assert(sqlW.getDouble(1) === w(1))
    assert(sqlW.getDouble(2) === w(2))
  }

  test("logregr with true sigmoid separates a planted boundary") {
    val df = (0 until 1000).map { i =>
      val x1 = (i % 53) / 53.0
      val x2 = (i % 37) / 37.0
      (x1, x2, if (2.0 * x1 - x2 > 0.5) 1 else 0)
    }.toDF("x1", "x2", "y")
    val w = Ml.logregr(df, 200, 2.0, trueSigmoid = true)
    val acc = df.withColumn("p",
        (lit(w(0)) + lit(w(1)) * col("x1") + lit(w(2)) * col("x2")) > 0)
      .filter(col("p").cast("int") === col("y")).count() / 1000.0
    assert(acc > 0.9, s"accuracy $acc")
    // learned direction: positive on x1, negative on x2
    assert(w(1) > 0 && w(2) < 0)
  }

  test("svm: production loop == shared SQL chain weights; learns the margin") {
    val df = (0 until 600).map { i =>
      val x1 = (i % 53) / 53.0
      val x2 = (i % 37) / 37.0
      (x1, x2, if (2.0 * x1 - x2 > 0.5) 1 else -1)
    }.toDF("x1", "x2", "y")
    df.createOrReplaceTempView("pts")
    val sqlW = spark.sql(Ml.svmSql(3, 0.5, 0.01)).collect()(0)
    val w3 = Ml.svm(df, 3, 0.5, 0.01)
    assert(sqlW.getDouble(0) === w3(0))
    assert(sqlW.getDouble(1) === w3(1))
    assert(sqlW.getDouble(2) === w3(2))
    val w = Ml.svm(df, 300, 1.0, 0.001)
    val acc = df.withColumn("p",
        when(lit(w(0)) + lit(w(1)) * col("x1") + lit(w(2)) * col("x2") >= 0, 1)
          .otherwise(-1))
      .filter(col("p") === col("y")).count() / 600.0
    assert(acc > 0.9, s"accuracy $acc")
    assert(w(1) > 0 && w(2) < 0)
  }

  test("linregr driver solve == Cramer closed form on the gate's shape") {
    val df = (0 until 400).map { i =>
      val x1 = (i % 50).toLong; val x2 = (i % 31).toLong
      (x1, x2, 3 * x1 - 2 * x2 + 7 + (i % 5) - 2) // noisy plane
    }.toDF("x1", "x2", "y")
    val w = Ml.linregr(df, Seq(col("x1"), col("x2")), col("y"))
    val cram = Ml.linregrSums(df, col("x1"), col("x2"), col("y"))
      .selectExpr(Ml.cramer3Exprs.map { case (n, x) => s"$x AS $n" }: _*)
      .collect()(0)
    w(0) shouldBe cram.getDouble(0) +- 1e-9
    w(1) shouldBe cram.getDouble(1) +- 1e-9
    w(2) shouldBe cram.getDouble(2) +- 1e-9
    // recovers the plane
    w(1) shouldBe 3.0 +- 0.1
    w(2) shouldBe -2.0 +- 0.1
  }

  test("multiclass: production one-vs-rest == shared SQL chain confusion matrix") {
    val df = (0 until 600).map { i =>
      val x1 = (i % 53) / 53.0
      val x2 = (i % 41) / 41.0
      val cls = if (x1 + x2 < 0.6) 0 else if (x1 - x2 > 0.1) 1 else 2
      (x1, x2, cls)
    }.toDF("x1", "x2", "cls")
    df.createOrReplaceTempView("pts")
    val sqlCm = spark.sql(Ml.multiclassSql(3, 2, 0.5))
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
    val (_, pred) = Ml.multiclass(df, 3, 2, 0.5)
    val loopCm = pred.groupBy("cls", "pred").agg(count(lit(1)).as("n"))
      .orderBy("cls", "pred")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
    assert(sqlCm.toSeq === loopCm.toSeq)
    // with more training the majority of each class is recovered
    val (_, pred2) = Ml.multiclass(df, 3, 60, 2.0)
    val acc = pred2.filter(col("pred") === col("cls")).count() / 600.0
    assert(acc > 0.7, s"one-vs-rest accuracy $acc")
  }

  test("gbdt: production loop == shared SQL chain; recovers a planted step") {
    // y = 100 when x1 <= 20 else 500, plus small deterministic noise
    val df = (0 until 400).map { i =>
      val x1 = (i % 50).toLong; val x2 = (i % 31).toLong
      (x1, x2, (if (x1 <= 20) 100L else 500L) + (i % 3))
    }.toDF("x1", "x2", "y")
    df.createOrReplaceTempView("pts")
    val sqlM = spark.sql(Ml.gbdtSql(3, 0.5))
      .collect().map(r => (r.getInt(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
    val (f0, model) = Ml.gbdt(df, 3, 0.5)
    assert(sqlM.toSeq === model.toSeq)
    // round 1 must find the planted split on feature 1 at x1 = 20
    assert(model.head._1 === 1)
    assert(model.head._2 === 20L)
    // left leaf pulls toward 100, right toward 500 (lr=0.5 of the gap)
    assert(model.head._3 < 0 && model.head._4 > 0)
    // after 3 rounds predictions approach the plateaus
    val predLow = f0 + model.map { case (ft, thr, lv, rv) => if (10 <= thr && ft == 1) lv else rv }.sum
    assert(math.abs(predLow - 101.0) < 30.0)
  }

  test("gbdtDepth2: captures a planted XOR interaction stumps cannot") {
    // y = 500 when (x1<=20) XOR (x2<=15), else 100 — marginal means
    // per single feature are flat, so a stump sees ~zero gain, while
    // a depth-2 tree isolates all four quadrants
    val df = (0 until 1200).map { i =>
      val x1 = (i % 50).toLong; val x2 = (i * 7 % 31).toLong
      val xor = (x1 <= 20) != (x2 <= 15)
      (x1, x2, if (xor) 500L else 100L)
    }.toDF("x1", "x2", "y")
    val (f0, model) = Ml.gbdtDepth2(df, 4, 0.5)
    // round-1 children must split on the OTHER feature at the planted
    // thresholds (20 for x1, 15 for x2)
    val t = model.head
    val planted = Map(1 -> 20L, 2 -> 15L)
    assert(t.featL !== t.feat0)
    assert(t.featR !== t.feat0)
    assert(t.thrL === planted(t.featL))
    assert(t.thrR === planted(t.featR))
    // after 4 rounds predictions approach the two plateaus; stumps don't
    def mse(pred: org.apache.spark.sql.Column): Double =
      df.select(avg((col("y").cast("double") - pred) *
        (col("y").cast("double") - pred))).collect()(0).getDouble(0)
    val d2Pred = model.foldLeft(lit(f0)) { case (acc, tr) =>
      acc + when(col(s"x${tr.feat0}") <= lit(tr.thr0),
        when(col(s"x${tr.featL}") <= lit(tr.thrL), lit(tr.llv)).otherwise(lit(tr.lrv)))
        .otherwise(when(col(s"x${tr.featR}") <= lit(tr.thrR), lit(tr.rlv))
          .otherwise(lit(tr.rrv)))
    }
    val (f0s, stumps) = Ml.gbdt(df, 4, 0.5)
    val stumpPred = stumps.foldLeft(lit(f0s)) { case (acc, (ft, thr, lv, rv)) =>
      acc + when(col(s"x$ft") <= lit(thr), lit(lv)).otherwise(lit(rv))
    }
    val (m2, ms) = (mse(d2Pred), mse(stumpPred))
    assert(m2 < ms / 2, s"depth-2 mse $m2 not well below stump mse $ms")
  }

  test("gbdtDepth2: production loop == shared SQL chain, bit-for-bit") {
    val df = (0 until 1200).map { i =>
      val x1 = (i % 50).toLong; val x2 = (i * 7 % 31).toLong
      val xor = (x1 <= 20) != (x2 <= 15)
      (x1, x2, if (xor) 500L else 100L)
    }.toDF("x1", "x2", "y")
    df.createOrReplaceTempView("pts")
    val (f0, model) = Ml.gbdtDepth2(df, 2, 0.5)
    val sqlM = spark.sql(Ml.gbdtDepth2Sql(2, 0.5)).collect().map(r =>
      Ml.Tree2(r.getInt(1), r.getLong(2), r.getInt(3), r.getLong(4),
        r.getDouble(5), r.getDouble(6), r.getInt(7), r.getLong(8),
        r.getDouble(9), r.getDouble(10)))
    assert(sqlM.toSeq === model)
    assert(f0 === 1200.0 * 0 + df.agg(avg("y")).collect()(0).getDouble(0))
  }

  test("gbdtDepth2 SQL chain reproduces the degenerate-side collapse") {
    // x2 == x1 and only two cells: after the root split each side has
    // ONE distinct value on both features → no valid child split →
    // the driver collapses to (feat 1, LONG_MIN, side-mean leaves);
    // the SQL chain must land on exactly the same Tree2 row
    val df = (0 until 10).map { i =>
      val v = (i % 2).toLong
      (v, v, if (v == 0) 0L else 1000L)
    }.toDF("x1", "x2", "y")
    df.createOrReplaceTempView("pts")
    val (_, model) = Ml.gbdtDepth2(df, 1, 0.5)
    assert(model.head.thrL === Long.MinValue)
    assert(model.head.thrR === Long.MinValue)
    assert(model.head.llv === model.head.lrv)
    val sqlM = spark.sql(Ml.gbdtDepth2Sql(1, 0.5)).collect().map(r =>
      Ml.Tree2(r.getInt(1), r.getLong(2), r.getInt(3), r.getLong(4),
        r.getDouble(5), r.getDouble(6), r.getInt(7), r.getLong(8),
        r.getDouble(9), r.getDouble(10)))
    assert(sqlM.toSeq === model)
  }

  test("pca: leading component follows a planted correlation") {
    val df = (0 until 500).map { i =>
      val t = (i % 100).toLong
      (t, 2 * t + (i % 7) - 3) // y ≈ 2x
    }.toDF("x", "y")
    val r = Ml.pca2Sums(df, col("x"), col("y"))
      .selectExpr(Ml.pca2Exprs.map { case (n, x) => s"$x AS $n" }: _*)
      .collect()(0)
    val (v1, v2) = (r.getDouble(0), r.getDouble(1))
    assert(v1 > v2 && v2 >= 0)
    val slope = r.getDouble(3) / r.getDouble(2) // pc1_y / pc1_x
    slope shouldBe 2.0 +- 0.05
    assert(r.getDouble(4) > 0.99) // explained variance ratio
  }

  test("farthest-first seeding lands one seed per blob; seeded Lloyd stays pure") {
    // blobs share the same x-residues mod k, so partition init starts
    // every cluster mixed; farthest-first must seed each blob
    val df = (0 until 300).map { i =>
      val g = i % 3
      (g * 900L + (i % 5) * 3, g * 900L + (i * 3) % 7)
    }.toDF("x", "y")
    val seeds = Ml.farthestSeeds(df, 3)
    assert(seeds.map(s => math.round(s._1 / 900.0)).toSet === Set(0L, 1L, 2L),
      s"seeds not one-per-blob: ${seeds.mkString(",")}")
    val (assigned, _) = Ml.kmeans(df, 3, 3, seeds = Some(seeds))
    val purity = assigned.withColumn("blob", (col("x") / 900).cast("int"))
      .groupBy("blob").agg(countDistinct("cl").as("k")).collect()
    purity.foreach(r => assert(r.getLong(1) === 1L,
      s"blob ${r.getInt(0)} split"))
    // determinism: same input → identical seeds
    assert(Ml.farthestSeeds(df.repartition(7), 3).toSeq === seeds.toSeq)
  }

  test("kmeansND: 2-d parity with the gate trainer; separates 3-d blobs") {
    val df = pts2.withColumnRenamed("x", "a").withColumnRenamed("y", "b")
    val (a2, c2) = Ml.kmeans(pts2, 4, 3)
    val (an, cn) = Ml.kmeansND(df, Seq("a", "b"), 4, 3)
    val s2 = a2.groupBy("cl").agg(count(lit(1)), sum("x"), sum("y")).orderBy("cl")
      .collect().map(_.toSeq)
    val sn = an.groupBy("cl").agg(count(lit(1)), sum("f0"), sum("f1")).orderBy("cl")
      .collect().map(_.toSeq)
    assert(s2.toSeq === sn.toSeq)
    assert(c2.map(p => Seq(p._1, p._2)).toSeq === cn.map(_.toSeq).toSeq)
    // 3-d blobs
    val df3 = (0 until 300).map { i =>
      val g = i % 3
      (g * 500L + i % 5, g * 500L + (i * 3) % 7, g * 500L + (i * 7) % 4)
    }.toDF("a", "b", "c")
    val (a3, _) = Ml.kmeansND(df3, Seq("a", "b", "c"), 3, 5)
    val purity = a3.withColumn("blob", (col("f0") / 500).cast("int"))
      .groupBy("blob").agg(countDistinct("cl").as("k")).collect()
    purity.foreach(r => assert(r.getLong(1) === 1L))
  }

  test("gdND: 2-feature parity with logregr and svm") {
    val df = (0 until 500).map { i =>
      val x1 = (i % 53) / 53.0; val x2 = (i % 37) / 37.0
      (x1, x2, if (2.0 * x1 - x2 > 0.5) 1 else 0, if (2.0 * x1 - x2 > 0.5) 1 else -1)
    }.toDF("x1", "x2", "y", "ysvm")
    val wl = Ml.logregr(df, 5, 0.5)
    val wlN = Ml.gdND(df, Seq("x1", "x2"), "y", 5, 0.5)
    assert(wl.toSeq === wlN.toSeq)
    val ws = Ml.svm(df.withColumnRenamed("ysvm", "ycls")
      .drop("y").withColumnRenamed("ycls", "y"), 5, 0.5, 0.01)
    val wsN = Ml.gdND(df, Seq("x1", "x2"), "ysvm", 5, 0.5,
      hinge = true, lambda = 0.01)
    assert(ws.toSeq === wsN.toSeq)
    // 3-feature run learns the planted signs
    val df3 = (0 until 800).map { i =>
      val a = (i % 53) / 53.0; val b = (i % 37) / 37.0; val c = (i % 29) / 29.0
      (a, b, c, if (a - b + 2 * c > 0.7) 1 else 0)
    }.toDF("a", "b", "c", "y")
    val w3 = Ml.gdND(df3, Seq("a", "b", "c"), "y", 120, 2.0)
    assert(w3(1) > 0 && w3(2) < 0 && w3(3) > 0)
  }

  test("pcaPower: matches the 2x2 closed form; recovers a 3-d planted direction") {
    val df2 = (0 until 500).map { i =>
      val t = (i % 100).toLong
      (t, 2 * t + (i % 7) - 3)
    }.toDF("x", "y")
    val closed = Ml.pca2Sums(df2, col("x"), col("y"))
      .selectExpr(Ml.pca2Exprs.map { case (n, x) => s"$x AS $n" }: _*)
      .collect()(0)
    val (v2, l2) = Ml.pcaPower(df2, Seq(col("x"), col("y")), iters = 200)
    l2 shouldBe closed.getDouble(0) +- 1e-6 * closed.getDouble(0)
    v2(0) shouldBe closed.getDouble(2) +- 1e-6
    v2(1) shouldBe closed.getDouble(3) +- 1e-6
    // 3-d: data along (1, 2, 3) with small deterministic noise
    val df3 = (0 until 600).map { i =>
      val t = (i % 80).toLong
      (t + (i % 3), 2 * t + (i % 5), 3 * t + (i % 7))
    }.toDF("a", "b", "c")
    val (v3, _) = Ml.pcaPower(df3, Seq(col("a"), col("b"), col("c")))
    val norm = math.sqrt(1.0 + 4.0 + 9.0)
    v3(0) shouldBe 1.0 / norm +- 0.02
    v3(1) shouldBe 2.0 / norm +- 0.02
    v3(2) shouldBe 3.0 / norm +- 0.02
  }

  test("nbayesND: binary parity with the gate path; 3-class, 3-feature recovery") {
    val df = (0 until 400).map { i =>
      (i.toLong, s"t${i % 4}", (i % 5).toLong, (i % 2))
    }.toDF("id", "f1", "f2", "y")
    val a = Ml.nbayesPredict(df, col("f1"), col("f2"), col("y"), col("id"))
      .orderBy("id").collect().map(r => (r.getLong(0), r.getInt(4)))
    val b = Ml.nbayesND(df, Seq(col("f1"), col("f2")), col("y"), col("id"), 2)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getInt(4)))
    assert(a.toSeq === b.toSeq)
    // 3 classes, 3 features: one feature perfectly class-aligned
    val df3 = (0 until 600).map { i =>
      val cls = i % 3
      (i.toLong, s"c$cls", (i % 7).toLong, s"n${i % 4}", cls)
    }.toDF("id", "f1", "f2", "f3", "y")
    val p3 = Ml.nbayesND(df3,
      Seq(col("f1"), col("f2"), col("f3")), col("y"), col("id"), 3)
    assert(p3.filter(col("pred") === col("cls")).count() === 600L)
  }

  test("nbayes: class-pure feature dominates prediction") {
    val df = (0 until 300).map { i =>
      val cls = i % 2
      // f1 perfectly class-aligned, f2 noise
      (i.toLong, if (cls == 1) "pos" else "neg", (i % 5).toLong, cls)
    }.toDF("id", "f1", "f2", "y")
    val pred = Ml.nbayesPredict(df, col("f1"), col("f2"), col("y"), col("id"))
    assert(pred.filter(col("pred") === col("cls")).count() === 300L)
  }

  test("gbdt: high-cardinality continuous feature takes the bounded binned path") {
    import spark.implicits._
    // V = 20000 distinct x1 values (>> SplitMaxBins): the old path
    // collected one driver row per distinct value; the binned path
    // must (a) actually run, (b) still find the planted step at
    // x1 > 10000 within one quantile-bin width (~V/256 = 79)
    val pts = (0 until 20000).map { i =>
      (i.toLong, (i % 7).toLong, if (i > 10000) 1000L else 0L)
    }.toDF("x1", "x2", "y")
    val before = Ml.binnedSplitRuns
    val (f0, model) = Ml.gbdt(pts, 1, 1.0)
    assert(Ml.binnedSplitRuns > before, "binned split path never executed")
    val (feat, thr, lval, rval) = model.head
    assert(feat === 1)
    assert(math.abs(thr - 10000L) <= 100L, s"threshold $thr not near planted 10000")
    // leaves are residual means vs f0: predictions separate the levels
    assert(f0 + lval < 100.0 && f0 + rval > 900.0,
      s"predictions ${f0 + lval} / ${f0 + rval}")
  }
}
