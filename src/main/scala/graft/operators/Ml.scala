package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/**
 * DB4AI — openGauss's in-database ML surface (reference:
 * src/gausskernel/dbmind/db4ai/executor/algorithms/{linregr,logregr,
 * kmeans,pca,bayes}.cpp, optimize/gd/, scores.h; exercised via
 * CREATE MODEL ... USING <algo> / PREDICT BY), re-expressed as
 * distributed Spark aggregations.
 *
 * Design for 100 TB:
 *  - every trainer is "few full scans + tiny driver state": linregr /
 *    pca reduce to ONE map-side-combined Gram aggregate (p² numbers)
 *    and a driver-side solve of a p×p system; kmeans / GD do one such
 *    pass per iteration with k·d (resp. p) numbers crossing the wire;
 *    naive Bayes is a handful of broadcast count tables. Nothing
 *    materializes per-row state, no shuffle carries more than the
 *    model itself.
 *  - DETERMINISM: float sums over a shuffle are order-dependent, so
 *    every corpus-wide sum here is exact integer/decimal arithmetic —
 *    Gram sums of integer-derived features are LONG; GD gradients are
 *    floor-quantized to 1e-9 before summing (gd.h's accumulation is
 *    a plain double += and openGauss runs it single-threaded; the
 *    quantized sum is the order-free distributed equivalent). The
 *    driver-side solve is then a pure function of exact sums.
 *  - the gates share their scalar formulas TEXTUALLY with the DuckDB
 *    oracle (the *Sql builders below), so every double is produced by
 *    the identical IEEE expression tree on both engines → hash-exact.
 */
object Ml {

  // ---------------------------------------------------------------
  // Linear regression (linregr.cpp): closed-form normal equations.
  // ---------------------------------------------------------------

  /**
   * Exact Gram sums for 2 integer features + intercept: one
   * map-side-combined aggregate producing the 9 LONG moments.
   */
  def linregrSums(df: DataFrame, x1: Column, x2: Column, y: Column): DataFrame =
    df.select(x1.cast("long").as("x1"), x2.cast("long").as("x2"),
        y.cast("long").as("y"))
      .agg(count(lit(1)).as("n"),
        sum("x1").as("sx1"), sum("x2").as("sx2"), sum("y").as("sy"),
        sum(col("x1") * col("x1")).as("sx11"),
        sum(col("x1") * col("x2")).as("sx12"),
        sum(col("x2") * col("x2")).as("sx22"),
        sum(col("x1") * col("y")).as("sx1y"),
        sum(col("x2") * col("y")).as("sx2y"),
        sum(col("y") * col("y")).as("syy"))

  /**
   * Cramer solve of the 3×3 normal equations over the sums row, as
   * SQL expression text shared verbatim with the oracle — identical
   * IEEE trees on both engines. Column names: b0 (intercept), b1, b2,
   * r2. Uses only +,-,*,/ over the exact LONG moments.
   */
  val cramer3Exprs: Seq[(String, String)] = {
    // doubles of the moments
    val d = Seq("n", "sx1", "sx2", "sy", "sx11", "sx12", "sx22", "sx1y", "sx2y", "syy")
      .map(m => m -> s"CAST($m AS DOUBLE)").toMap
    val det =
      s"(${d("n")} * (${d("sx11")} * ${d("sx22")} - ${d("sx12")} * ${d("sx12")})" +
        s" - ${d("sx1")} * (${d("sx1")} * ${d("sx22")} - ${d("sx12")} * ${d("sx2")})" +
        s" + ${d("sx2")} * (${d("sx1")} * ${d("sx12")} - ${d("sx11")} * ${d("sx2")}))"
    val det0 =
      s"(${d("sy")} * (${d("sx11")} * ${d("sx22")} - ${d("sx12")} * ${d("sx12")})" +
        s" - ${d("sx1")} * (${d("sx1y")} * ${d("sx22")} - ${d("sx12")} * ${d("sx2y")})" +
        s" + ${d("sx2")} * (${d("sx1y")} * ${d("sx12")} - ${d("sx11")} * ${d("sx2y")}))"
    val det1 =
      s"(${d("n")} * (${d("sx1y")} * ${d("sx22")} - ${d("sx12")} * ${d("sx2y")})" +
        s" - ${d("sy")} * (${d("sx1")} * ${d("sx22")} - ${d("sx12")} * ${d("sx2")})" +
        s" + ${d("sx2")} * (${d("sx1")} * ${d("sx2y")} - ${d("sx1y")} * ${d("sx2")}))"
    val det2 =
      s"(${d("n")} * (${d("sx11")} * ${d("sx2y")} - ${d("sx1y")} * ${d("sx12")})" +
        s" - ${d("sx1")} * (${d("sx1")} * ${d("sx2y")} - ${d("sx1y")} * ${d("sx2")})" +
        s" + ${d("sy")} * (${d("sx1")} * ${d("sx12")} - ${d("sx11")} * ${d("sx2")}))"
    // SSE from the moments: y'y - 2 b'X'y + b'X'Xb, expanded; SST = syy - sy²/n
    val b0 = s"($det0 / $det)"; val b1 = s"($det1 / $det)"; val b2 = s"($det2 / $det)"
    val sse =
      s"(${d("syy")} - 2e0 * ($b0 * ${d("sy")} + $b1 * ${d("sx1y")} + $b2 * ${d("sx2y")})" +
        s" + ($b0 * ($b0 * ${d("n")} + $b1 * ${d("sx1")} + $b2 * ${d("sx2")})" +
        s" + $b1 * ($b0 * ${d("sx1")} + $b1 * ${d("sx11")} + $b2 * ${d("sx12")})" +
        s" + $b2 * ($b0 * ${d("sx2")} + $b1 * ${d("sx12")} + $b2 * ${d("sx22")})))"
    val sst = s"(${d("syy")} - ${d("sy")} * ${d("sy")} / ${d("n")})"
    Seq("b0" -> b0, "b1" -> b1, "b2" -> b2, "r2" -> s"(1e0 - $sse / $sst)")
  }

  /**
   * General linear regression: p features, driver-side Gaussian
   * elimination with partial pivoting over the (p+1)×(p+1) normal
   * matrix built from ONE aggregate pass. Feature values should be
   * exact (integer/decimal-derived) for run-to-run determinism.
   * Returns (weights incl. intercept at index 0).
   */
  def linregr(df: DataFrame, features: Seq[Column], label: Column): Array[Double] = {
    val p = features.size
    val cols = (lit(1L).as("f0") +:
      features.zipWithIndex.map { case (c, i) => c.cast("long").as(s"f${i + 1}") }) :+
      label.cast("long").as("lab")
    val w = df.select(cols: _*)
    val aggs = (for {
      i <- 0 to p; j <- i to p
    } yield sum(col(s"f$i") * col(s"f$j")).as(s"m_${i}_$j")) ++
      (0 to p).map(i => sum(col(s"f$i") * col("lab")).as(s"v_$i"))
    val row = w.agg(aggs.head, aggs.tail: _*).collect()(0)
    val a = Array.ofDim[Double](p + 1, p + 2)
    for (i <- 0 to p; j <- i to p) {
      val m = row.getLong(row.fieldIndex(s"m_${i}_$j")).toDouble
      a(i)(j) = m; a(j)(i) = m
    }
    for (i <- 0 to p) a(i)(p + 1) = row.getLong(row.fieldIndex(s"v_$i")).toDouble
    // gaussian elimination, partial pivot
    for (c <- 0 to p) {
      val piv = (c to p).maxBy(r => math.abs(a(r)(c)))
      val t = a(c); a(c) = a(piv); a(piv) = t
      require(math.abs(a(c)(c)) > 1e-12, "graft: singular normal matrix")
      for (r <- 0 to p if r != c) {
        val f = a(r)(c) / a(c)(c)
        for (k <- c to p + 1) a(r)(k) -= f * a(c)(k)
      }
    }
    (0 to p).map(i => a(i)(p + 1) / a(i)(i)).toArray
  }

  // ---------------------------------------------------------------
  // K-means (kmeans.cpp): Lloyd with deterministic partition init.
  // ---------------------------------------------------------------

  /** dj = squared distance to centroid j, as shared SQL text. */
  private def distExpr(j: Int): String =
    s"((CAST(x AS DOUBLE) - cx$j) * (CAST(x AS DOUBLE) - cx$j)" +
      s" + (CAST(y AS DOUBLE) - cy$j) * (CAST(y AS DOUBLE) - cy$j))"

  /** Nearest-centroid CASE chain (ties → smaller id), shared text. */
  def assignExpr(k: Int): String = {
    val cases = (0 until k - 1).map { j =>
      val conds = (j + 1 until k).map(m => s"${distExpr(j)} <= ${distExpr(m)}")
      s"WHEN ${conds.mkString(" AND ")} THEN $j"
    }
    s"CASE ${cases.mkString(" ")} ELSE ${k - 1} END"
  }

  /** One-row pivot of per-cluster means: cx0..cy{k-1}, empty clusters
    * inherit the previous centroid (coalesce). Shared text; `prev`
    * names the previous single-row centroid relation. */
  def centroidPivotSql(k: Int, assigned: String, prev: String): String = {
    val cols = (0 until k).flatMap { j =>
      Seq(
        s"coalesce(max(CASE WHEN cl = $j THEN sx END) / max(CASE WHEN cl = $j THEN cn END), max($prev.cx$j)) AS cx$j",
        s"coalesce(max(CASE WHEN cl = $j THEN sy END) / max(CASE WHEN cl = $j THEN cn END), max($prev.cy$j)) AS cy$j")
    }
    s"""SELECT ${cols.mkString(", ")}
       |FROM (SELECT cl, CAST(sum(x) AS DOUBLE) AS sx, CAST(sum(y) AS DOUBLE) AS sy,
       |             CAST(count(*) AS DOUBLE) AS cn FROM $assigned GROUP BY cl) g, $prev""".stripMargin
  }

  /**
   * The full Lloyd chain as one SQL text over a relation `pts(x, y)`
   * with integer columns — runnable verbatim by Spark SQL AND DuckDB
   * (the gate's cross-engine guarantee). Init: cl = x % k ("random
   * partition" init, deterministic here). Output: one row per cluster
   * with exact LONG sums + the final double centroids.
   */
  /** The chain's CTE LIST through the final centroid relation
    * `c{iters}` (no leading WITH, no final SELECT) — shared between
    * [[kmeansSql]] and oracles that append their own final SELECT
    * (e.g. scoring rows against the converged centroids). */
  def kmeansChainSql(k: Int, iters: Int): String = {
    val sb = new StringBuilder
    sb.append(s"a0 AS (SELECT x, y, CAST(x % $k AS INT) AS cl FROM pts),\n")
    // c0 from a0 without a prev relation: seed "prev" with zeros (all
    // clusters are non-empty under partition init by construction)
    val zeros = (0 until k).flatMap(j => Seq(s"CAST(0 AS DOUBLE) AS cx$j", s"CAST(0 AS DOUBLE) AS cy$j")).mkString(", ")
    sb.append(s"z AS (SELECT $zeros),\n")
    var prev = "z"
    for (i <- 0 until iters) {
      val a = s"a$i"; val c = s"c$i"
      sb.append(s"$c AS (${centroidPivotSql(k, a, prev)}),\n")
      sb.append(s"a${i + 1} AS (SELECT x, y, ${assignExpr(k)} AS cl FROM pts, $c),\n")
      prev = c
    }
    sb.append(s"c$iters AS (${centroidPivotSql(k, s"a$iters", prev)})")
    sb.toString
  }

  def kmeansSql(k: Int, iters: Int): String = {
    val sb = new StringBuilder
    sb.append("WITH ")
    sb.append(kmeansChainSql(k, iters))
    sb.append("\n")
    val fin = s"c$iters"
    val cxCase = (0 until k).map(j => s"WHEN $j THEN cx$j").mkString(" ")
    val cyCase = (0 until k).map(j => s"WHEN $j THEN cy$j").mkString(" ")
    val groupCols = (0 until k).flatMap(j => Seq(s"cx$j", s"cy$j")).mkString(", ")
    sb.append(
      s"""SELECT cl AS cluster, CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT) AS sum_x, CAST(sum(y) AS BIGINT) AS sum_y,
         |  CASE cl $cxCase END AS cx, CASE cl $cyCase END AS cy
         |FROM a$iters, $fin GROUP BY cl, $groupCols ORDER BY cluster""".stripMargin)
    sb.toString
  }

  /**
   * Production Lloyd: DataFrame loop — per iteration ONE map-side-
   * combined aggregate (k rows of exact LONG sums cross the shuffle),
   * centroids held on the driver (k·2 doubles), assignment compiled
   * as the same CASE chain. Returns (assigned DF, centroids).
   */
  def kmeans(pts: DataFrame, k: Int, iters: Int,
      seeds: Option[Array[(Double, Double)]] = None): (DataFrame, Array[(Double, Double)]) = {
    var assigned = seeds match {
      case None => pts.withColumn("cl", (col("x") % k).cast("int"))
      case Some(ss) =>
        require(ss.length == k, s"graft: need $k seeds, got ${ss.length}")
        val dists = ss.map { case (cx, cy) =>
          val dx = col("x").cast("double") - lit(cx)
          val dy = col("y").cast("double") - lit(cy)
          dx * dx + dy * dy
        }
        val assign = (0 until k - 1).foldRight(lit(k - 1): Column) { (j, e) =>
          when((j + 1 until k).map(m => dists(j) <= dists(m)).reduce(_ && _),
            lit(j)).otherwise(e)
        }
        pts.withColumn("cl", assign.cast("int"))
    }
    var cents = seeds.getOrElse(Array.fill(k)((0.0, 0.0)))
    for (_ <- 0 until iters) {
      val sums = assigned.groupBy("cl")
        .agg(sum("x").as("sx"), sum("y").as("sy"), count(lit(1)).as("cn"))
        .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
      cents = (0 until k).toArray.map { j =>
        sums.get(j).map { case (sx, sy, cn) =>
          (sx.toDouble / cn.toDouble, sy.toDouble / cn.toDouble)
        }.getOrElse(cents(j))
      }
      val dists = cents.map { case (cx, cy) =>
        val dx = col("x").cast("double") - lit(cx); val dy = col("y").cast("double") - lit(cy)
        dx * dx + dy * dy
      }
      val assign = (0 until k - 1).foldRight(lit(k - 1): Column) { (j, elseCol) =>
        val conds = (j + 1 until k).map(m => dists(j) <= dists(m)).reduce(_ && _)
        when(conds, lit(j)).otherwise(elseCol)
      }
      assigned = pts.withColumn("cl", assign.cast("int"))
    }
    // final mean update so the returned centroids ARE the means of the
    // returned assignment (matches the SQL chain's last c{iters} row)
    val fin = assigned.groupBy("cl")
      .agg(sum("x").as("sx"), sum("y").as("sy"), count(lit(1)).as("cn"))
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    cents = (0 until k).toArray.map { j =>
      fin.get(j).map { case (sx, sy, cn) =>
        (sx.toDouble / cn.toDouble, sy.toDouble / cn.toDouble)
      }.getOrElse(cents(j))
    }
    (assigned, cents)
  }

  // ---------------------------------------------------------------
  // Logistic regression (logregr.cpp / optimize/gd): full-batch GD
  // with order-free quantized gradient sums.
  // ---------------------------------------------------------------

  /** Hard sigmoid (clip(z/4 + 0.5, 0, 1)) as shared SQL text — a pure
    * +,*,/ surrogate both engines evaluate bit-identically (the true
    * exp() is libm-dependent and NOT cross-engine reproducible). */
  def hardSigmoidSql(z: String): String =
    s"least(greatest($z / 4e0 + 5e-1, 0e0), 1e0)"

  /**
   * GD chain as one SQL text over `pts(x1, x2, y)` (doubles/int),
   * runnable by Spark SQL and DuckDB: `iters` full-batch steps,
   * per-coordinate gradient sums floor-quantized to 1e-9 (exact LONG
   * sums → deterministic under any partitioning). Output: one row
   * (w0, w1, w2, n_pos_pred).
   */
  def logregrSql(iters: Int, lr: Double): String = {
    val sb = new StringBuilder("WITH w0 AS (SELECT 0e0 AS w0, 0e0 AS w1, 0e0 AS w2),\n")
    for (t <- 0 until iters) {
      val z = s"(w0 + w1 * x1 + w2 * x2)"
      val err = s"(${hardSigmoidSql(z)} - CAST(y AS DOUBLE))"
      sb.append(
        s"""g$t AS (SELECT count(*) AS n,
           |  sum(CAST(floor($err * 1e9) AS BIGINT)) AS g0,
           |  sum(CAST(floor($err * x1 * 1e9) AS BIGINT)) AS g1,
           |  sum(CAST(floor($err * x2 * 1e9) AS BIGINT)) AS g2
           |FROM pts, w$t),\n""".stripMargin)
      sb.append(
        s"""w${t + 1} AS (SELECT
           |  w0 - ${dlit(lr)} * (CAST(g0 AS DOUBLE) / 1e9) / CAST(n AS DOUBLE) AS w0,
           |  w1 - ${dlit(lr)} * (CAST(g1 AS DOUBLE) / 1e9) / CAST(n AS DOUBLE) AS w1,
           |  w2 - ${dlit(lr)} * (CAST(g2 AS DOUBLE) / 1e9) / CAST(n AS DOUBLE) AS w2
           |FROM g$t, w$t),\n""".stripMargin)
    }
    val z = s"(w0 + w1 * x1 + w2 * x2)"
    sb.append(
      s"""p AS (SELECT count(*) AS n_pos_pred FROM pts, w$iters
         |WHERE ${hardSigmoidSql(z)} >= 5e-1)
         |SELECT w0, w1, w2, (SELECT n_pos_pred FROM p) AS n_pos_pred
         |FROM w$iters""".stripMargin)
    sb.toString
  }

  /**
   * Production GD trainer: driver loop, one quantized-gradient
   * aggregate per step. trueSigmoid=true uses Math.exp (converges
   * like the reference; reproducible on one JVM, not cross-engine).
   */
  def logregr(pts: DataFrame, iters: Int, lr: Double,
      trueSigmoid: Boolean = false): Array[Double] = {
    var w = Array(0.0, 0.0, 0.0)
    for (_ <- 0 until iters) {
      val z = lit(w(0)) + lit(w(1)) * col("x1") + lit(w(2)) * col("x2")
      val sig = if (trueSigmoid) lit(1.0) / (lit(1.0) + exp(-z))
        else least(greatest(z / lit(4.0) + lit(0.5), lit(0.0)), lit(1.0))
      val err = sig - col("y").cast("double")
      val r = pts.agg(count(lit(1)),
        sum(floor(err * lit(1e9)).cast("long")),
        sum(floor(err * col("x1") * lit(1e9)).cast("long")),
        sum(floor(err * col("x2") * lit(1e9)).cast("long"))).collect()(0)
      val n = r.getLong(0).toDouble
      w = Array(
        w(0) - lr * (r.getLong(1).toDouble / 1e9) / n,
        w(1) - lr * (r.getLong(2).toDouble / 1e9) / n,
        w(2) - lr * (r.getLong(3).toDouble / 1e9) / n)
    }
    w
  }

  /**
   * Deterministic farthest-first seeding (the k-means++ spirit
   * without its randomness — Gonzalez's 2-approximation traversal):
   * seed 1 = lexicographically smallest point; each next seed
   * maximizes the exact-LONG min-squared-distance to the chosen set,
   * ties → smallest (x, y). k bounded TakeOrdered passes, never a
   * global sort; use when the data's first coordinate correlates with
   * cluster structure and partition init would start degenerate.
   */
  def farthestSeeds(pts: DataFrame, k: Int): Array[(Double, Double)] = {
    val first = pts.select(col("x").cast("long"), col("y").cast("long"))
      .orderBy("x", "y").limit(1).collect()(0)
    var chosen = Vector((first.getLong(0), first.getLong(1)))
    while (chosen.size < k) {
      val minD = chosen.map { case (cx, cy) =>
        (col("x").cast("long") - lit(cx)) * (col("x").cast("long") - lit(cx)) +
          (col("y").cast("long") - lit(cy)) * (col("y").cast("long") - lit(cy))
      }.reduce(least(_, _))
      val next = pts.select(col("x").cast("long").as("x"),
          col("y").cast("long").as("y"), minD.as("d"))
        .orderBy(col("d").desc, col("x"), col("y")).limit(1).collect()(0)
      chosen = chosen :+ ((next.getLong(0), next.getLong(1)))
    }
    chosen.map { case (x, y) => (x.toDouble, y.toDouble) }.toArray
  }

  /**
   * n-dimensional Lloyd (kmeans.cpp supports arbitrary dims): same
   * discipline as the 2-D gate path — partition init on the first
   * feature, one k-row exact-LONG aggregate per iteration, centroid
   * doubles on the driver, nearest-centroid ties → smaller id.
   * Returns (assigned DF with `cl`, centroids[k][d]).
   */
  def kmeansND(df: DataFrame, features: Seq[String], k: Int,
      iters: Int): (DataFrame, Array[Array[Double]]) = {
    val d = features.size
    require(d >= 1, "graft: kmeansND needs at least one feature")
    val pts = df.select(features.zipWithIndex.map { case (f, i) =>
      col(f).cast("long").as(s"f$i") }: _*)
    var assigned = pts.withColumn("cl", (col("f0") % k).cast("int"))
    var cents = Array.fill(k)(Array.fill(d)(0.0))
    def assignCol: Column = {
      val dists = cents.map { c =>
        (0 until d).map { i =>
          val dx = col(s"f$i").cast("double") - lit(c(i)); dx * dx
        }.reduce(_ + _)
      }
      (0 until k - 1).foldRight(lit(k - 1): Column) { (j, elseCol) =>
        val conds = (j + 1 until k).map(m => dists(j) <= dists(m)).reduce(_ && _)
        when(conds, lit(j)).otherwise(elseCol)
      }.cast("int")
    }
    def updateCents(): Unit = {
      val aggs = (0 until d).map(i => sum(s"f$i").as(s"s$i")) :+
        count(lit(1)).as("cn")
      val sums = assigned.groupBy("cl").agg(aggs.head, aggs.tail: _*)
        .collect().map { r =>
          r.getInt(0) -> ((0 until d).map(i => r.getLong(i + 1)).toArray,
            r.getLong(d + 1))
        }.toMap
      cents = (0 until k).toArray.map { j =>
        sums.get(j).map { case (s, cn) =>
          s.map(_.toDouble / cn.toDouble)
        }.getOrElse(cents(j))
      }
    }
    for (_ <- 0 until iters) {
      updateCents()
      assigned = pts.withColumn("cl", assignCol)
    }
    updateCents() // final means = means of the returned assignment
    (assigned, cents)
  }

  /**
   * n-feature GD (logregr/svm over arbitrary feature lists): same
   * quantized order-free gradient sums as the 2-feature chains.
   * `hinge=false` → hard-sigmoid logistic; `hinge=true` → SVM with
   * labels in {-1,+1} and L2 `lambda`.
   */
  def gdND(pts: DataFrame, features: Seq[String], labelCol: String,
      iters: Int, lr: Double, hinge: Boolean = false,
      lambda: Double = 0.0): Array[Double] = {
    val p = features.size
    var w = Array.fill(p + 1)(0.0)
    val xs = lit(1.0) +: features.map(col(_).cast("double"))
    for (_ <- 0 until iters) {
      val z = xs.zip(w).map { case (x, wi) => x * lit(wi) }.reduce(_ + _)
      val yD = col(labelCol).cast("double")
      val contribs: Seq[Column] =
        if (hinge) {
          val viol = yD * z < lit(1.0)
          xs.map(x => sum(when(viol,
            floor(-yD * x * lit(1e9)).cast("long")).otherwise(0L)))
        } else {
          val err = least(greatest(z / lit(4.0) + lit(0.5), lit(0.0)), lit(1.0)) - yD
          xs.map(x => sum(floor(err * x * lit(1e9)).cast("long")))
        }
      val r = pts.agg(count(lit(1)), contribs: _*).collect()(0)
      val n = r.getLong(0).toDouble
      w = w.zipWithIndex.map { case (wi, i) =>
        val g = r.getLong(i + 1).toDouble / 1e9 / n
        val reg = if (hinge && i > 0) lambda * wi else 0.0
        wi - lr * (g + reg)
      }
    }
    w
  }

  // ---------------------------------------------------------------
  // One-vs-rest multiclass (multiclass.cpp wrapping the GD binary
  // models): K independent hard-sigmoid GD chains + score argmax.
  // ---------------------------------------------------------------

  /**
   * Multiclass chain as one SQL text over `pts(x1, x2, cls)` with
   * cls ∈ 0..k-1, runnable by Spark SQL and DuckDB: per class an
   * independent quantized-GD chain (label = cls==c), then prediction
   * by linear-score argmax (ties → smaller class, same CASE
   * discipline as kmeans). Output: the confusion matrix
   * (cls, pred, n), ≤ k² rows.
   */
  def multiclassSql(k: Int, iters: Int, lr: Double): String = {
    val sb = new StringBuilder("WITH ")
    for (c <- 0 until k) {
      val yc = s"CAST(CASE WHEN cls = $c THEN 1 ELSE 0 END AS DOUBLE)"
      sb.append(s"w${c}_0 AS (SELECT 0e0 AS w0, 0e0 AS w1, 0e0 AS w2),\n")
      for (t <- 0 until iters) {
        val z = s"(w0 + w1 * x1 + w2 * x2)"
        val err = s"(${hardSigmoidSql(z)} - $yc)"
        sb.append(
          s"""g${c}_$t AS (SELECT count(*) AS n,
             |  sum(CAST(floor($err * 1e9) AS BIGINT)) AS g0,
             |  sum(CAST(floor($err * x1 * 1e9) AS BIGINT)) AS g1,
             |  sum(CAST(floor($err * x2 * 1e9) AS BIGINT)) AS g2
             |FROM pts, w${c}_$t),\n""".stripMargin)
        sb.append(
          s"""w${c}_${t + 1} AS (SELECT
             |  w0 - ${dlit(lr)} * (CAST(g0 AS DOUBLE) / 1e9) / CAST(n AS DOUBLE) AS w0,
             |  w1 - ${dlit(lr)} * (CAST(g1 AS DOUBLE) / 1e9) / CAST(n AS DOUBLE) AS w1,
             |  w2 - ${dlit(lr)} * (CAST(g2 AS DOUBLE) / 1e9) / CAST(n AS DOUBLE) AS w2
             |FROM g${c}_$t, w${c}_$t),\n""".stripMargin)
      }
    }
    val froms = (0 until k).map(c => s"w${c}_$iters m$c").mkString(", ")
    val scores = (0 until k).map(c => s"(m$c.w0 + m$c.w1 * x1 + m$c.w2 * x2) AS s$c")
    val argmax = {
      val cases = (0 until k - 1).map { c =>
        val conds = (c + 1 until k).map(m => s"s$c >= s$m").mkString(" AND ")
        s"WHEN $conds THEN $c"
      }
      s"CASE ${cases.mkString(" ")} ELSE ${k - 1} END"
    }
    sb.append(
      s"""scored AS (SELECT cls, ${scores.mkString(", ")} FROM pts, $froms),
         |pred AS (SELECT cls, $argmax AS pred FROM scored)
         |SELECT cls, pred, CAST(count(*) AS BIGINT) AS n
         |FROM pred GROUP BY cls, pred ORDER BY cls, pred""".stripMargin)
    sb.toString
  }

  /** Production one-vs-rest: k binary [[logregr]] fits over relabeled
    * data + argmax predict column. Returns (weights per class,
    * DataFrame with cls/pred). */
  def multiclass(pts: DataFrame, k: Int, iters: Int, lr: Double): (Seq[Array[Double]], DataFrame) = {
    val ws = (0 until k).map { c =>
      logregr(pts.withColumn("y", (col("cls") === c).cast("int")), iters, lr)
    }
    val scores = ws.map(w => lit(w(0)) + lit(w(1)) * col("x1") + lit(w(2)) * col("x2"))
    val argmax = (0 until k - 1).foldRight(lit(k - 1): Column) { (c, elseCol) =>
      val conds = (c + 1 until k).map(m => scores(c) >= scores(m)).reduce(_ && _)
      when(conds, lit(c)).otherwise(elseCol)
    }
    (ws, pts.withColumn("pred", argmax.cast("int")))
  }

  // ---------------------------------------------------------------
  // Linear SVM (svm.cpp / gd.h "svmc"): hinge loss + L2, full-batch
  // subgradient descent with the same quantized order-free sums.
  // ---------------------------------------------------------------

  /**
   * SVM GD chain as one SQL text over `pts(x1, x2, y)` with y ∈
   * {-1, +1}, runnable by Spark SQL and DuckDB. Subgradient of
   * hinge(y·z): -y·x when y·z < 1 else 0; L2 term applied once per
   * step on the driver side of the update (w·λ is already exact).
   * Output: one row (w0, w1, w2, n_sv, n_pos_pred).
   */
  def svmSql(iters: Int, lr: Double, lambda: Double): String = {
    val sb = new StringBuilder("WITH w0 AS (SELECT 0e0 AS w0, 0e0 AS w1, 0e0 AS w2),\n")
    for (t <- 0 until iters) {
      val z = s"(w0 + w1 * x1 + w2 * x2)"
      val viol = s"(CAST(y AS DOUBLE) * $z < 1e0)"
      sb.append(
        s"""g$t AS (SELECT count(*) AS n,
           |  sum(CASE WHEN $viol THEN CAST(floor(-CAST(y AS DOUBLE) * 1e9) AS BIGINT) ELSE 0 END) AS g0,
           |  sum(CASE WHEN $viol THEN CAST(floor(-CAST(y AS DOUBLE) * x1 * 1e9) AS BIGINT) ELSE 0 END) AS g1,
           |  sum(CASE WHEN $viol THEN CAST(floor(-CAST(y AS DOUBLE) * x2 * 1e9) AS BIGINT) ELSE 0 END) AS g2
           |FROM pts, w$t),\n""".stripMargin)
      sb.append(
        s"""w${t + 1} AS (SELECT
           |  w0 - ${dlit(lr)} * (CAST(g0 AS DOUBLE) / 1e9 / CAST(n AS DOUBLE)) AS w0,
           |  w1 - ${dlit(lr)} * (CAST(g1 AS DOUBLE) / 1e9 / CAST(n AS DOUBLE) + ${dlit(lambda)} * w1) AS w1,
           |  w2 - ${dlit(lr)} * (CAST(g2 AS DOUBLE) / 1e9 / CAST(n AS DOUBLE) + ${dlit(lambda)} * w2) AS w2
           |FROM g$t, w$t),\n""".stripMargin)
    }
    val z = s"(w0 + w1 * x1 + w2 * x2)"
    sb.append(
      s"""sv AS (SELECT
         |  CAST(sum(CASE WHEN CAST(y AS DOUBLE) * $z < 1e0 THEN 1 ELSE 0 END) AS BIGINT) AS n_sv,
         |  CAST(sum(CASE WHEN $z >= 0e0 THEN 1 ELSE 0 END) AS BIGINT) AS n_pos_pred
         |FROM pts, w$iters)
         |SELECT w0, w1, w2, (SELECT n_sv FROM sv) AS n_sv,
         |  (SELECT n_pos_pred FROM sv) AS n_pos_pred
         |FROM w$iters""".stripMargin)
    sb.toString
  }

  /** Production SVM trainer: driver loop mirroring [[svmSql]]. */
  def svm(pts: DataFrame, iters: Int, lr: Double, lambda: Double): Array[Double] = {
    var w = Array(0.0, 0.0, 0.0)
    for (_ <- 0 until iters) {
      val z = lit(w(0)) + lit(w(1)) * col("x1") + lit(w(2)) * col("x2")
      val yD = col("y").cast("double")
      val viol = yD * z < lit(1.0)
      def g(xc: Column) =
        sum(when(viol, floor(-yD * xc * lit(1e9)).cast("long")).otherwise(0L))
      val r = pts.agg(count(lit(1)), g(lit(1.0)), g(col("x1")), g(col("x2"))).collect()(0)
      val n = r.getLong(0).toDouble
      w = Array(
        w(0) - lr * (r.getLong(1).toDouble / 1e9 / n),
        w(1) - lr * (r.getLong(2).toDouble / 1e9 / n + lambda * w(1)),
        w(2) - lr * (r.getLong(3).toDouble / 1e9 / n + lambda * w(2)))
    }
    w
  }

  // ---------------------------------------------------------------
  // Naive Bayes (bayes.cpp): categorical features, Laplace smoothing,
  // exact cross-multiplied posterior comparison.
  // ---------------------------------------------------------------

  /**
   * Fit + self-predict for 2 categorical features and a binary class:
   * the model is three broadcast count tables (class priors and
   * per-feature conditional counts); prediction joins them back and
   * compares the two posteriors EXACTLY by cross-multiplying the
   * integer numerators/denominators in DECIMAL(38,0) — no float
   * probabilities, so the argmax is reproducible bit-for-bit. Ties →
   * class 0 (matches the oracle's strict > on class 1).
   */
  def nbayesPredict(df: DataFrame, f1: Column, f2: Column, y: Column,
      idCol: Column): DataFrame = {
    val base = df.select(idCol.as("id"), f1.as("f1"), f2.as("f2"),
      y.cast("int").as("cls"))
    val classes = base.groupBy("cls").agg(count(lit(1)).as("n_c"))
    val v1 = base.agg(countDistinct("f1").as("v1"))
    val v2 = base.agg(countDistinct("f2").as("v2"))
    val c1 = base.groupBy("f1", "cls").agg(count(lit(1)).as("cnt1"))
    val c2 = base.groupBy("f2", "cls").agg(count(lit(1)).as("cnt2"))
    // pivot class stats to one row: n0, n1
    val priors = classes.agg(
      max(when(col("cls") === 0, col("n_c"))).as("n0"),
      max(when(col("cls") === 1, col("n_c"))).as("n1"))
    val d38 = DecimalType(38, 0)
    val scored = base
      .join(broadcast(c1.filter(col("cls") === 0)
        .select(col("f1"), col("cnt1").as("c1_0"))), Seq("f1"), "left")
      .join(broadcast(c1.filter(col("cls") === 1)
        .select(col("f1"), col("cnt1").as("c1_1"))), Seq("f1"), "left")
      .join(broadcast(c2.filter(col("cls") === 0)
        .select(col("f2"), col("cnt2").as("c2_0"))), Seq("f2"), "left")
      .join(broadcast(c2.filter(col("cls") === 1)
        .select(col("f2"), col("cnt2").as("c2_1"))), Seq("f2"), "left")
      .crossJoin(broadcast(priors))
      .crossJoin(broadcast(v1))
      .crossJoin(broadcast(v2))
      .na.fill(0L, Seq("c1_0", "c1_1", "c2_0", "c2_1"))
    // A_c = n_c (c1_c+1)(c2_c+1); B_c = (n_c+V1)(n_c+V2)
    def a(c: Int) = (col(s"n$c") * (col(s"c1_$c") + 1) * (col(s"c2_$c") + 1)).cast(d38)
    def b(c: Int) = ((col(s"n$c") + col("v1")) * (col(s"n$c") + col("v2"))).cast(d38)
    scored.select(col("id"), col("f1"), col("f2"), col("cls"),
      when(a(1) * b(0) > a(0) * b(1), 1).otherwise(0).as("pred"))
  }

  // ---------------------------------------------------------------
  // Gradient-boosted stumps (xgboost.cpp's algorithm family, squared
  // loss): T rounds of depth-1 regression trees over 2 integer
  // features.
  // ---------------------------------------------------------------

  /** F(x) after `upto` rounds, as shared SQL text (model rows m1..m_t
    * must be in scope via cross join). */
  private def gbdtFExpr(upto: Int): String = {
    val terms = (1 to upto).map { r =>
      s"(CASE WHEN (m$r.feat = 1 AND x1 <= m$r.thr) OR (m$r.feat = 2 AND x2 <= m$r.thr)" +
        s" THEN m$r.lval ELSE m$r.rval END)"
    }
    (s"f0.f0" +: terms).mkString(" + ")
  }

  /**
   * Boosted-stump chain as one SQL text over `pts(x1, x2, y)` with
   * integer features and LONG label, runnable by Spark SQL and DuckDB.
   *
   * Round structure (all exact until the final leaf means):
   *  - residuals floor-quantized to 1e-3 → exact LONG sums;
   *  - per-feature split stats via ONE groupBy per feature (V rows)
   *    + a cumulative window — every candidate threshold priced in
   *    one pass, no point×threshold blowup;
   *  - best (feat, thr) by variance-gain argmax, ties → (feat, v)
   *    so the double comparison is still deterministic;
   *  - leaves are lr-scaled residual means.
   * Output: one row per round (round, feat, thr, lval, rval).
   */
  def gbdtSql(rounds: Int, lr: Double): String = {
    val sb = new StringBuilder("WITH f0 AS (SELECT " +
      "CAST(CAST(sum(y) AS BIGINT) AS DOUBLE) / CAST(count(*) AS BIGINT) AS f0 FROM pts),\n")
    for (t <- 1 to rounds) {
      val models = (1 until t).map(r => s"m$r").mkString(", ")
      val from = if (t == 1) "pts, f0" else s"pts, f0, $models"
      sb.append(
        s"""resid$t AS (SELECT x1, x2,
           |  CAST(floor((CAST(y AS DOUBLE) - (${gbdtFExpr(t - 1)})) * 1e3) AS BIGINT) AS q
           |FROM $from),\n""".stripMargin)
      for (f <- 1 to 2) {
        sb.append(
          s"""s${t}_$f AS (SELECT x$f AS v, CAST(count(*) AS BIGINT) AS cnt,
             |  CAST(sum(q) AS BIGINT) AS sq FROM resid$t GROUP BY x$f),\n""".stripMargin)
        sb.append(
          s"""c${t}_$f AS (SELECT v,
             |  CAST(sum(cnt) OVER (ORDER BY v) AS BIGINT) AS cl,
             |  CAST(sum(sq) OVER (ORDER BY v) AS BIGINT) AS sl,
             |  (SELECT CAST(sum(cnt) AS BIGINT) FROM s${t}_$f) AS n,
             |  (SELECT CAST(sum(sq) AS BIGINT) FROM s${t}_$f) AS stot
             |FROM s${t}_$f),\n""".stripMargin)
      }
      val gainCols =
        "CAST(sl AS DOUBLE) * CAST(sl AS DOUBLE) / CAST(cl AS DOUBLE)" +
          " + CAST(stot - sl AS DOUBLE) * CAST(stot - sl AS DOUBLE) / CAST(n - cl AS DOUBLE)"
      sb.append(
        s"""m$t AS (SELECT feat, v AS thr,
           |  ${dlit(lr)} * (CAST(sl AS DOUBLE) / 1e3) / CAST(cl AS DOUBLE) AS lval,
           |  ${dlit(lr)} * (CAST(stot - sl AS DOUBLE) / 1e3) / CAST(n - cl AS DOUBLE) AS rval
           |FROM (
           |  SELECT 1 AS feat, v, cl, sl, n, stot, $gainCols AS gain FROM c${t}_1 WHERE cl < n
           |  UNION ALL
           |  SELECT 2 AS feat, v, cl, sl, n, stot, $gainCols AS gain FROM c${t}_2 WHERE cl < n)
           |ORDER BY gain DESC, feat, v LIMIT 1),\n""".stripMargin)
    }
    sb.setLength(sb.length - 2) // drop the last CTE's trailing ",\n"
    sb.append("\n")
    val out = (1 to rounds).map(t =>
      s"SELECT $t AS round, feat, thr, lval, rval FROM m$t")
    sb.append(out.mkString(" UNION ALL ")).append(" ORDER BY round")
    sb.toString
  }

  /** One depth-2 regression tree: root split + one split per side
    * (a degenerate side collapses both its leaves to the side mean,
    * childThr = Long.MinValue so the left branch never fires). */
  case class Tree2(feat0: Int, thr0: Long,
      featL: Int, thrL: Long, llv: Double, lrv: Double,
      featR: Int, thrR: Long, rlv: Double, rrv: Double)

  /** Driver-state bound for split search: past this many distinct
    * feature values, candidates are quantile-pre-binned (the xgboost
    * approx regime) so the driver collects O(bins), never O(V). */
  val SplitMaxBins = 256

  /** Diagnostic: how many split searches took the binned path this
    * JVM (lets specs assert the bounded path really executed). */
  @volatile private[graft] var binnedSplitRuns: Long = 0L

  /** Best (gain, feat, thr, cl, sl, n, stot) over both features for
    * the rows passing `cond`; None when no valid split exists.
    *
    * SCALE BOUND (r12 verdict): the per-value aggregate stays
    * distributed and is cached so it computes once; the driver probes
    * it with a top-(SplitMaxBins+1) collect. V ≤ [[SplitMaxBins]]
    * means that probe IS the complete sorted value table
    * (bit-identical gates on gridded features). Past that, feature
    * values quantile-bin to ≤ SplitMaxBins buckets (edges via the GK
    * sketch, one extra pass like xgboost's approx split finding), the
    * per-bin re-aggregate runs on the ALREADY-AGGREGATED V-row table,
    * and each bin's threshold is its exact max value — driver state
    * is O(bins) regardless of cardinality. */
  private def bestSplit(pts: DataFrame, q: Column, cond: Column,
      lambda: Double = 0.0)
      : Option[(Double, Int, Long, Long, Long, Long, Long)] = {
    // BOTH features' per-value aggregates in ONE distributed pass:
    // each row explodes into (feat, value) pairs and one groupBy(f, v)
    // replaces the per-feature groupBy — the base data is read once
    // per round instead of once per feature, and the feature probes
    // below hit the cached V-row table (2 tiny jobs, no rescans).
    val filtered = pts.filter(cond)
    val perValue = filtered
      .select(explode(array(
        struct(lit(1).as("f"), col("x1").cast("long").as("v")),
        struct(lit(2).as("f"), col("x2").cast("long").as("v")))).as("p"),
        q.as("q"))
      .groupBy(col("p.f").as("f"), col("p.v").as("v"))
      .agg(count(lit(1)).as("cnt"), sum("q").as("sq"))
      .cache()
    val cands = try (1 to 2).flatMap { f =>
      val mine = perValue.filter(col("f") === f).select("v", "cnt", "sq")
      val stats: Array[(Long, Long, Long)] = {
          // top-(B+1) probe replaces a separate count(): ≤ B rows back
          // means the collect IS the complete sorted value table
          val head = mine.orderBy("v").limit(SplitMaxBins + 1).collect()
          if (head.length <= SplitMaxBins) {
            head.map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
          } else {
            binnedSplitRuns += 1
            val probs = (1 until SplitMaxBins).map(_.toDouble / SplitMaxBins).toArray
            val edges = filtered
              .select(col(s"x$f").cast("long").as("v")).stat
              .approxQuantile("v", probs, 1.0 / (4.0 * SplitMaxBins))
              .distinct.sorted
            val edgeArr = array(edges.map(e => lit(e)): _*)
            mine
              .withColumn("bin", aggregate(edgeArr, lit(0),
                (acc, e) => acc + when(col("v").cast("double") > e, 1).otherwise(0)))
              .groupBy("bin")
              .agg(sum("cnt").as("cnt"), sum("sq").as("sq"), max("v").as("vmax"))
              .orderBy("bin").collect()
              .map(r => (r.getLong(3), r.getLong(1), r.getLong(2)))
          }
        }
      val n = stats.map(_._2).sum
      val stot = stats.map(_._3).sum
      var cl = 0L; var sl = 0L
      stats.dropRight(1).map { case (v, cnt, sq) =>
        cl += cnt; sl += sq
        // λ-damped two-side score (xgboost's GL²/(HL+λ) with h = 1
        // per point); λ = 0 is bit-identical to the unregularized
        // variance gain (x + 0.0 == x for the positive counts here)
        val gain = sl.toDouble * sl.toDouble / (cl.toDouble + lambda) +
          (stot - sl).toDouble * (stot - sl).toDouble /
            ((n - cl).toDouble + lambda)
        (gain, f, v, cl, sl, n, stot)
      }
    } finally perValue.unpersist(blocking = false)
    if (cands.isEmpty) None
    else Some(cands.minBy { case (g, f, v, _, _, _, _) => (-g, f, v) })
  }

  /**
   * Depth-2 gradient boosting (captures pairwise feature interactions
   * a stump ensemble cannot — e.g. XOR-shaped targets): per round the
   * root split then one split per side, leaves = lr-scaled residual
   * means of the 4 regions. Work per round: 6 bounded aggregates (2
   * features × {root, left, right}), model-sized driver state — the
   * same scale shape as [[gbdt]].
   */
  def gbdtDepth2(pts: DataFrame, rounds: Int, lr: Double): (Double, Seq[Tree2]) = {
    val base = pts.agg(sum("y").cast("long"), count(lit(1))).collect()(0)
    val f0 = base.getLong(0).toDouble / base.getLong(1).toDouble
    var model = Vector.empty[Tree2]
    def fCol: Column = model.foldLeft(lit(f0)) { case (acc, t) =>
      acc + when(col(s"x${t.feat0}") <= lit(t.thr0),
        when(col(s"x${t.featL}") <= lit(t.thrL), lit(t.llv)).otherwise(lit(t.lrv)))
        .otherwise(
          when(col(s"x${t.featR}") <= lit(t.thrR), lit(t.rlv)).otherwise(lit(t.rrv)))
    }
    for (_ <- 1 to rounds) {
      val q = floor((col("y").cast("double") - fCol) * lit(1e3)).cast("long")
      val (_, f0i, thr0, _, _, _, _) = bestSplit(pts, q, lit(true))
        .getOrElse(throw new IllegalStateException(
          "graft: no valid root split — all feature values identical"))
      def side(cond: Column): (Int, Long, Double, Double) =
        bestSplit(pts, q, cond) match {
          case Some((_, f, v, cl, sl, n, stot)) =>
            (f, v, lr * (sl.toDouble / 1e3) / cl.toDouble,
              lr * ((stot - sl).toDouble / 1e3) / (n - cl).toDouble)
          case None => // degenerate side: collapse to the side mean
            val r = pts.filter(cond).agg(sum(q), count(lit(1))).collect()(0)
            val mean = if (r.getLong(1) == 0) 0.0
              else lr * (r.getLong(0).toDouble / 1e3) / r.getLong(1).toDouble
            (1, Long.MinValue, mean, mean)
        }
      val (fl, tl, llv, lrv) = side(col(s"x$f0i") <= lit(thr0))
      val (fr, tr, rlv, rrv) = side(col(s"x$f0i") > lit(thr0))
      model = model :+ Tree2(f0i, thr0, fl, tl, llv, lrv, fr, tr, rlv, rrv)
    }
    (f0, model)
  }

  /**
   * Depth-2 boosting chain as ONE SQL text over `pts(x1, x2, y)`,
   * runnable by Spark SQL and DuckDB — the oracle twin of
   * [[gbdtDepth2]]: identical residual quantization, split pricing,
   * argmax tie keys (gain DESC, feat, v), lr-scaled leaf means, and
   * the degenerate-side collapse (no valid child split → feat 1,
   * thr = LONG_MIN, both leaves the side mean). Output: one row per
   * round with the full Tree2 parameter set.
   *
   * `materialized` pins every CTE as MATERIALIZED (DuckDB syntax; the
   * oracle path) — the chain's fan-out (each tree references 3 fused
   * side CTEs over 6 split tables) explodes multiplicatively when
   * inlined, to the point of exhausting file handles on the source
   * parquet. Spark SQL (the parity-spec path) doesn't accept the
   * keyword and doesn't need it at spec scale.
   */
  def gbdtDepth2Sql(rounds: Int, lr: Double,
      materialized: Boolean = false): String = {
    val minLong = "CAST(-9223372036854775807 - 1 AS BIGINT)"
    def fTerm(r: Int): String =
      s"(CASE WHEN (t$r.feat0 = 1 AND x1 <= t$r.thr0) OR (t$r.feat0 = 2 AND x2 <= t$r.thr0)" +
        s" THEN (CASE WHEN (t$r.featL = 1 AND x1 <= t$r.thrL) OR (t$r.featL = 2 AND x2 <= t$r.thrL)" +
        s" THEN t$r.llv ELSE t$r.lrv END)" +
        s" ELSE (CASE WHEN (t$r.featR = 1 AND x1 <= t$r.thrR) OR (t$r.featR = 2 AND x2 <= t$r.thrR)" +
        s" THEN t$r.rlv ELSE t$r.rrv END) END)"
    val gain =
      "CAST(sl AS DOUBLE) * CAST(sl AS DOUBLE) / CAST(cl AS DOUBLE)" +
        " + CAST(stot - sl AS DOUBLE) * CAST(stot - sl AS DOUBLE) / CAST(n - cl AS DOUBLE)"
    val sb = new StringBuilder("WITH f0 AS (SELECT " +
      "CAST(CAST(sum(y) AS BIGINT) AS DOUBLE) / CAST(count(*) AS BIGINT) AS f0 FROM pts),\n")
    for (t <- 1 to rounds) {
      val models = (1 until t).map(r => s"t$r").mkString(", ")
      val from = if (t == 1) "pts, f0" else s"pts, f0, $models"
      val fExpr = (s"f0.f0" +: (1 until t).map(fTerm)).mkString(" + ")
      sb.append(s"rs$t AS (SELECT x1, x2, " +
        s"CAST(floor((CAST(y AS DOUBLE) - ($fExpr)) * 1e3) AS BIGINT) AS q FROM $from),\n")
      // split-search CTE block over a row source (same shape as the
      // stump chain's s/c/m trio, prefixed for root/left/right)
      def search(src: String, pre: String): Unit = {
        for (f <- 1 to 2) {
          sb.append(s"${pre}a${t}_$f AS (SELECT x$f AS v, CAST(count(*) AS BIGINT) AS cnt, " +
            s"CAST(sum(q) AS BIGINT) AS sq FROM $src GROUP BY x$f),\n")
          sb.append(s"${pre}b${t}_$f AS (SELECT v, " +
            s"CAST(sum(cnt) OVER (ORDER BY v) AS BIGINT) AS cl, " +
            s"CAST(sum(sq) OVER (ORDER BY v) AS BIGINT) AS sl, " +
            s"(SELECT CAST(sum(cnt) AS BIGINT) FROM ${pre}a${t}_$f) AS n, " +
            s"(SELECT CAST(sum(sq) AS BIGINT) FROM ${pre}a${t}_$f) AS stot " +
            s"FROM ${pre}a${t}_$f),\n")
        }
        sb.append(s"${pre}m$t AS (SELECT feat, v AS thr, " +
          s"${dlit(lr)} * (CAST(sl AS DOUBLE) / 1e3) / CAST(cl AS DOUBLE) AS lval, " +
          s"${dlit(lr)} * (CAST(stot - sl AS DOUBLE) / 1e3) / CAST(n - cl AS DOUBLE) AS rval FROM (" +
          s"SELECT 1 AS feat, v, cl, sl, n, stot, $gain AS gain FROM ${pre}b${t}_1 WHERE cl < n" +
          s" UNION ALL SELECT 2 AS feat, v, cl, sl, n, stot, $gain AS gain FROM ${pre}b${t}_2 WHERE cl < n) " +
          s"ORDER BY gain DESC, feat, v LIMIT 1),\n")
      }
      search(s"rs$t", "r") // root
      sb.append(s"lrow$t AS (SELECT rs.x1, rs.x2, rs.q FROM rs$t rs, rm$t r " +
        s"WHERE (r.feat = 1 AND rs.x1 <= r.thr) OR (r.feat = 2 AND rs.x2 <= r.thr)),\n")
      sb.append(s"zrow$t AS (SELECT rs.x1, rs.x2, rs.q FROM rs$t rs, rm$t r " +
        s"WHERE NOT ((r.feat = 1 AND rs.x1 <= r.thr) OR (r.feat = 2 AND rs.x2 <= r.thr))),\n")
      search(s"lrow$t", "l") // left child
      search(s"zrow$t", "z") // right child
      def sideFuse(pre: String, fc: String, tc: String, lv: String, rv: String): Unit = {
        val mean = s"CASE WHEN s.cnt = 0 THEN 0e0 ELSE " +
          s"${dlit(lr)} * (CAST(s.sq AS DOUBLE) / 1e3) / CAST(s.cnt AS DOUBLE) END"
        sb.append(s"${pre}s$t AS (SELECT CAST(sum(q) AS BIGINT) AS sq, " +
          s"CAST(count(*) AS BIGINT) AS cnt FROM ${pre}row$t),\n")
        sb.append(s"${pre}t$t AS (SELECT coalesce(m.feat, 1) AS $fc, " +
          s"coalesce(m.thr, $minLong) AS $tc, " +
          s"coalesce(m.lval, $mean) AS $lv, coalesce(m.rval, $mean) AS $rv " +
          s"FROM ${pre}s$t s LEFT JOIN ${pre}m$t m ON TRUE),\n")
      }
      sideFuse("l", "featL", "thrL", "llv", "lrv")
      sideFuse("z", "featR", "thrR", "rlv", "rrv")
      sb.append(s"t$t AS (SELECT r.feat AS feat0, r.thr AS thr0, " +
        s"l.featL, l.thrL, l.llv, l.lrv, z.featR, z.thrR, z.rlv, z.rrv " +
        s"FROM rm$t r, lt$t l, zt$t z),\n")
    }
    sb.setLength(sb.length - 2) // drop the last CTE's trailing ",\n"
    sb.append("\n")
    val out = (1 to rounds).map(t =>
      s"SELECT $t AS round, feat0, thr0, featL, thrL, llv, lrv, featR, thrR, rlv, rrv FROM t$t")
    sb.append(out.mkString(" UNION ALL ")).append(" ORDER BY round")
    // every CTE in this text is spelled "name AS (SELECT ..."; the
    // scalar subqueries and UNION branches are "(SELECT" without "AS "
    if (materialized) sb.toString.replace(" AS (SELECT", " AS MATERIALIZED (SELECT")
    else sb.toString
  }

  /**
   * Production boosted-stump trainer mirroring [[gbdtSql]]: per round
   * two V-row aggregates collect to the driver, the argmax and leaf
   * means are driver arithmetic. Returns (f0, rounds of
   * (feat, thr, lval, rval)).
   */
  /** F(x) of a stump model as a literal Column chain; feat = 0 rows
    * (single-leaf trees from the γ-pruned path) always add rval. */
  private def stumpF(f0: Double,
      model: Seq[(Int, Long, Double, Double)]): Column =
    model.foldLeft(lit(f0)) { case (acc, (ft, thr, lv, rv)) =>
      if (ft == 0) acc + lit(rv)
      else acc + when(col(s"x$ft") <= lit(thr), lit(lv)).otherwise(lit(rv))
    }

  def gbdt(pts: DataFrame, rounds: Int, lr: Double): (Double, Seq[(Int, Long, Double, Double)]) = {
    val base = pts.agg(sum("y").cast("long"), count(lit(1))).collect()(0)
    val f0 = base.getLong(0).toDouble / base.getLong(1).toDouble
    var model = Vector.empty[(Int, Long, Double, Double)]
    for (_ <- 1 to rounds) {
      val q = floor((col("y").cast("double") - stumpF(f0, model)) * lit(1e3)).cast("long")
      // argmax, ties → (feat, v) — shared with the depth-2 trainer
      val (_, f, v, cl, sl, n, stot) = bestSplit(pts, q, lit(true))
        .getOrElse(throw new IllegalStateException(
          "graft: no valid split — all feature values identical"))
      model = model :+ ((f, v,
        lr * (sl.toDouble / 1e3) / cl.toDouble,
        lr * ((stot - sl).toDouble / 1e3) / (n - cl).toDouble))
    }
    (f0, model)
  }

  // ---------------------------------------------------------------
  // xgboost-style regularized boosting + hyperparameter grid search
  // (ref: deepsql/madlib_modules/xgboost_gs/xgboost_sklearn.py_in —
  // the module's whole surface is "train xgboost over a parameter
  // GRID, evaluate each cell on a held-out split, emit a ranked
  // results table"; the boosting math below is the XGBoost paper's
  // squared-loss objective — leaf w* = Σr/(n+λ), split kept only
  // when ½[GL²/(HL+λ)+GR²/(HR+λ)−G²/(H+λ)] > γ — over the same
  // exact quantized-residual machinery as the stump chain).
  // ---------------------------------------------------------------

  /** One grid cell: (boosting rounds, learning rate η, L2 leaf
    * penalty λ, min split gain γ). */
  case class XgbParams(rounds: Int, lr: Double, lambda: Double,
      gamma: Double)

  /** A double as a cross-engine DOUBLE literal. The `"$d" + "e0"`
    * idiom breaks once Scala prints scientific notation ("1.0E8" +
    * "e0" is a parse error) — rewrite the exponent marker instead.
    * toString round-trips, so the SQL engines parse the exact same
    * IEEE value the driver computes with. */
  private[operators] def dlit(d: Double): String = {
    val s = d.toString
    if (s.contains("E")) s.replace("E", "e") else s + "e0"
  }

  /**
   * Regularized boosted stumps (squared loss, h = 1 per point): per
   * round the λ-damped split search prices every candidate in one
   * distributed pass; the best split survives only when the xgboost
   * gain ½·(score − parent)/1e6 exceeds γ (q-units are 1e3-quantized
   * residuals, so scores sit at 1e6× the natural scale), else the
   * round emits a single-leaf tree (feat = 0 — predict always takes
   * rval) of weight lr·R/(n+λ). λ = γ = 0 with a splittable feature
   * reduces bit-for-bit to [[gbdt]].
   */
  def xgbTrain(pts: DataFrame, rounds: Int, lr: Double, lambda: Double,
      gamma: Double): (Double, Seq[(Int, Long, Double, Double)]) = {
    val base = pts.agg(sum("y").cast("long"), count(lit(1))).collect()(0)
    require(!base.isNullAt(0),
      "graft: cannot train on an empty point set")
    val f0 = base.getLong(0).toDouble / base.getLong(1).toDouble
    var model = Vector.empty[(Int, Long, Double, Double)]
    for (_ <- 1 to rounds) {
      val q = floor((col("y").cast("double") - stumpF(f0, model)) * lit(1e3))
        .cast("long")
      val row = bestSplit(pts, q, lit(true), lambda) match {
        case Some((g, f, v, cl, sl, n, stot))
            if g - stot.toDouble * stot.toDouble / (n.toDouble + lambda) >
              2e6 * gamma =>
          (f, v, lr * (sl.toDouble / 1e3) / (cl.toDouble + lambda),
            lr * ((stot - sl).toDouble / 1e3) /
              ((n - cl).toDouble + lambda))
        case other =>
          // γ-pruned (or unsplittable): single-leaf tree
          val (n, stot) = other match {
            case Some((_, _, _, _, _, n0, s0)) => (n0, s0)
            case None =>
              val r = pts.select(q.as("qq"))
                .agg(count(lit(1)), sum("qq").cast("long")).collect()(0)
              (r.getLong(0), r.getLong(1))
          }
          val w = lr * (stot.toDouble / 1e3) / (n.toDouble + lambda)
          (0, 0L, w, w)
      }
      model = model :+ row
    }
    (f0, model)
  }

  /** Stump-model F(x) over the prefixed model CTEs m1..m_upto —
    * shared by the chain's residual stage and the grid's eval stage
    * (the two texts MUST stay identical: train-time residuals and
    * eval-time predictions desynchronize otherwise). */
  private def xgbFExpr(p: String, upto: Int): String = {
    val terms = (1 to upto).map { r =>
      s"(CASE WHEN (${p}m$r.feat = 1 AND x1 <= ${p}m$r.thr) OR (${p}m$r.feat = 2 AND x2 <= ${p}m$r.thr)" +
        s" THEN ${p}m$r.lval ELSE ${p}m$r.rval END)"
    }
    (s"${p}f0.f0" +: terms).mkString(" + ")
  }

  /** The regularized chain's CTE list (no WITH, no trailing comma)
    * over `src(x1, x2, y)`, every CTE name prefixed so several
    * chains — the grid — compose in ONE statement. Final model rows
    * live in `${prefix}m1..m$rounds`; `${prefix}f0` holds the base
    * score. */
  private def xgbChain(rounds: Int, lr: Double, lambda: Double,
      gamma: Double, src: String, p: String): String = {
    val lam = dlit(lambda)
    def fExpr(upto: Int): String = xgbFExpr(p, upto)
    val gainCols =
      s"CAST(sl AS DOUBLE) * CAST(sl AS DOUBLE) / (CAST(cl AS DOUBLE) + $lam)" +
        s" + CAST(stot - sl AS DOUBLE) * CAST(stot - sl AS DOUBLE) / (CAST(n - cl AS DOUBLE) + $lam)"
    val sb = new StringBuilder(s"${p}f0 AS (SELECT " +
      s"CAST(CAST(sum(y) AS BIGINT) AS DOUBLE) / CAST(count(*) AS BIGINT) AS f0 FROM $src),\n")
    for (t <- 1 to rounds) {
      val models = (1 until t).map(r => s"${p}m$r").mkString(", ")
      val from = if (t == 1) s"$src, ${p}f0" else s"$src, ${p}f0, $models"
      sb.append(s"${p}rs$t AS (SELECT x1, x2, " +
        s"CAST(floor((CAST(y AS DOUBLE) - (${fExpr(t - 1)})) * 1e3) AS BIGINT) AS q FROM $from),\n")
      for (f <- 1 to 2) {
        sb.append(s"${p}s${t}_$f AS (SELECT x$f AS v, CAST(count(*) AS BIGINT) AS cnt, " +
          s"CAST(sum(q) AS BIGINT) AS sq FROM ${p}rs$t GROUP BY x$f),\n")
        sb.append(s"${p}c${t}_$f AS (SELECT v, " +
          s"CAST(sum(cnt) OVER (ORDER BY v) AS BIGINT) AS cl, " +
          s"CAST(sum(sq) OVER (ORDER BY v) AS BIGINT) AS sl, " +
          s"(SELECT CAST(sum(cnt) AS BIGINT) FROM ${p}s${t}_$f) AS n, " +
          s"(SELECT CAST(sum(sq) AS BIGINT) FROM ${p}s${t}_$f) AS stot " +
          s"FROM ${p}s${t}_$f),\n")
      }
      // one-row totals: seeds the no-split sentinel so the candidate
      // union is NEVER empty (single-valued features would otherwise
      // collapse the whole chain to zero rows while the driver loop
      // emits its single-leaf fallback — the oracle must match it)
      sb.append(s"${p}g$t AS (SELECT CAST(count(*) AS BIGINT) AS n, " +
        s"CAST(sum(q) AS BIGINT) AS stot FROM ${p}rs$t),\n")
      // single fused CTE per round, gbdtSql's exact nesting depth:
      // ANY extra derived-table level around the candidate union
      // trips Spark's analyzer at round depth 3 (internal
      // canonicalization error on the unresolved CTE refs), so the
      // γ gate is inlined into each output CASE instead of being a
      // named `ok` column one level up. The sentinel's -Inf gain
      // loses to every real candidate and always fails the γ gate,
      // so winning it means "emit the single-leaf row".
      val okExpr = s"gain - CAST(stot AS DOUBLE) * CAST(stot AS DOUBLE)" +
        s" / (CAST(n AS DOUBLE) + $lam) > ${dlit(2e6 * gamma)}"
      val leafW =
        s"${dlit(lr)} * (CAST(stot AS DOUBLE) / 1e3) / (CAST(n AS DOUBLE) + $lam)"
      sb.append(s"${p}m$t AS (SELECT " +
        s"CASE WHEN $okExpr THEN feat ELSE 0 END AS feat, " +
        s"CASE WHEN $okExpr THEN v ELSE CAST(0 AS BIGINT) END AS thr, " +
        s"CASE WHEN $okExpr THEN ${dlit(lr)} * (CAST(sl AS DOUBLE) / 1e3) / (CAST(cl AS DOUBLE) + $lam) ELSE $leafW END AS lval, " +
        s"CASE WHEN $okExpr THEN ${dlit(lr)} * (CAST(stot - sl AS DOUBLE) / 1e3) / (CAST(n - cl AS DOUBLE) + $lam) ELSE $leafW END AS rval " +
        s"FROM (" +
        s"SELECT 1 AS feat, v, cl, sl, n, stot, $gainCols AS gain FROM ${p}c${t}_1 WHERE cl < n" +
        s" UNION ALL SELECT 2 AS feat, v, cl, sl, n, stot, $gainCols AS gain FROM ${p}c${t}_2 WHERE cl < n" +
        s" UNION ALL SELECT 0 AS feat, CAST(0 AS BIGINT) AS v, CAST(0 AS BIGINT) AS cl, " +
        s"CAST(0 AS BIGINT) AS sl, n, stot, CAST('-Infinity' AS DOUBLE) AS gain FROM ${p}g$t) " +
        s"ORDER BY gain DESC, feat, v LIMIT 1),\n")
    }
    sb.setLength(sb.length - 2) // drop the trailing ",\n"
    sb.toString
  }

  /**
   * Regularized chain as ONE SQL text over `pts(x1, x2, y)` — the
   * oracle twin of [[xgbTrain]]: identical quantization, λ-damped
   * pricing, the γ gate on shared double text (strict >), and the
   * single-leaf fallback row (0, 0, w, w). Output: one row per round
   * (round, feat, thr, lval, rval).
   */
  def xgbSql(rounds: Int, lr: Double, lambda: Double, gamma: Double,
      materialized: Boolean = false): String = {
    val out = (1 to rounds).map(t =>
      s"SELECT $t AS round, feat, thr, lval, rval FROM m$t")
    val sql = "WITH " + xgbChain(rounds, lr, lambda, gamma, "pts", "") +
      "\n" + out.mkString(" UNION ALL ") + " ORDER BY round"
    if (materialized) sql.replace(" AS (SELECT", " AS MATERIALIZED (SELECT")
    else sql
  }

  /**
   * xgboost_gs's grid search over [[xgbTrain]]: deterministic 80/20
   * split on `id` (id % 5 = 4 → held out), one trainer run per cell
   * on the train rows, exact test SSE (per-row squared error
   * floor-quantized to 1e6 micros → an order-free LONG sum), results
   * ranked by (sse, cell order). Distributed work = the per-cell
   * training aggregates + one cached test scan per cell; driver
   * state is the k-cell result table. Output: (rnk, rounds, eta,
   * lam, gam, sse_micro).
   */
  def xgbGridSearch(spark: SparkSession, pts: DataFrame,
      grid: Seq[XgbParams]): DataFrame = {
    require(grid.nonEmpty, "graft: empty parameter grid")
    // both splits cached: every cell re-reads train (2 aggregates per
    // round) and test (one SSE scan) — k cells would otherwise re-run
    // the split filter over the base table Σ(2·rounds)+k times
    val train = pts.filter(col("id") % 5 < 4).select("x1", "x2", "y")
      .cache()
    val test = pts.filter(col("id") % 5 === 4).select("x1", "x2", "y")
      .cache()
    // an id distribution that empties either side would NPE deep in
    // the trainer / SSE sum — fail the admission loudly instead
    val sides = pts.agg(
      sum(when(col("id") % 5 < 4, 1L).otherwise(0L)),
      sum(when(col("id") % 5 === 4, 1L).otherwise(0L))).collect()(0)
    require(!sides.isNullAt(0) && sides.getLong(0) > 0 && sides.getLong(1) > 0,
      "graft: the 80/20 id split left an empty train or test side")
    val cells = try {
      grid.map { g =>
        val (f0, model) = xgbTrain(train, g.rounds, g.lr, g.lambda, g.gamma)
        val err = col("y").cast("double") - stumpF(f0, model)
        val sse = test
          .select(floor(err * err * lit(1e6)).cast("long").as("se"))
          .agg(sum("se").cast("long")).collect()(0).getLong(0)
        (g.rounds, g.lr, g.lambda, g.gamma, sse)
      }
    } finally {
      train.unpersist(blocking = false)
      test.unpersist(blocking = false)
    }
    val ranked = cells.zipWithIndex
      .sortBy { case ((_, _, _, _, sse), i) => (sse, i) }
      .zipWithIndex.map { case (((r, e, l, g, sse), _), rk) =>
        (rk + 1, r, e, l, g, sse)
      }
    import spark.implicits._
    ranked.toDF("rnk", "rounds", "eta", "lam", "gam", "sse_micro")
      .orderBy("rnk")
  }

  /**
   * Grid-search oracle as one SQL text over `pts(id, x1, x2, y)`:
   * the same split, one prefixed [[xgbChain]] per cell, per-cell SSE
   * from the shared error text, ranked by (sse, cell order).
   */
  def xgbGridSql(grid: Seq[XgbParams],
      materialized: Boolean = false): String = {
    val sb = new StringBuilder(
      "WITH tr AS (SELECT x1, x2, y FROM pts WHERE id % 5 < 4),\n" +
        "te AS (SELECT x1, x2, y FROM pts WHERE id % 5 = 4),\n")
    grid.zipWithIndex.foreach { case (g, i) =>
      val p = s"g${i}_"
      sb.append(xgbChain(g.rounds, g.lr, g.lambda, g.gamma, "tr", p))
        .append(",\n")
      def fExpr: String = xgbFExpr(p, g.rounds)
      val models = (1 to g.rounds).map(r => s"${p}m$r").mkString(", ")
      sb.append(s"${p}ev AS (SELECT CAST(sum(CAST(floor(" +
        s"((CAST(y AS DOUBLE) - ($fExpr)) * (CAST(y AS DOUBLE) - ($fExpr))) * 1e6" +
        s") AS BIGINT)) AS BIGINT) AS sse FROM te, ${p}f0, $models),\n")
    }
    sb.setLength(sb.length - 2)
    sb.append("\n")
    val cells = grid.zipWithIndex.map { case (g, i) =>
      s"SELECT ${i + 1} AS ord, ${g.rounds} AS rounds, ${dlit(g.lr)} AS eta, " +
        s"${dlit(g.lambda)} AS lam, ${dlit(g.gamma)} AS gam, " +
        s"(SELECT sse FROM g${i}_ev) AS sse_micro"
    }
    sb.append("SELECT CAST(row_number() OVER (ORDER BY sse_micro, ord) AS INT) AS rnk, " +
      "rounds, eta, lam, gam, sse_micro FROM (\n" +
      cells.mkString(" UNION ALL\n") + ") cells ORDER BY rnk")
    if (materialized) sb.toString.replace(" AS (SELECT", " AS MATERIALIZED (SELECT")
    else sb.toString
  }

  /**
   * n-feature / k-class naive Bayes (bayes.cpp's general shape):
   * same broadcast count-table model and EXACT posterior argmax —
   * per class c, score_c = n_c·∏ᵢ(cntᵢ+1) / ∏ᵢ(n_c+Vᵢ) compared
   * pairwise by DECIMAL(38) cross-multiplication (ties → smaller
   * class id). Bounded: with m features and N rows, the cross
   * product is ≤ N^(m+1)·N^m — m ≤ 3 stays inside DECIMAL(38) for
   * N ≤ 1e5 (guarded). Features categorical; continuous features
   * should be binned first (the reference discretizes too).
   */
  def nbayesND(df: DataFrame, features: Seq[Column], y: Column,
      idCol: Column, numClasses: Int): DataFrame = {
    val m = features.size
    require(m >= 1 && m <= 3, "graft: nbayesND supports 1..3 features (DECIMAL(38) bound)")
    require(numClasses >= 2, "graft: need at least 2 classes")
    val base = df.select(
      (idCol.as("id") +: features.zipWithIndex.map { case (f, i) => f.as(s"f$i") }) :+
        y.cast("int").as("cls"): _*)
    val d38 = DecimalType(38, 0)
    // priors pivoted to one row: n0..n{k-1}
    val priorCols = (0 until numClasses).map(c =>
      coalesce(max(when(col("cls") === c, col("n_c"))), lit(0L)).as(s"n$c"))
    val priors = base.groupBy("cls").agg(count(lit(1)).as("n_c"))
      .agg(priorCols.head, priorCols.tail: _*)
    // OVERFLOW GUARD (r12 advice): the pairwise argmax cross-multiplies
    // num(c)·bestD ≤ N^(m+1)·N^m = N^(2m+1); past DECIMAL(38) Spark's
    // non-ANSI default yields NULL and when(wins,...) would silently
    // keep the earlier class. Collect the (k-value) prior row anyway
    // needed downstream and raise instead of mis-predicting.
    val priorRow = priors.collect()(0)
    val nTotal = (0 until numClasses).map(c => priorRow.getAs[Long](s"n$c")).sum
    val nMax = math.pow(10.0, 38.0 / (2 * m + 1)).toLong
    require(nTotal <= nMax,
      s"graft: nbayesND N=$nTotal exceeds the DECIMAL(38) cross-multiplication " +
        s"bound $nMax for m=$m features (use fewer features or pre-aggregate)")
    val priorLit = (0 until numClasses)
      .map(c => lit(priorRow.getAs[Long](s"n$c")).as(s"n$c"))
    var out = base.select(col("*") +: priorLit: _*)
    for (i <- 0 until m) {
      val vi = base.agg(countDistinct(s"f$i").as(s"v$i"))
      val ci = base.groupBy(col(s"f$i"), col("cls")).agg(count(lit(1)).as("cnt"))
      for (c <- 0 until numClasses) {
        out = out.join(broadcast(ci.filter(col("cls") === c)
          .select(col(s"f$i"), col("cnt").as(s"c${i}_$c"))), Seq(s"f$i"), "left")
      }
      out = out.crossJoin(broadcast(vi))
        .na.fill(0L, (0 until numClasses).map(c => s"c${i}_$c"))
    }
    def num(c: Int): Column =
      (0 until m).foldLeft(col(s"n$c").cast(d38)) { (acc, i) =>
        acc * (col(s"c${i}_$c") + 1).cast(d38) }
    def den(c: Int): Column =
      (0 until m).foldLeft(lit(1L).cast(d38)) { (acc, i) =>
        acc * (col(s"n$c") + col(s"v$i")).cast(d38) }
    // argmax with ties → smaller id: c beats the running best only
    // with a strictly greater score
    val pred = (1 until numClasses).foldLeft((lit(0), num(0), den(0))) {
      case ((bestC, bestN, bestD), c) =>
        val wins = num(c) * bestD > bestN * den(c)
        (when(wins, lit(c)).otherwise(bestC),
          when(wins, num(c)).otherwise(bestN),
          when(wins, den(c)).otherwise(bestD))
    }._1
    out.select((col("id") +:
      (0 until m).map(i => col(s"f$i"))) :+
      col("cls") :+ pred.cast("int").as("pred"): _*)
  }

  // ---------------------------------------------------------------
  // PCA (pca.cpp, optimizer_pca.cpp): 2-feature closed form.
  // ---------------------------------------------------------------

  /** Eigen-decomposition of the 2×2 covariance from exact moments,
    * as shared SQL text over a sums row (n, sx, sy, sxx, sxy, syy).
    * Output: var1/var2 (eigenvalues desc), pc1_x/pc1_y (unit leading
    * eigenvector, sign fixed x≥0), evr1. */
  val pca2Exprs: Seq[(String, String)] = {
    def dbl(m: String) = s"CAST($m AS DOUBLE)"
    val n = dbl("n")
    val cxx = s"(${dbl("sxx")} / $n - (${dbl("sx")} / $n) * (${dbl("sx")} / $n))"
    val cxy = s"(${dbl("sxy")} / $n - (${dbl("sx")} / $n) * (${dbl("sy")} / $n))"
    val cyy = s"(${dbl("syy")} / $n - (${dbl("sy")} / $n) * (${dbl("sy")} / $n))"
    val disc = s"sqrt(($cxx - $cyy) * ($cxx - $cyy) + 4e0 * $cxy * $cxy)"
    val l1 = s"(($cxx + $cyy + $disc) / 2e0)"
    val l2 = s"(($cxx + $cyy - $disc) / 2e0)"
    // leading eigenvector: (cxy, l1 - cxx), normalized; sign: x >= 0
    val ex = cxy; val ey = s"($l1 - $cxx)"
    val norm = s"sqrt($ex * $ex + $ey * $ey)"
    val sgn = s"(CASE WHEN $ex < 0e0 THEN -1e0 ELSE 1e0 END)"
    Seq(
      "var1" -> l1, "var2" -> l2,
      "pc1_x" -> s"($sgn * $ex / $norm)", "pc1_y" -> s"($sgn * $ey / $norm)",
      "evr1" -> s"($l1 / ($l1 + $l2))")
  }

  /** Exact second moments for PCA over integer (x, y). */
  def pca2Sums(df: DataFrame, x: Column, y: Column): DataFrame =
    df.select(x.cast("long").as("x"), y.cast("long").as("y"))
      .agg(count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"),
        sum(col("x") * col("x")).as("sxx"), sum(col("x") * col("y")).as("sxy"),
        sum(col("y") * col("y")).as("syy"))

  /**
   * General-p PCA (optimizer_pca.cpp's job): ONE exact-LONG moment
   * aggregate (p + p(p+1)/2 numbers cross the shuffle), covariance
   * assembled on the driver, leading eigenvector by power iteration
   * on the tiny p×p matrix — the distributed work is a single pass
   * regardless of p or iteration count. Deterministic: fixed start
   * vector, fixed iteration count, sign fixed by first nonzero ≥ 0.
   * Returns (unit eigenvector, eigenvalue).
   */
  def pcaPower(df: DataFrame, features: Seq[Column], iters: Int = 100): (Array[Double], Double) = {
    val p = features.size
    val w = df.select(features.zipWithIndex.map { case (c, i) =>
      c.cast("long").as(s"f$i") }: _*)
    val aggs = count(lit(1)).as("n") +:
      ((0 until p).map(i => sum(col(s"f$i")).as(s"s_$i")) ++
        (for { i <- 0 until p; j <- i until p }
          yield sum(col(s"f$i") * col(s"f$j")).as(s"m_${i}_$j")))
    val row = w.agg(aggs.head, aggs.tail: _*).collect()(0)
    val n = row.getLong(row.fieldIndex("n")).toDouble
    val mean = (0 until p).map(i => row.getLong(row.fieldIndex(s"s_$i")).toDouble / n)
    val cov = Array.ofDim[Double](p, p)
    for (i <- 0 until p; j <- i until p) {
      val m = row.getLong(row.fieldIndex(s"m_${i}_$j")).toDouble
      val c = m / n - mean(i) * mean(j)
      cov(i)(j) = c; cov(j)(i) = c
    }
    var v = Array.tabulate(p)(i => if (i == 0) 1.0 else 0.0)
    var lambda = 0.0
    for (_ <- 0 until iters) {
      val nv = Array.tabulate(p)(i => (0 until p).map(j => cov(i)(j) * v(j)).sum)
      val norm = math.sqrt(nv.map(x => x * x).sum)
      require(norm > 0, "graft: zero covariance — no principal direction")
      v = nv.map(_ / norm); lambda = norm
    }
    val lead = v.indexWhere(math.abs(_) > 1e-12)
    if (lead >= 0 && v(lead) < 0) v = v.map(-_)
    (v, lambda)
  }

  // ---------------------------------------------------------------
  // Scores (scores.h): confusion-matrix metrics from exact counts.
  // ---------------------------------------------------------------

  /** Classification + regression metrics over exact counts, shared
    * formula text (input row: tp, fp, fn, tn, sse_num, n). */
  val scoreExprs: Seq[(String, String)] = {
    def dbl(m: String) = s"CAST($m AS DOUBLE)"
    val prec = s"(${dbl("tp")} / (${dbl("tp")} + ${dbl("fp")}))"
    val rec = s"(${dbl("tp")} / (${dbl("tp")} + ${dbl("fn")}))"
    Seq(
      "accuracy" -> s"((${dbl("tp")} + ${dbl("tn")}) / ${dbl("n")})",
      "precision_s" -> prec,
      "recall_s" -> rec,
      "f1" -> s"(2e0 * $prec * $rec / ($prec + $rec))",
      "mse" -> s"(${dbl("sse_num")} / ${dbl("n")})")
  }
}
