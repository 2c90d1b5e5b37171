package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Model warehouse + PREDICT BY (reference: src/gausskernel/dbmind/
 * db4ai/catalog/model_warehouse.cpp — trained models persist in a
 * catalog table and `PREDICT BY model(cols)` applies them in any later
 * query; include/db4ai/predict_by.h).
 *
 * Spark shape: a model is a tiny one-row-per-component DataFrame
 * (kind, name, idx, value) written as parquet — human-readable,
 * versionable, and joinable. Prediction builds a pure codegen Column
 * from the loaded weights (literals — the model ships inside the
 * plan, nothing joins at scale), so PREDICT BY over 100 TB is a
 * map-only scan exactly like the reference's per-row C call.
 */
/**
 * In-session model catalog behind the `CREATE MODEL` / `PREDICT BY`
 * SQL statements (reference: gram.y:11597 CreateModelStmt /
 * gram.y:27180 PREDICT BY; db4ai/catalog/model_warehouse.cpp stores
 * trained models in gs_model_warehouse and later queries apply them
 * by name). The Spark analogue keeps the trained parameters — a few
 * doubles — in a process-wide registry; `PREDICT BY` splices them
 * into the plan as LITERALS, so prediction ships inside the query
 * (map-only at any scale, no lookup join). [[ModelStore]] remains
 * the durable parquet form; this catalog is the statement surface's
 * working set, exportable through it.
 */
object ModelCatalog {
  sealed trait Model
  /** w(0) = intercept; algorithm records the spelling that trained it;
    * features keep the CREATE MODEL expression texts so EXPLAIN MODEL
    * can render the trained relation (db4ai explain_model.h). */
  final case class LinearModel(algorithm: String, weights: Array[Double],
      classify: Boolean, features: Seq[String]) extends Model
  /** 2-d Lloyd centroids + training cluster sizes (EXPLAIN MODEL). */
  final case class KmeansModel(cents: Array[(Double, Double)],
      counts: Map[Int, Long], features: Seq[String]) extends Model

  private val models =
    scala.collection.concurrent.TrieMap.empty[String, Model]

  private def norm(name: String): String =
    name.toLowerCase(java.util.Locale.ROOT)

  def put(name: String, m: Model): Unit = { models(norm(name)) = m; () }

  def get(name: String): Model =
    models.getOrElse(norm(name), throw new IllegalArgumentException(
      s"graft: model '$name' does not exist (CREATE MODEL first)"))

  def drop(name: String): Boolean = models.remove(norm(name)).isDefined

  def list: Seq[(String, Model)] = models.toSeq.sortBy(_._1)
}

object ModelStore {

  /** Persist a named weight vector (idx 0 = intercept). */
  def saveLinear(spark: SparkSession, path: String, name: String,
      weights: Array[Double]): Unit = {
    import spark.implicits._
    weights.zipWithIndex
      .map { case (w, i) => ("linear", name, i, w) }
      .toSeq.toDF("kind", "name", "idx", "value")
      .repartition(1).write.mode("overwrite").parquet(path)
  }

  /** Persist k-means centroids ((cx, cy) per cluster id). */
  def saveKmeans(spark: SparkSession, path: String, name: String,
      cents: Array[(Double, Double)]): Unit = {
    import spark.implicits._
    cents.zipWithIndex
      .flatMap { case ((x, y), j) =>
        Seq(("kmeans-x", name, j, x), ("kmeans-y", name, j, y)) }
      .toSeq.toDF("kind", "name", "idx", "value")
      .repartition(1).write.mode("overwrite").parquet(path)
  }

  /** Load a linear model back as a weight array (idx order). */
  def loadLinear(spark: SparkSession, path: String, name: String): Array[Double] =
    spark.read.parquet(path)
      .filter(col("kind") === "linear" && col("name") === name)
      .orderBy("idx").collect().map(_.getAs[Double]("value"))

  /** Load k-means centroids back ((cx, cy) by cluster id). */
  def loadKmeans(spark: SparkSession, path: String, name: String): Array[(Double, Double)] = {
    val rows = spark.read.parquet(path)
      .filter(col("name") === name && col("kind").startsWith("kmeans-"))
      .collect()
    val xs = rows.filter(_.getAs[String]("kind") == "kmeans-x")
      .map(r => r.getAs[Int]("idx") -> r.getAs[Double]("value")).toMap
    val ys = rows.filter(_.getAs[String]("kind") == "kmeans-y")
      .map(r => r.getAs[Int]("idx") -> r.getAs[Double]("value")).toMap
    require(xs.keySet == ys.keySet && xs.nonEmpty,
      s"graft: malformed kmeans model '$name'")
    (0 until xs.size).toArray.map(j => (xs(j), ys(j)))
  }

  /**
   * EXPLAIN MODEL (reference: db4ai explain_model.h — a trained
   * model's parameters rendered as a relation): one row per
   * component, typed, so the summary is itself queryable/joinable.
   */
  def explainLinear(spark: SparkSession, name: String,
      featureNames: Seq[String], weights: Array[Double]): DataFrame = {
    import spark.implicits._
    require(weights.length == featureNames.length + 1,
      s"graft: ${featureNames.length} features need ${featureNames.length + 1} weights")
    (("intercept" +: featureNames).zip(weights).zipWithIndex.map {
      case ((f, w), i) => (name, i, f, w, math.abs(w))
    }).toDF("model", "idx", "feature", "weight", "abs_weight")
  }

  def explainKmeans(spark: SparkSession, name: String,
      cents: Array[(Double, Double)], counts: Map[Int, Long]): DataFrame = {
    import spark.implicits._
    cents.zipWithIndex.map { case ((x, y), j) =>
      (name, j, x, y, counts.getOrElse(j, 0L))
    }.toSeq.toDF("model", "cluster", "cx", "cy", "n_points")
  }

  /** PREDICT BY for a linear/logreg/svm model: w0 + Σ wᵢ·xᵢ. */
  def predictLinear(weights: Array[Double], features: Seq[Column]): Column = {
    require(weights.length == features.length + 1,
      s"graft: ${features.length} features need ${features.length + 1} weights")
    features.zip(weights.drop(1))
      .foldLeft(lit(weights(0))) { case (acc, (c, w)) =>
        acc + lit(w) * c.cast("double") }
  }

  /** PREDICT BY for a binary classifier: margin ≥ 0 → 1. */
  def predictLabel(weights: Array[Double], features: Seq[Column]): Column =
    when(predictLinear(weights, features) >= 0, 1).otherwise(0)

  /** PREDICT BY for k-means: nearest centroid id (ties → smaller id,
    * same discipline as training). */
  def predictKmeans(cents: Array[(Double, Double)], x: Column, y: Column): Column = {
    val dists = cents.map { case (cx, cy) =>
      val dx = x.cast("double") - lit(cx); val dy = y.cast("double") - lit(cy)
      dx * dx + dy * dy
    }
    val k = cents.length
    (0 until k - 1).foldRight(lit(k - 1): Column) { (j, elseCol) =>
      val conds = (j + 1 until k).map(m => dists(j) <= dists(m)).reduce(_ && _)
      when(conds, lit(j)).otherwise(elseCol)
    }.cast("int")
  }
}
