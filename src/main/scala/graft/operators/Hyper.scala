package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * CREATE MODEL hyperparameter catalog + validation (reference:
 * db4ai/executor/hyperparameter_validation.cpp — names resolve
 * case-insensitively against per-algorithm definition tables, values
 * type-check, range-check against (min, inclusive, max, inclusive)
 * bounds, and enum values must match a published list; omitted
 * parameters take the table's default).
 *
 * Definition tables transcribed from the reference:
 *  - kmeans.cpp:1035-1053 (seeding/distance enums, centroids, iters,
 *    batch, seed, tolerance);
 *  - gd.h:264-292 GD_HYPERPARAMETERS_SUPERVISED (linear/logistic
 *    regression and the multiclass base), gd.h:298-318 the SVM
 *    extras (lambda, kernel, components, gamma, degree, coef0);
 *  - multiclass.cpp:117-162 (classifier enum on top of supervised);
 *  - pca.cpp:257-268; xgboost.cpp:228-250;
 *  - bounds db4ai_common.h:28-29 (ITER_MAX 10000, MAX_BATCH_SIZE
 *    0xfffff); enum lists aifuncs.cpp:73-102, svm.cpp:99-103,
 *    gd.cpp:200.
 *
 * The catalog is static reference data shared VERBATIM with the
 * oracle text ([[catalogSql]] renders from the same `defs` the
 * validator reads — the fts_synonym discipline), so the gate pins the
 * transcription, and the specs pin the validation semantics.
 */
object Hyper {
  val IterMax = 10000          // db4ai_common.h:28
  val MaxBatchSize = 0x0fffff  // db4ai_common.h:29
  private val I32Max = Int.MaxValue.toDouble
  private val DblMax = Double.MaxValue

  final case class Def(algo: String, name: String, kind: String,
      dflt: String, lo: Option[Double], loIncl: Boolean,
      hi: Option[Double], hiIncl: Boolean, enumVals: Seq[String])

  private def i4(a: String, n: String, d: Long, lo: Double, loI: Boolean,
      hi: Double, hiI: Boolean) =
    Def(a, n, "int4", d.toString, Some(lo), loI, Some(hi), hiI, Nil)
  private def f8(a: String, n: String, d: Double, lo: Double, loI: Boolean,
      hi: Double, hiI: Boolean) =
    Def(a, n, "float8", d.toString, Some(lo), loI, Some(hi), hiI, Nil)
  private def bl(a: String, n: String, d: Boolean) =
    Def(a, n, "bool", d.toString, None, false, None, false, Nil)
  private def en(a: String, n: String, d: String, vals: Seq[String]) =
    Def(a, n, "enum", d, None, false, None, false, vals)

  /** gd.h:264-292 — shared by every gradient-descent trainer. */
  private def gdSupervised(a: String): Seq[Def] = Seq(
    i4(a, "batch_size", 1000, 1, true, MaxBatchSize, true),
    f8(a, "decay", 0.95, 0.0, false, DblMax, true),
    f8(a, "learning_rate", 0.8, 0.0, false, DblMax, true),
    i4(a, "max_iterations", 100, 1, true, IterMax, true),
    i4(a, "max_seconds", 0, 0, true, I32Max, true),
    en(a, "optimizer", "gd", Seq("gd", "ngd")),
    f8(a, "tolerance", 0.0005, 0.0, false, DblMax, true),
    i4(a, "seed", 0, 0, true, I32Max, true),
    bl(a, "verbose", false))

  /** gd.h:298-318 — the SVM-only additions. */
  private def svmExtras(a: String): Seq[Def] = Seq(
    f8(a, "lambda", 0.01, 0.0, false, DblMax, true),
    en(a, "kernel", "linear", Seq("linear", "gaussian", "polynomial")),
    i4(a, "components", 0, 0, true, I32Max, true),
    f8(a, "gamma", 0.5, 0.0, false, DblMax, true),
    i4(a, "degree", 2, 2, true, 9, true),
    f8(a, "coef0", 1.0, 0.0, true, DblMax, true))

  val defs: Seq[Def] =
    Seq(
      en("kmeans", "seeding_function", "Random++",
        Seq("Random++", "KMeans||")),
      en("kmeans", "distance_function", "L2_Squared",
        Seq("L1", "L2", "L2_Squared", "Linf")),
      i4("kmeans", "verbose", 0, 0, true, 2, true),
      i4("kmeans", "num_centroids", 1, 1, true, 1000000, true),
      i4("kmeans", "max_iterations", 10, 1, true, IterMax, true),
      i4("kmeans", "num_features", 0, 1, true, I32Max, true),
      i4("kmeans", "batch_size", 1000, 1, true, MaxBatchSize, true),
      i4("kmeans", "seed", 0, 0, true, I32Max, true),
      f8("kmeans", "tolerance", 0.00001, 0.0, false, 1.0, true)) ++
    gdSupervised("linear_regression") ++
    gdSupervised("logistic_regression") ++
    (gdSupervised("svm_classification") ++ svmExtras("svm_classification")) ++
    (gdSupervised("multiclass") :+
      en("multiclass", "classifier", "svm_classification",
        Seq("svm_classification", "logistic_regression"))) ++
    Seq(
      i4("pca", "number_components", 1, 1, true, I32Max, true),
      i4("pca", "batch_size", 1000, 1, true, MaxBatchSize, true),
      i4("pca", "max_iterations", 100, 1, true, IterMax, true),
      i4("pca", "max_seconds", 0, 0, true, I32Max, true),
      f8("pca", "tolerance", 0.0005, 0.0, true, DblMax, true),
      i4("pca", "seed", 0, 0, true, I32Max, true),
      bl("pca", "verbose", false)) ++
    Seq(
      i4("xgboost", "n_iter", 10, 1, true, IterMax, true),
      i4("xgboost", "batch_size", 10000, 1, true, MaxBatchSize, true),
      i4("xgboost", "max_depth", 5, 0, true, I32Max, true),
      i4("xgboost", "min_child_weight", 1, 0, true, I32Max, true),
      f8("xgboost", "gamma", 0.0, 0.0, true, DblMax, true),
      f8("xgboost", "eta", 0.3, 0.0, true, 1.0, true),
      i4("xgboost", "nthread", 1, 0, true, 100, true),
      i4("xgboost", "verbosity", 1, 0, true, 3, true),
      i4("xgboost", "seed", 0, 0, true, I32Max, true),
      en("xgboost", "booster", "gbtree", Seq("gbtree", "gblinear", "dart")),
      en("xgboost", "tree_method", "auto",
        Seq("auto", "exact", "approx", "hist", "gpu_hist")),
      en("xgboost", "eval_metric", "rmse",
        Seq("rmse", "rmsle", "map", "mae", "auc", "aucpr")))

  private def defsFor(algo: String): Seq[Def] = {
    val d = defs.filter(_.algo == algo)
    require(d.nonEmpty, s"graft: algorithm '$algo' has no registered configuration")
    d
  }

  /**
   * Validate user hyperparameters for `algo` and fill defaults —
   * the CREATE MODEL ... WITH (...) admission check. Names resolve
   * case-insensitively (the reference's pg_strcasecmp); values are
   * canonical text. Raises IllegalArgumentException on an unknown
   * name, a malformed value, an out-of-range number, or an enum
   * value outside the published list.
   */
  def validate(algo: String, params: Map[String, String]): Map[String, String] = {
    val table = defsFor(algo)
    val byName = table.map(d => d.name.toLowerCase -> d).toMap
    // names resolve case-insensitively, so "SEED" and "seed" are the
    // SAME parameter — two spellings must reject, not silently let
    // one overwrite the other
    val dup = params.keys.groupBy(_.toLowerCase).collectFirst {
      case (_, ks) if ks.size > 1 => ks.mkString("', '")
    }
    require(dup.isEmpty,
      s"graft: hyperparameter specified more than once: '${dup.getOrElse("")}'")
    val given = params.map { case (k, v) =>
      val d = byName.getOrElse(k.toLowerCase,
        throw new IllegalArgumentException(
          s"graft: invalid hyperparameter '$k' for $algo"))
      d.name -> canon(d, v)
    }
    table.map(d => d.name -> given.getOrElse(d.name, d.dflt)).toMap
  }

  private def canon(d: Def, v: String): String = d.kind match {
    case "int4" =>
      val x = v.trim.toLongOption.getOrElse(fail(d, v, "an integer"))
      checkRange(d, x.toDouble, v); x.toString
    case "float8" =>
      val x = v.trim.toDoubleOption.getOrElse(fail(d, v, "a number"))
      checkRange(d, x, v); x.toString
    case "bool" =>
      v.trim.toLowerCase match {
        case "true" | "on" | "1" => "true"
        case "false" | "off" | "0" => "false"
        case _ => fail(d, v, "a boolean")
      }
    case _ => // enum
      d.enumVals.find(_.equalsIgnoreCase(v.trim)).getOrElse(
        throw new IllegalArgumentException(
          s"graft: hyperparameter ${d.name} must be one of " +
            d.enumVals.mkString("{", ", ", "}") + s", got '$v'"))
  }

  private def fail(d: Def, v: String, what: String): Nothing =
    throw new IllegalArgumentException(
      s"graft: hyperparameter ${d.name} expects $what, got '$v'")

  private def checkRange(d: Def, x: Double, v: String): Unit = {
    val loOk = d.lo.forall(l => if (d.loIncl) x >= l else x > l)
    val hiOk = d.hi.forall(h => if (d.hiIncl) x <= h else x < h)
    if (!loOk || !hiOk) {
      val lb = d.lo.map(l => (if (d.loIncl) "[" else "(") + l).getOrElse("(-inf")
      val ub = d.hi.map(h => h + (if (d.hiIncl) "]" else ")")).getOrElse("inf)")
      throw new IllegalArgumentException(
        s"graft: hyperparameter ${d.name} must be in the range $lb, $ub, got '$v'")
    }
  }

  /** The definition tables as a relation (ordered by the caller). */
  def catalog(spark: SparkSession): DataFrame = {
    import spark.implicits._
    defs.map(d => (d.algo, d.name, d.kind, d.dflt, d.lo, d.loIncl,
        d.hi, d.hiIncl, d.enumVals.mkString(",")))
      .toDF("algo", "name", "kind", "dflt", "lo", "lo_incl", "hi",
        "hi_incl", "enum_vals")
  }

  /** The same catalog as oracle SQL — rendered from the SAME `defs`
    * (double bounds in e-notation so both engines parse the exact
    * IEEE value the driver holds). */
  def catalogSql: String = {
    def dl(o: Option[Double]): String =
      o.map(Ml.dlit).getOrElse("CAST(NULL AS DOUBLE)")
    val rows = defs.map { d =>
      s"('${d.algo}', '${d.name}', '${d.kind}', '${d.dflt}', " +
        s"${dl(d.lo)}, ${d.loIncl}, ${dl(d.hi)}, ${d.hiIncl}, " +
        s"'${d.enumVals.mkString(",")}')"
    }
    "SELECT * FROM (VALUES\n" + rows.mkString(",\n") +
      "\n) AS t(algo, name, kind, dflt, lo, lo_incl, hi, hi_incl, enum_vals)" +
      " ORDER BY algo, name"
  }
}
