package graft

import graft.operators.Hyper
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/**
 * Hyperparameter-validation contracts (reference:
 * db4ai/executor/hyperparameter_validation.cpp + the per-algorithm
 * definition tables): defaults fill, names resolve
 * case-insensitively, numbers respect (min, incl, max, incl) bounds
 * exactly as transcribed, enums admit only published values, and
 * unknown names / algorithms raise. Driver-only — no SparkSession.
 */
class HyperSpec extends AnyFunSuite with Matchers {

  test("defaults fill for kmeans exactly as kmeans.cpp declares") {
    val p = Hyper.validate("kmeans", Map.empty)
    assert(p("num_centroids") === "1")
    assert(p("max_iterations") === "10")
    assert(p("batch_size") === "1000")
    assert(p("tolerance") === "1.0E-5")
    assert(p("seeding_function") === "Random++")
    assert(p("distance_function") === "L2_Squared")
  }

  test("names resolve case-insensitively; values canonicalize") {
    val p = Hyper.validate("kmeans",
      Map("NUM_CENTROIDS" -> " 5 ", "Distance_Function" -> "l2_squared"))
    assert(p("num_centroids") === "5")
    assert(p("distance_function") === "L2_Squared") // canonical casing
  }

  test("range bounds honor inclusivity flags") {
    // kmeans tolerance: (0.0, 1.0] — zero excluded, one included
    Hyper.validate("kmeans", Map("tolerance" -> "1.0"))
    intercept[IllegalArgumentException] {
      Hyper.validate("kmeans", Map("tolerance" -> "0.0"))
    }
    intercept[IllegalArgumentException] {
      Hyper.validate("kmeans", Map("tolerance" -> "1.0001"))
    }
    // num_centroids: [1, 1000000]
    intercept[IllegalArgumentException] {
      Hyper.validate("kmeans", Map("num_centroids" -> "0"))
    }
    // gd learning_rate: (0, DBL_MAX] — zero excluded
    intercept[IllegalArgumentException] {
      Hyper.validate("logistic_regression", Map("learning_rate" -> "0"))
    }
    // xgboost eta: [0, 1] — zero INCLUDED here
    assert(Hyper.validate("xgboost", Map("eta" -> "0"))("eta") === "0.0")
    // svm degree: [2, 9]
    intercept[IllegalArgumentException] {
      Hyper.validate("svm_classification", Map("degree" -> "10"))
    }
  }

  test("enums admit only published values; unknown names raise") {
    assert(Hyper.validate("logistic_regression",
      Map("optimizer" -> "ngd"))("optimizer") === "ngd")
    intercept[IllegalArgumentException] {
      Hyper.validate("logistic_regression", Map("optimizer" -> "adam"))
    }
    intercept[IllegalArgumentException] {
      Hyper.validate("kmeans", Map("nonsense" -> "1"))
    }
    intercept[IllegalArgumentException] {
      Hyper.validate("not_an_algorithm", Map.empty)
    }
    intercept[IllegalArgumentException] {
      Hyper.validate("xgboost", Map("eta" -> "fast"))
    }
    // two spellings of ONE case-insensitive name must reject, not
    // silently let one overwrite the other
    intercept[IllegalArgumentException] {
      Hyper.validate("kmeans", Map("SEED" -> "1", "seed" -> "2"))
    }
  }

  test("booleans accept the reference spellings") {
    for ((in, out) <- Seq("true" -> "true", "ON" -> "true", "1" -> "true",
        "false" -> "false", "off" -> "false", "0" -> "false"))
      assert(Hyper.validate("pca", Map("verbose" -> in))("verbose") === out)
    intercept[IllegalArgumentException] {
      Hyper.validate("pca", Map("verbose" -> "maybe"))
    }
  }

  test("every algorithm family is cataloged; svm extends supervised gd") {
    val algos = Hyper.defs.map(_.algo).distinct.toSet
    assert(algos === Set("kmeans", "linear_regression",
      "logistic_regression", "svm_classification", "multiclass", "pca",
      "xgboost"))
    val svm = Hyper.defs.filter(_.algo == "svm_classification").map(_.name)
    val lin = Hyper.defs.filter(_.algo == "linear_regression").map(_.name)
    assert(lin.forall(svm.contains))
    assert(Seq("lambda", "kernel", "gamma", "degree", "coef0",
      "components").forall(svm.contains))
  }
}
