package graft

import graft.operators.{Ml, ModelStore}
import org.apache.spark.sql.functions._

/**
 * Model warehouse contract: train → save → load → PREDICT BY
 * round-trips bit-exactly, and the predict columns reproduce the
 * trainers' own in-memory predictions.
 */
class ModelStoreSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(name: String): String = {
    val d = java.nio.file.Files.createTempDirectory("graft-models-").toFile
    d.deleteOnExit(); s"${d.getAbsolutePath}/$name"
  }

  test("linear model round-trip is bit-exact; PREDICT BY matches training") {
    val df = (0 until 500).map { i =>
      val x1 = (i % 53) / 53.0; val x2 = (i % 37) / 37.0
      (x1, x2, if (2.0 * x1 - x2 > 0.5) 1 else 0)
    }.toDF("x1", "x2", "y")
    val w = Ml.logregr(df, 50, 1.0, trueSigmoid = true)
    val path = tmp("m1")
    ModelStore.saveLinear(spark, path, "churn", w)
    val w2 = ModelStore.loadLinear(spark, path, "churn")
    assert(w2.toSeq === w.toSeq) // parquet doubles: exact round-trip
    // PREDICT BY on a fresh session-side frame
    val preds = df.select(
      ModelStore.predictLabel(w2, Seq(col("x1"), col("x2"))).as("p"),
      (lit(w(0)) + lit(w(1)) * col("x1") + lit(w(2)) * col("x2") >= 0)
        .cast("int").as("expect"))
    assert(preds.filter(col("p") =!= col("expect")).count() === 0L)
  }

  test("kmeans model round-trip; PREDICT BY reproduces training assignment") {
    val pts = (0 until 300).map { i =>
      val g = i % 3
      (g * 1000L + i % 5, g * 1000L + (i * 3) % 7)
    }.toDF("x", "y")
    val (assigned, cents) = Ml.kmeans(pts, 3, 5)
    val path = tmp("m2")
    ModelStore.saveKmeans(spark, path, "segments", cents)
    val cents2 = ModelStore.loadKmeans(spark, path, "segments")
    assert(cents2.toSeq === cents.toSeq)
    val re = pts.withColumn("p",
      ModelStore.predictKmeans(cents2, col("x"), col("y")))
    // training's final assignment IS nearest-centroid under the final
    // centroids (the loop ends with assign-then-update? no: update is
    // last, so re-predicting with the final centroids may legally move
    // boundary points — on these well-separated blobs it must not)
    val both = assigned.join(re, Seq("x", "y"))
    assert(both.filter(col("cl") =!= col("p")).count() === 0L)
  }

  test("explainLinear renders one typed row per coefficient") {
    val ex = ModelStore.explainLinear(spark, "m",
      Seq("x1", "x2"), Array(0.5, -2.0, 3.0))
    assert(ex.columns.toSeq ===
      Seq("model", "idx", "feature", "weight", "abs_weight"))
    val rows = ex.orderBy("idx").collect()
    assert(rows.map(_.getString(2)).toSeq === Seq("intercept", "x1", "x2"))
    assert(rows.map(_.getDouble(3)).toSeq === Seq(0.5, -2.0, 3.0))
    assert(rows.map(_.getDouble(4)).toSeq === Seq(0.5, 2.0, 3.0))
    intercept[IllegalArgumentException] {
      ModelStore.explainLinear(spark, "m", Seq("x1"), Array(1.0, 2.0, 3.0))
    }
  }

  test("explainKmeans carries centroid coords and cluster sizes") {
    val ex = ModelStore.explainKmeans(spark, "seg",
      Array((1.0, 2.0), (3.0, 4.0)), Map(0 -> 10L))
    val rows = ex.orderBy("cluster").collect()
    assert(rows.map(r => (r.getInt(1), r.getDouble(2), r.getDouble(3),
      r.getLong(4))).toSeq === Seq((0, 1.0, 2.0, 10L), (1, 3.0, 4.0, 0L)))
  }

  test("predictLinear arity guard") {
    intercept[IllegalArgumentException] {
      ModelStore.predictLinear(Array(1.0, 2.0), Seq(col("a"), col("b")))
    }
  }
}
