package graft

import graft.operators.{Ivf, Knn, LocalKMeans}
import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.functions._

// scratch measurement spec (r19 optimization round) — not shipped
class KmqSpec extends SparkSpec {
  import spark.implicits._

  test("compare trainers") {
    val emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet").cache()
    val pts = emb.select($"embedding").as[Seq[Float]].collect().map(_.toArray)
    def wcss(cents: Array[Array[Float]]): Double = {
      def l2sq(a: Array[Float], b: Array[Float]): Double = {
        var s = 0.0; var i = 0
        while (i < a.length) { val d = a(i).toDouble - b(i); s += d * d; i += 1 }
        s
      }
      pts.map(p => cents.map(c => l2sq(p, c)).min).sum
    }
    def recall(model: Ivf.Model): Double = {
      val tagged = Ivf.assign(emb, "embedding", model)
      val qv = emb.filter($"vec_id" === 0).select($"embedding").as[Seq[Float]].head().toArray
      val found = Ivf.search(tagged, "embedding", "vec_id", model, qv, 10, 4)
        .select("vec_id").as[Long].collect().toSet
      val exact = Knn.exactTopK(emb, "embedding", "vec_id", qv, 10)
        .select("vec_id").as[Long].collect().toSet
      (found & exact).size / 10.0
    }
    // MLlib
    val feats = emb.select(array_to_vector($"embedding".cast("array<double>")).as("features"))
    val km = new KMeans().setK(16).setSeed(42L).setMaxIter(20).setFeaturesCol("features")
    val ml = Ivf.Model(km.fit(feats).clusterCenters.map(_.toArray.map(_.toFloat)))
    println(f"MLLIB wcss=${wcss(ml.centroids)}%.1f recall=${recall(ml)}")
    for (restarts <- Seq(1, 4, 16)) {
      val lc = Ivf.Model(LocalKMeans.fit(pts, 16, 42L, 20, restarts))
      println(f"LOCAL r=$restarts wcss=${wcss(lc.centroids)}%.1f recall=${recall(lc)}")
    }
  }
}
