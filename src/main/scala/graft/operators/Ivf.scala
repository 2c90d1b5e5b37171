package graft.operators

import graft.functions.{VectorFunctions => VF}
import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * IVF-Flat index build + nprobe search, Spark-first
 * (reference: contrib/datavec/src/ivfbuild.cpp, ivfkmeans.cpp,
 * ivfscan.cpp — k-means cluster lists, probe the nprobe nearest).
 *
 * Scale design (SURVEY §5): the build is MLlib k-means over a sample,
 * then a shuffle-free argmin assignment (centroids are a broadcast
 * literal, evaluated with higher-order array functions inside codegen).
 * At 100 TB the tagged corpus is written `partitionBy("list_id")` so a
 * search's `list_id IN (probes)` prunes at the parquet reader and scans
 * only nprobe/nlists of the data.
 */
object Ivf {

  final case class Model(centroids: Array[Array[Float]]) {
    def nlists: Int = centroids.length

    /** Nearest-centroid list ids for one query vector, best first. */
    def probes(q: Array[Float], nprobe: Int): Seq[Int] = {
      def l2sq(a: Array[Float], b: Array[Float]): Double = {
        var acc = 0.0; var i = 0
        while (i < a.length) { val d = a(i).toDouble - b(i).toDouble; acc += d * d; i += 1 }
        acc
      }
      centroids.indices
        .sortBy(i => (l2sq(q, centroids(i)), i))
        .take(nprobe)
    }
  }

  /** Train list centroids with MLlib k-means (deterministic under `seed`). */
  def build(corpus: DataFrame, vecCol: String, nlists: Int, seed: Long = 42L,
      sampleFraction: Double = 1.0): Model = {
    val sample =
      if (sampleFraction >= 1.0) corpus else corpus.sample(sampleFraction, seed)
    val feats = sample.select(array_to_vector(col(vecCol).cast("array<double>")).as("features"))
    val km = new KMeans().setK(nlists).setSeed(seed).setMaxIter(20)
      .setFeaturesCol("features")
    val model = km.fit(feats)
    Model(model.clusterCenters.map(_.toArray.map(_.toFloat)))
  }

  /**
   * Tag every corpus row with its nearest list id. Shuffle-free: the
   * centroid table is a broadcast literal scanned per row with
   * transform/array_position (stays inside whole-stage codegen).
   */
  def assign(corpus: DataFrame, vecCol: String, model: Model): DataFrame = {
    val cents: Column = typedlit(model.centroids.map(_.toSeq).toSeq)
    val dists = transform(cents, c => VF.l2SquaredDistance(col(vecCol), c))
    corpus.withColumn("list_id",
      (array_position(dists, array_min(dists)) - 1).cast("int"))
  }

  /**
   * nprobe search: prune to the nprobe nearest lists, then exact top-k
   * inside them (TakeOrderedAndProject — no shuffle). When `tagged` is a
   * parquet table partitioned by list_id, the isin filter becomes
   * partition pruning.
   */
  def search(tagged: DataFrame, vecCol: String, idCol: String, model: Model,
      query: Array[Float], k: Int, nprobe: Int): DataFrame = {
    val probeIds = model.probes(query, nprobe).map(Integer.valueOf)
    tagged
      .filter(col("list_id").isin(probeIds: _*))
      .select(col(idCol), round(VF.l2Distance(col(vecCol), lit(query)), 6).as("dist"))
      .orderBy(col("dist"), col(idCol))
      .limit(k)
  }
}
