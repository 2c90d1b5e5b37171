package graft.operators

import graft.functions.{VectorFunctions => VF}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import scala.util.Random

/**
 * Random-hyperplane LSH for batch ANN
 * (reference analogue: contrib/datavec/src/hnswbuild.cpp — HNSW is an
 * online-serving graph; the Spark-native batch equivalent is hash-bucketed
 * candidate pruning + exact rerank, SURVEY §2 B5).
 *
 * Scale design: signatures are computed per-row inside codegen from a
 * broadcast literal of hyperplanes; candidate generation is an equi-join
 * on (band, bucket) — a short-key shuffle that never materializes O(n²)
 * pairs outside buckets.
 */
object Lsh {

  /** Deterministic Gaussian hyperplanes (fixed seed → reproducible plans). */
  def hyperplanes(dim: Int, nbits: Int, seed: Long = 42L): Array[Array[Float]] = {
    val rnd = new Random(seed)
    Array.fill(nbits)(Array.fill(dim)(rnd.nextGaussian().toFloat))
  }

  /** Sign-bit signature: array<int> of 0/1, one per hyperplane. */
  def signature(vecCol: Column, planes: Array[Array[Float]]): Column = {
    val p: Column = typedlit(planes.map(_.toSeq).toSeq)
    transform(p, h => when(VF.innerProduct(vecCol, h) >= 0d, 1).otherwise(0))
  }

  /** Pack band `b` (r bits starting at b*r) of a signature into an int. */
  def bandBucket(sigCol: Column, band: Int, r: Int): Column =
    aggregate(slice(sigCol, band * r + 1, r), lit(0), (acc, x) => acc * 2 + x)

  /**
   * Explode a table into (band, bucket) rows for bucket-join candidate
   * generation. Keeps `idCol` and `vecCol` for the rerank stage.
   */
  def banded(df: DataFrame, vecCol: String, idCol: String,
      planes: Array[Array[Float]], bands: Int, r: Int): DataFrame = {
    val sig = signature(col(vecCol), planes)
    val bandArr = array((0 until bands).map(b => bandBucket(sig, b, r)): _*)
    df.select(col(idCol), col(vecCol),
        posexplode(bandArr).as(Seq("band", "bucket")))
  }

  /**
   * ANN top-k via banded LSH: candidates share ≥1 band bucket with the
   * query; exact rerank on the candidate set.
   */
  def annTopK(corpus: DataFrame, vecCol: String, idCol: String,
      query: Array[Float], k: Int, planes: Array[Array[Float]],
      bands: Int, r: Int,
      dist: (Column, Column) => Column = VF.cosineDistance): DataFrame = {
    // query buckets: tiny, computed the same way on a 1-row frame
    val spark = corpus.sparkSession
    import spark.implicits._
    val qdf = Seq((0L, query.toSeq)).toDF("qid", "qv")
    val qb = broadcast(
      banded(qdf, "qv", "qid", planes, bands, r)
        .select(col("band").as("q_band"), col("bucket").as("q_bucket")))
    banded(corpus, vecCol, idCol, planes, bands, r)
      .join(qb, col("band") === col("q_band") && col("bucket") === col("q_bucket"))
      .select(col(idCol), col(vecCol)).distinct()
      .select(col(idCol), round(dist(col(vecCol), lit(query)), 6).as("dist"))
      .orderBy(col("dist"), col(idCol))
      .limit(k)
  }

  /**
   * Binary-quantize coarse search + exact rerank
   * (reference: contrib/datavec README "binary quantization" rerank
   * pipeline): Hamming top-(k·oversample) candidates, exact top-k rerank.
   */
  def binQuantRerank(corpus: DataFrame, vecCol: String, idCol: String,
      query: Array[Float], k: Int, oversample: Int = 5,
      dist: (Column, Column) => Column = VF.l2Distance): DataFrame = {
    val coarse = corpus
      .select(col(idCol), col(vecCol),
        VF.hammingDistance(VF.binaryQuantize(col(vecCol)),
          VF.binaryQuantize(lit(query))).as("hamm"))
      .orderBy(col("hamm"), col(idCol))
      .limit(k * oversample)
    coarse
      .select(col(idCol), round(dist(col(vecCol), lit(query)), 6).as("dist"))
      .orderBy(col("dist"), col(idCol))
      .limit(k)
  }
}
