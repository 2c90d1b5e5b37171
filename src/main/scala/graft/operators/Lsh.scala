package graft.operators

import graft.functions.{VectorFunctions => VF}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Bridge

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

  /**
   * All band buckets of a vector in one compiled pass: array<long> of
   * length `bands`, element b = the packed sign bits of band b
   * (MSB-first — same values as the original transform/aggregate HOF
   * formulation, without its interpreted per-bit lambdas; see
   * graft.functions.LshSignature).
   */
  def bandBuckets(vecCol: Column, planes: Array[Array[Float]],
      bands: Int, r: Int): Column = {
    require(planes.length == bands * r, s"need bands*r=${bands * r} planes")
    val dim = planes.head.length
    Bridge.column(graft.functions.LshSignature(
      Bridge.expression(vecCol.cast("array<float>")),
      planes.flatten.toIndexedSeq, dim, bands, r))
  }

  /**
   * Explode a table into (band, bucket) rows for bucket-join candidate
   * generation. Keeps `idCol` and `vecCol` for the rerank stage.
   */
  def banded(df: DataFrame, vecCol: String, idCol: String,
      planes: Array[Array[Float]], bands: Int, r: Int): DataFrame =
    df.select(col(idCol), col(vecCol),
      posexplode(bandBuckets(col(vecCol), planes, bands, r))
        .as(Seq("band", "bucket")))

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
