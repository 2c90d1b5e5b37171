package graft.queries

import graft.Tables
import graft.operators.{Hnsw, Ivf, Knn, Lsh}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * ANN / similarity-search queries (SURVEY §2 B-series). The query vector
 * is vec_id = 0 (a k-row driver collect, allowed by SURVEY §5).
 *
 * knn_exact / knn_join / binquant_rerank have exact SQL oracles;
 * ivf_* / lsh_ann are approximate-by-design → rows-only oracle plus
 * recall assertions in AnnSpec.
 */
object AnnSuite {
  type Q = (SparkSession, String) => DataFrame

  private def queryVec(s: SparkSession, dir: String): Array[Float] =
    Tables(s, dir, "embeddings").filter(col("vec_id") === 0)
      .select(col("embedding")).head().getSeq[Float](0).toArray

  // the IVF index is built once per corpus in reality; memoize the
  // (deterministic, seeded) model per data dir so queries don't re-run
  // k-means each invocation.
  private val modelCache =
    new java.util.concurrent.ConcurrentHashMap[(String, Int), Ivf.Model]()
  private def ivfModel(s: SparkSession, dir: String, nlists: Int): Ivf.Model =
    modelCache.computeIfAbsent((dir, nlists),
      _ => Ivf.build(Tables(s, dir, "embeddings"), "embedding", nlists))

  val queries: Map[String, Q] = Map(
    // B1: exact top-k — TakeOrderedAndProject, no shuffle.
    "knn_exact" -> ((s, dir) =>
      Knn.exactTopK(Tables(s, dir, "embeddings"), "embedding", "vec_id",
        queryVec(s, dir), 20)),

    // B2: many-query KNN join with bounded-heap partial aggregation.
    "knn_join" -> ((s, dir) => {
      val emb = Tables(s, dir, "embeddings")
      val qs = emb.filter(col("vec_id") < 5)
      Knn.knnJoin(qs, "embedding", "vec_id", emb, "embedding", "vec_id", 5)
        .orderBy("qid", "rank")
    }),

    // B3: IVF build — list histogram (k-means is seeded; rows-only oracle).
    "ivf_build" -> ((s, dir) => {
      val emb = Tables(s, dir, "embeddings")
      val model = ivfModel(s, dir, 16)
      Ivf.assign(emb, "embedding", model)
        .groupBy(col("list_id")).agg(count(lit(1)).as("n"))
        .orderBy("list_id")
    }),

    // B4: IVF nprobe search (approximate; recall asserted in AnnSpec).
    "ivf_search" -> ((s, dir) => {
      val emb = Tables(s, dir, "embeddings")
      val model = ivfModel(s, dir, 16)
      val tagged = Ivf.assign(emb, "embedding", model)
      Ivf.search(tagged, "embedding", "vec_id", model, queryVec(s, dir),
        k = 10, nprobe = 4)
    }),

    // B5: hyperplane-LSH banded ANN (approximate).
    "lsh_ann" -> ((s, dir) => {
      val emb = Tables(s, dir, "embeddings")
      val planes = Lsh.hyperplanes(dim = 64, nbits = 16)
      Lsh.annTopK(emb, "embedding", "vec_id", queryVec(s, dir), k = 10,
        planes, bands = 4, r = 4)
    }),

    // B5b: per-partition NSW graph ANN + beam search (the HNSW
    // analogue; approximate — recall vs exact and vs IVF asserted in
    // AnnSpec on equal candidate budgets).
    "hnsw_ann" -> ((s, dir) => {
      val emb = Tables(s, dir, "embeddings")
      val index = Hnsw.buildIndex(emb, "embedding", "vec_id", numParts = 8)
      Hnsw.search(index, queryVec(s, dir), k = 10)
    }),

    // B5c/B8: routed many-query search over CLUSTERED NSW shards — each
    // query beams only in its nprobe nearest lists (the batch ANN shape
    // at 100 TB: shard routing + per-shard graph search). The index is
    // built ONCE per corpus and persisted partitionBy(part_id), so the
    // routing filter prunes whole shard directories at the parquet
    // reader (PartitionFilters asserted in PlanContractSpec) — an index
    // is a build-once artifact, not per-query work. Approximate →
    // rows-only; recall vs unrouted searchMany asserted in AnnSpec.
    "hnsw_routed" -> ((s, dir) => {
      val emb = Tables(s, dir, "embeddings")
      val path = s"target/graft-nsw/${new java.io.File(dir).getName}"
      // the quantizer model is part of the index artifact: persist it
      // WITH the shards and always route with the persisted centroids —
      // a per-process retrain could disagree with the stored part_id
      // layout and silently misroute
      val modelPath = s"$path-model"
      // both artifacts or neither: a shard layout without its quantizer
      // (or vice versa) must trigger a rebuild
      if (!new java.io.File(path, "_SUCCESS").exists()
          || !new java.io.File(modelPath, "_SUCCESS").exists()) {
        val m = ivfModel(s, dir, 16)
        Ivf.saveModel(s, m, modelPath)
        Hnsw.buildIndexClustered(emb, "embedding", "vec_id", m)
          .write.mode("overwrite").partitionBy("part_id").parquet(path)
      }
      val model = Ivf.loadModel(s, modelPath)
      val spark = s
      import spark.implicits._
      val index = s.read.parquet(path).as[Hnsw.GraphRow]
      val qs = emb.filter(col("vec_id") < 5)
        .select(col("vec_id").cast("long"), col("embedding"))
        .as[(Long, Seq[Float])].collect()
        .map { case (id, v) => (id, v.toArray) }
      Hnsw.searchManyRouted(index, model, qs, k = 5, nprobe = 4)
        .orderBy("qid", "rank")
    }),

    // B6: binary-quantize coarse + exact rerank (exact SQL oracle).
    "binquant_rerank" -> ((s, dir) =>
      Lsh.binQuantRerank(Tables(s, dir, "embeddings"), "embedding", "vec_id",
        queryVec(s, dir), k = 10, oversample = 5)),

    // B7: incremental index maintenance end-to-end (ref: ivfinsert.cpp /
    // ivfflatbulkdelete) — build the partitioned index WITHOUT a held-out
    // delta, append the delta against the frozen centroids, bulk-delete a
    // victim set (only its list partitions rewritten), then search
    // exactly (nprobe = nlists) through the reloaded layout. Emits
    // deterministic counts; rows-only gate (the layout is a filesystem
    // artifact, not SQL-reachable).
    "ivf_append" -> ((s, dir) => {
      val emb = Tables(s, dir, "embeddings")
      val model = ivfModel(s, dir, 16)
      val path = s"target/graft-ivf-append/${new java.io.File(dir).getName}"
      val isDelta = pmod(col("vec_id"), lit(10)) === 7
      Ivf.writeIndex(emb.filter(!isDelta), "embedding", model, path)
      val index = Ivf.appendToIndex(emb.filter(isDelta), "embedding", model, path)
      val victims = emb.filter(pmod(col("vec_id"), lit(1000)) === 123)
        .select(col("vec_id"))
      val afterDelete = Ivf.deleteFromIndex(s, path, "vec_id", victims)
      val found = Ivf.search(afterDelete, "embedding", "vec_id", model,
        queryVec(s, dir), k = 10, nprobe = 16)
      val deltaIds = emb.filter(isDelta).select(col("vec_id"))
      afterDelete.agg(count(lit(1)).as("n_total"))
        .crossJoin(deltaIds.agg(count(lit(1)).as("n_delta")))
        .crossJoin(victims.agg(count(lit(1)).as("n_deleted")))
        .crossJoin(found.join(deltaIds, Seq("vec_id"), "left_semi")
          .agg(count(lit(1)).as("n_top10_from_delta")))
        .crossJoin(found.orderBy(col("dist"), col("vec_id")).limit(1)
          .select(col("vec_id").as("top1_id")))
    }),

    // B2+B3: many-query KNN join routed through the IVF lists — the
    // scalable (equi-join, no broadcast) path. nprobe = nlists makes it
    // exact, so the SQL window-rank oracle applies.
    "ivf_knn_join" -> ((s, dir) => {
      val emb = Tables(s, dir, "embeddings")
      val model = ivfModel(s, dir, 16)
      val tagged = Ivf.assign(emb, "embedding", model)
      val qs = emb.filter(col("vec_id") < 5)
      Ivf.knnJoin(qs, "embedding", "vec_id", tagged, "embedding", "vec_id",
          model, k = 5, nprobe = 16)
        .orderBy("qid", "rank")
    })
  )

  private val distSql =
    "round(list_distance(e.embedding::DOUBLE[], q.qv::DOUBLE[]), 6)"

  val oracle: Map[String, String] = Map(
    "knn_exact" ->
      s"""WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
         |SELECT e.vec_id, $distSql AS dist
         |FROM embeddings e, q ORDER BY dist, vec_id LIMIT 20""".stripMargin,

    "knn_join" ->
      """WITH qs AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id < 5),
        |ranked AS (
        |  SELECT qs.qid, e.vec_id AS nid,
        |    round(list_distance(e.embedding::DOUBLE[], qs.qv::DOUBLE[]), 6) AS dist,
        |    row_number() OVER (PARTITION BY qs.qid
        |      ORDER BY round(list_distance(e.embedding::DOUBLE[], qs.qv::DOUBLE[]), 6), e.vec_id) AS rank
        |  FROM embeddings e, qs)
        |SELECT qid, rank, nid, dist FROM ranked WHERE rank <= 5
        |ORDER BY qid, rank""".stripMargin,

    "ivf_knn_join" ->
      """WITH qs AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id < 5),
        |ranked AS (
        |  SELECT qs.qid, e.vec_id AS nid,
        |    round(list_distance(e.embedding::DOUBLE[], qs.qv::DOUBLE[]), 6) AS dist,
        |    row_number() OVER (PARTITION BY qs.qid
        |      ORDER BY round(list_distance(e.embedding::DOUBLE[], qs.qv::DOUBLE[]), 6), e.vec_id) AS rank
        |  FROM embeddings e, qs)
        |SELECT qid, rank, nid, dist FROM ranked WHERE rank <= 5
        |ORDER BY qid, rank""".stripMargin,

    "binquant_rerank" ->
      """WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
        |coarse AS (
        |  SELECT e.vec_id, e.embedding,
        |    list_sum(list_transform(generate_series(1, len(e.embedding)),
        |      i -> CASE WHEN (e.embedding[i] > 0) <> (q.qv[i] > 0) THEN 1 ELSE 0 END)) AS hamm
        |  FROM embeddings e, q
        |  ORDER BY hamm, vec_id LIMIT 50)
        |SELECT c.vec_id,
        |  round(list_distance(c.embedding::DOUBLE[], q.qv::DOUBLE[]), 6) AS dist
        |FROM coarse c, q
        |ORDER BY dist, vec_id LIMIT 10""".stripMargin
  )
}
