package graft

import org.apache.spark.sql.SparkSession

/**
 * Benchmark main (driver contract): runs the headline query set on
 * SPARK_GRAFT_SF_DIR and prints one JSON line with per-query seconds.
 *
 * Queries are forced through the noop sink — a bare count() would let
 * Catalyst prune the very expressions under test.
 */
object Bench {
  // headline set: one representative per operator family
  val headline: Seq[String] = Seq(
    "q1_pricing", "q3_shipping", "q5_volume", "q6_forecast",
    "q4_order_priority", "window_topn", "topk_perkey", "window_running", "rollup_agg",
    "distinct_agg", "percentiles", "approx_percentiles", "set_ops",
    "vec_l2_topk", "vec_cos_topk", "vec_norm", "vec_avg", "vec_half_agg", "vec_io",
    "knn_exact", "knn_join", "binquant_rerank", "lsh_ann", "ivf_search", "hnsw_ann",
    "hnsw_routed",
    "dedup_exact", "dedup_minhash", "dedup_simhash", "sim_ngram_jaccard", "dedup_embedding",
    "dedup_embedding_lsh", "graph_reach", "pipeline_curate",
    "text_langid", "text_quality", "text_tokens", "text_fingerprint",
    "mm_pipeline", "stream_window", "stream_neardup", "sessionize", "sessionize_stateful")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // the sf tables are single smallish parquet files; default 128MB
      // maxPartitionBytes would make every scan single-threaded
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.ui.enabled", "false")
      .config("spark.cleaner.referenceTracking.cleanCheckpoints", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Sessions.initCheckpoints(spark)

    // JVM/codegen warmup on the smallest sf
    SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()

    val qs = SparkEntry.queries
    def run(name: String): Boolean =
      try { qs(name)(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}"); false
      }
    val results = headline.filter(qs.contains).map { name =>
      // one warmup run (JIT + codegen compile), then the timed run:
      // steady-state throughput is what a long-lived cluster job sees.
      // Collect garbage between queries so one query's allocation debt
      // doesn't land in the next query's measurement (observed 1.2-3.2s
      // swings on the same query within one bench run).
      val warm = run(name)
      System.gc()
      val t0 = System.nanoTime()
      val ok = warm && run(name)
      name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
    }
    val qJson = results.map { case (k, v) => "\"" + k + f"""\":$v%.3f""" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qJson,"sf":"$sfDir"}""")
    spark.stop()
  }
}
