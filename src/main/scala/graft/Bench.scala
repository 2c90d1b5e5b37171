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
    "knn_exact", "knn_join", "vec_range", "knn_filtered", "binquant_rerank", "lsh_ann", "ivf_search", "pq_search", "ivfpq_search", "hnsw_ann",
    "hnsw_routed", "vec_sparse_topk", "ivf_half_search", "ivf_int8_search",
    "dedup_exact", "dedup_minhash", "dedup_simhash", "sim_ngram_jaccard", "dedup_embedding",
    "dedup_embedding_lsh", "dedup_spans", "dedup_incremental", "sim_trgm", "graph_reach", "graph_hops", "sql_recursive", "pipeline_curate",
    "vocab_topk",
    "text_langid", "text_quality", "text_tokens", "text_fingerprint", "text_logprob", "text_bm25", "fuzzy_ops", "fts_match", "fts_bm25", "fts_gap", "fts_headline",
    "decontaminate", "dedup_best",
    "mm_pipeline", "mm_decode", "mm_audio", "mm_video", "mm_jpeg", "mm_resize", "pack_sequences",
    "stream_window", "stream_neardup", "stream_enrich", "stream_sample", "sessionize", "sessionize_stateful",
    "asof_join", "range_join", "theta_sketch",
    "sample_stratified", "array_ops", "zorder_layout",
    "within_group", "pivot_events", "gap_fill", "scd2_intervals", "merge_upsert", "cdc_apply", "funnel", "profile_stats", "stats_agg", "histogram", "json_ops", "mix_sources", "bpe_step", "pipeline_pretrain",
    "text_repetition", "quality_classifier", "bm25_search", "shuffle_batches",
    "dedup_semantic", "agg_filter", "grouping_fn", "unnest_ord", "graph_pagerank",
    "window_nav", "window_rank_fns", "null_safe_eq", "vec_int8_topk",
    "date_extract", "regexp_fns", "hop_window", "stream_hop", "pipeline_batches", "like_escape", "interval_arith", "skew_join", "bloom_join",
    "fts_retrieve", "fts_rank", "fts_websearch", "hybrid_rrf", "bpe_encode", "connect_by", "matview_inc",
    "fts_rank_cd", "stream_matview", "fts_rank_weighted", "fts_indexed", "fts_stat",
    "regr_agg", "bool_bit_aggs", "asof_multi", "matview_minmax", "oversample", "text_bigram_ppl", "fts_indexed_retrieve", "profile_skew",
    "fts_stemmed", "fts_stem_phrase", "fts_stem_indexed", "fts_prefix",
    "json_contain", "json_mutate", "json_set", "json_path",
    "tsvector_ops", "fts_stem_retrieve", "ivf_bit_search", "hnsw_bit",
    "ltree_ops", "ltree_tree", "intarray_ops", "hstore_ops", "ora_compat",
    "geo_distance", "geo_radius_join", "range_ops", "range_overlap_join",
    "fts_synonym", "maxsim_retrieve", "digest_fns",
    "trgm_search", "window_range_frame", "ltree_txtquery", "mysql_compat",
    "trgm_search_many", "intarray_query", "weighted_sample",
    "cube_ops", "citext_ops", "uuid_fns", "xml_fns", "isn_ean13", "ora_to_char",
    "text_trigram_ppl", "hilbert_layout")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // testdata timestamps are written tz-naive (timestamp[us], not UTC-
      // adjusted); read them as LTZ under the UTC session zone, as every
      // operator and oracle expects, instead of Spark 4's NTZ inference
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
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
    def run(name: String, dir: String): Boolean =
      try { qs(name)(spark, dir).write.format("noop").mode("overwrite").save(); true }
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}"); false
      }
    // one warmup run (JIT + codegen compile), then MEDIAN of 3 timed
    // runs: single-sample local timings swing ±20%+ run-to-run (GC,
    // thread scheduling), which repeatedly read as phantom regressions
    // across rounds. The median is robust to one bad run; the per-query
    // relative spread ((max-min)/median) is reported alongside so a
    // noisy measurement is visible instead of silently trusted.
    // System.gc() between runs keeps one query's allocation debt out of
    // the next measurement.
    // clamp: 0/negative/garbage would crash the median index below
    val reps = math.max(1, sys.env.get("SPARK_GRAFT_BENCH_REPS")
      .flatMap(_.trim.toIntOption).getOrElse(3))
    // TWO warmups (see timeSet): for the widest-codegen queries one
    // warm run is not enough — dedup_simhash's first TIMED rep sat
    // ~60% above steady state across a 10-rep experiment (1.94s vs
    // 1.14-1.31s, r8), polluting both the median and the spread
    // metric. The second warmup costs ~10s across the whole bench.
    def timeSet(dir: String, warmups: Int): Seq[(String, Double, Double)] =
      headline.filter(qs.contains).map { name =>
        val warm = (1 to warmups).forall(_ => run(name, dir))
        val times = (1 to reps).map { _ =>
          System.gc()
          val t0 = System.nanoTime()
          val ok = warm && run(name, dir)
          if (ok) (System.nanoTime() - t0) / 1e9 else -1.0
        }
        if (times.contains(-1.0)) (name, -1.0, 0.0)
        else {
          val sorted = times.sorted
          val med = sorted(sorted.length / 2)
          (name, med, if (med > 0) (sorted.last - sorted.head) / med else 0.0)
        }
      }
    val results = timeSet(sfDir, warmups = 2)
    // second, SMALLER sf: the per-query main/small time ratio flags
    // super-linear plans (a >= 15x ratio on a 10x data step means a
    // quadratic join or global sort is hiding somewhere) BEFORE a real
    // scale-up does. One warmup suffices — the JIT is hot by now.
    val smallDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR_SMALL",
      "/root/testdata/sf0.01")
    val resultsSmall =
      if (smallDir != sfDir && new java.io.File(smallDir).isDirectory)
        timeSet(smallDir, warmups = 1)
      else Seq.empty
    val qJson = results.map { case (k, v, _) => "\"" + k + f"""\":$v%.3f""" }
      .mkString("{", ",", "}")
    val sJson = results.map { case (k, _, s) => "\"" + k + f"""\":$s%.2f""" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    // FIELD ORDER MATTERS for the capture window: the driver keeps only
    // the last ~2000 chars of output, and at 95 queries the full JSON
    // is wider than that — whatever sits at the END of the line is what
    // survives. spread first, per-query timings LAST (the audited
    // numbers), and a short summary line printed separately so the
    // headline metric parses even when the wide line is clipped.
    val line =
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","sf":"$sfDir","spread":$sJson,"queries":$qJson}"""
    val summary =
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","sf":"$sfDir","n_queries":${results.size}}"""
    // dual-SF scaling block (file artifact only — the stdout line stays
    // in the driver's expected shape): per-query main/small ratios plus
    // the >= 15x outlier list, ready to audit without recomputation.
    val scaleJson = if (resultsSmall.isEmpty) "" else {
      val smallMap = resultsSmall.map { case (k, v, _) => k -> v }.toMap
      val ratios = results.flatMap { case (k, v, _) =>
        smallMap.get(k).filter(s => s > 0 && v >= 0)
          .map(s => (k, v / math.max(s, 1e-3)))
      }
      val rJson = ratios.map { case (k, r) => "\"" + k + f"""\":$r%.1f""" }
        .mkString("{", ",", "}")
      val qsJson = resultsSmall.map { case (k, v, _) => "\"" + k + f"""\":$v%.3f""" }
        .mkString("{", ",", "}")
      val totalSmall = resultsSmall.map(_._2).filter(_ >= 0).sum
      val outliers = ratios.filter(_._2 >= 15.0).map("\"" + _._1 + "\"")
        .mkString("[", ",", "]")
      f""","sf_small":"$smallDir","total_small":$totalSmall%.3f,"outliers_15x":$outliers,"queries_small":$qsJson,"scale_ratio":$rJson"""
    }
    val fileLine = line.dropRight(1) + scaleJson + "}"
    // full copy into the repo: immune to any stdout capture window.
    // Path resolves explicitly (env override, repo-root default) so the
    // artifact lands in the repo regardless of the launcher's cwd; only
    // NonFatal write errors are swallowed — an OOM/VM error must
    // propagate, not be silently eaten here.
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT",
      "/root/repo/BENCH_LOCAL.json")
    try {
      java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
        (fileLine + "\n").getBytes("UTF-8"))
    } catch { case scala.util.control.NonFatal(_) => () }
    println(summary)
    println(line)
    Console.out.flush()
    spark.sparkContext.setLogLevel("ERROR")
    spark.stop()
    println(summary)
    println(line)
    Console.out.flush()
  }
}
