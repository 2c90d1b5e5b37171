package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/**
 * Source-format coverage: the same rows round-trip through JSONL and
 * CSV with explicit schemas (no inference job — at 100 TB schema
 * inference is a full extra scan), and a partitioned-parquet write
 * prunes at the reader.
 */
class SourcesSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    .select("doc_id", "lang", "n_chars")

  private def tmp(name: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"graft_$name")
    d.toFile.deleteOnExit()
    d.resolve("out").toString
  }

  test("JSONL round-trip with explicit schema") {
    val path = tmp("jsonl")
    docs.write.mode("overwrite").json(path)
    val back = spark.read.schema(docs.schema).json(path)
    assert(back.schema == docs.schema)
    assert(back.as[(Long, String, Long)].collect().toSet ==
      docs.as[(Long, String, Long)].collect().toSet)
  }

  test("CSV round-trip with explicit schema and header") {
    val path = tmp("csv")
    docs.write.mode("overwrite").option("header", "true").csv(path)
    val back = spark.read.schema(docs.schema)
      .option("header", "true").csv(path)
    assert(back.as[(Long, String, Long)].collect().toSet ==
      docs.as[(Long, String, Long)].collect().toSet)
  }

  test("schema given, no inference job: reads plan a single scan") {
    val path = tmp("noinf")
    docs.write.mode("overwrite").json(path)
    // with an explicit schema the read is lazy (no job); force a
    // pushdown check instead: filter + projection reach the scan
    val back = spark.read.schema(docs.schema).json(path)
      .filter(col("lang") === "en").select("doc_id")
    val plan = back.queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema: struct<doc_id:bigint,lang:string>"),
      s"projection should prune to the needed columns:\n$plan")
  }

  test("log_fdw-shaped reader: typed fields, permissive corrupt lines, one scan") {
    import graft.sources.LogSource
    val dir = java.nio.file.Files.createTempDirectory("graft-logs-")
    dir.toFile.deleteOnExit()
    val lines = Seq(
      "2026-08-14 12:00:01 INFO  [ingest] started batch 7",
      "2026-08-14 12:00:02 WARN  [dedup] bucket 14 flooded",
      "this line is garbage",
      "2026-08-14 12:00:03 ERROR [sink] write failed: disk full")
    java.nio.file.Files.write(dir.resolve("app.log"),
      String.join("\n", lines: _*).getBytes("UTF-8"))
    val df = LogSource.readLog(spark, dir.toString,
      LogSource.AppLogPattern, LogSource.AppLogFields)
    val rows = df.orderBy("ts").collect()
    assert(rows.length === 4)
    val good = rows.filter(!_.isNullAt(0))
    assert(good.length === 3)
    assert(good.map(_.getString(1)).toSeq === Seq("INFO", "WARN", "ERROR"))
    assert(good.map(_.getString(2)).toSeq === Seq("ingest", "dedup", "sink"))
    assert(good.forall(_.isNullAt(4)))
    val bad = rows.filter(_.isNullAt(0))
    assert(bad.length === 1 && bad(0).getString(4) === "this line is garbage")
    // one scan, no shuffle, codegen'd extraction
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"log parse must be map-only:\n$plan")
  }

  test("partitioned parquet write prunes partitions at the reader") {
    val path = tmp("part")
    docs.write.mode("overwrite").partitionBy("lang").parquet(path)
    val one = spark.read.parquet(path).filter(col("lang") === "de")
    val scanned = one.queryExecution.executedPlan.toString
    assert(scanned.contains("PartitionFilters: [isnotnull(lang"),
      s"lang filter should prune partitions:\n$scanned")
    assert(one.count() == docs.filter(col("lang") === "de").count())
  }
}
