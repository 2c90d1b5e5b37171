package graft

import org.apache.spark.sql.functions._

/**
 * Loader contracts for Tables.spread: the widen decision must come
 * from driver-side FileIndex arithmetic, widening single-file local
 * layouts while leaving an already-wide corpus untouched (no
 * repartition barrier, no physical-plan materialization just to
 * decide).
 */
class TablesSpec extends SparkSpec {

  private def par = spark.sparkContext.defaultParallelism

  test("single-file local tables widen to full parallelism") {
    val df = Tables.spread(spark, sfDir, "documents")
    assert(df.rdd.getNumPartitions == par)
  }

  test("an already-wide corpus keeps its scan untouched") {
    // 8 files >= 4 cores, sized so Spark's own split packing yields at
    // least `par` scan partitions (openCostInBytes dominates tiny
    // files: est = ceil(8 * 4MB / max(openCost, totalBytes/par)) >= 4)
    val dir = java.nio.file.Files.createTempDirectory("graft_tables").toString
    spark.range(0, 80000).select(col("id"), rand(7).as("x"))
      .repartition(8).write.mode("overwrite").parquet(s"$dir/wide.parquet")
    val df = Tables.spread(spark, dir, "wide")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"wide corpus got a repartition barrier:\n$plan")
    assert(df.rdd.getNumPartitions >= par)
    assert(df.count() == 80000)
  }

  test("a few-files corpus widens (repartition present, count intact)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_tables").toString
    spark.range(0, 1000).coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/narrow.parquet")
    val df = Tables.spread(spark, dir, "narrow")
    assert(df.rdd.getNumPartitions == par)
    assert(df.count() == 1000)
  }
}
