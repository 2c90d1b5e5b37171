package graft

import graft.operators.StorageStats
import graft.queries.Gate
import org.apache.spark.sql.functions._

/**
 * Parquet footer introspection (pgstattuple analogue): row-group rows
 * sum to the data's count, footer null counts and min/max match the
 * data, multi-file directories expand, and multiple row groups appear
 * when the block size forces them — all from METADATA reads.
 */
class StorageStatsSpec extends SparkSpec {
  import spark.implicits._

  test("footer stats match the data over a multi-file directory") {
    val dir = new java.io.File(Gate.scratchDir("graft-storagestats"), "t.parquet")
    val df = spark.range(0, 10000).select(
      col("id").as("k"),
      when(col("id") % 7 === 0, lit(null)).otherwise(col("id")).as("v"))
    df.repartition(3).write.mode("overwrite").parquet(dir.getAbsolutePath)

    val rg = StorageStats.rowGroups(spark,
      Seq(("t", dir.getAbsolutePath, "k"))).cache()
    val files = rg.select("file").distinct().count()
    assert(files == 3)
    assert(rg.agg(sum("rows")).as[Long].head() == 10000L)
    assert(rg.agg(min("key_min")).as[Long].head() == 0L)
    assert(rg.agg(max("key_max")).as[Long].head() == 9999L)
    assert(rg.agg(sum("key_nulls")).as[Long].head() == 0L)
    assert(rg.agg(min("total_byte_size")).as[Long].head() > 0L)
    assert(rg.agg(min("compressed_size")).as[Long].head() > 0L)

    // the nullable column's footer null count is exact
    val rgV = StorageStats.rowGroups(spark,
      Seq(("t", dir.getAbsolutePath, "v")))
    val nulls = rgV.agg(sum("key_nulls")).as[Long].head()
    assert(nulls == df.filter(col("v").isNull).count())
  }

  test("small block size forces multiple row groups per file") {
    val dir = new java.io.File(Gate.scratchDir("graft-storagestats2"), "m.parquet")
    spark.range(0, 200000).select(col("id").as("k"),
        concat(lit("padpadpadpad"), col("id")).as("s"))
      .coalesce(1)
      .write.mode("overwrite")
      .option("parquet.block.size", 64 * 1024)
      .parquet(dir.getAbsolutePath)
    val rg = StorageStats.rowGroups(spark, Seq(("m", dir.getAbsolutePath, "k")))
    val n = rg.count()
    assert(n > 1, s"expected multiple row groups, got $n")
    assert(rg.agg(sum("rows")).as[Long].head() == 200000L)
  }

  test("tableStats rolls up the sf tables consistently") {
    val stats = StorageStats.tableStats(spark, SparkTestSession.sfDir,
      Seq("region" -> "r_regionkey", "orders" -> "o_orderkey"))
      .collect().map(r => r.getString(0) -> r).toMap
    val orders = spark.read.parquet(s"${SparkTestSession.sfDir}/orders.parquet")
    assert(stats("orders").getAs[Long]("row_cnt") == orders.count())
    assert(stats("region").getAs[Long]("row_cnt") == 5L)
    assert(stats("region").getAs[Long]("key_min") == 0L)
    assert(stats("region").getAs[Long]("key_nulls") == 0L)
    assert(stats("orders").getAs[Long]("n_files") >= 1L)
  }
}
