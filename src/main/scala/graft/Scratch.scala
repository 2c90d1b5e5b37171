package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Bridge

/** Transient dev probe — not shipped; deleted before round close. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Sessions.initCheckpoints(spark)
    val docs = Tables.spread(spark, "/root/testdata/sf0.1", "documents")

    def t(name: String)(f: => Unit): Unit = {
      f
      val t0 = System.nanoTime(); f
      println(f"PROBE $name ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }

    val trainDf = docs.filter(col("doc_id") % 2 === 0)
    val counts = trainDf.select(explode(Bridge.column(
        graft.functions.TaggedGramHashes(Bridge.expression(col("text")))))
        .as("g"))
      .groupBy(col("g.h").as("h"))
      .agg(sum(when(col("g.cls") === 1, 1L).otherwise(0L)).as("cu"),
        sum(when(col("g.cls") === 2, 1L).otherwise(0L)).as("cb"),
        sum(when(col("g.cls") === 3, 1L).otherwise(0L)).as("ct"))
    t("counts") { counts.write.format("noop").mode("overwrite").save() }

    val docTri = docs.select(col("doc_id").as("id"),
        explode(Bridge.column(graft.functions.TrigramProbeHashes(
          Bridge.expression(col("text"))))).as("g"))
      .select(col("id"), col("g.h123").as("h123"), col("g.h12").as("h12"),
        col("g.h23").as("h23"), col("g.h2").as("h2"), col("g.h3").as("h3"))
      .groupBy(col("id"), col("h123"))
      .agg(count(lit(1)).as("m"), first(col("h12")).as("h12"),
        first(col("h23")).as("h23"), first(col("h2")).as("h2"),
        first(col("h3")).as("h3"))
    t("docTri") { docTri.write.format("noop").mode("overwrite").save() }

    val full = graft.operators.TextAnalysis.trigramBackoffNll(
      docs, "doc_id", "text", col("doc_id") % 2 === 0)
    t("full") { full.write.format("noop").mode("overwrite").save() }
    full.collect() // drive full's own QueryExecution so AQE finalizes
    val ep = full.queryExecution.executedPlan.toString
    val stageIds = "ShuffleQueryStage (\\d+)".r.findAllMatchIn(ep)
      .map(_.group(1)).toSeq
    println("SHUFFLE STAGES: " + stageIds.mkString(",") +
      " distinct=" + stageIds.distinct.size)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("/root/repo/plans/r20/text_trigram_ppl_after_executed.txt"),
      ep)
    spark.stop()
  }
}
