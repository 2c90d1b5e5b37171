package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Structured-log reader — the log_fdw / file_fdw shape (reference:
 * contrib/log_fdw — foreign tables over server log files, each line
 * regex-split into typed columns; contrib/file_fdw with a text
 * parser). Spark shape: `spark.read.text` (splittable, distributed,
 * no inference job) + ONE compiled regex extracting every field in a
 * single codegen pass, typed casts after extraction.
 *
 * PERMISSIVE semantics like the reference's csvlog path: lines that
 * don't match the pattern survive with NULL fields and the raw line
 * in `_corrupt_line` — a 100 TB log scan never dies on one bad line.
 */
object LogSource {

  /**
   * Read a log directory/glob where each line matches `pattern`;
   * `fields` names the capture groups in order, `schema` gives each
   * extracted field's target type (cast from the string group).
   */
  def readLog(spark: SparkSession, path: String, pattern: String,
      fields: Seq[(String, DataType)]): DataFrame = {
    val raw = spark.read.text(path)
    val matched = raw.withColumn("_m",
      regexp_extract_all(col("value"), lit(s"^$pattern$$"), lit(0)))
    val ok = size(col("_m")) > 0
    val cols = fields.zipWithIndex.map { case ((name, dt), i) =>
      when(ok, regexp_extract(col("value"), s"^$pattern$$", i + 1))
        .otherwise(lit(null)).cast(dt).as(name)
    }
    matched.select(cols :+
      when(!ok, col("value")).otherwise(lit(null)).as("_corrupt_line"): _*)
  }

  /** The classic combined/app log line: `TS LEVEL [component] message`. */
  val AppLogPattern: String =
    "(\\d{4}-\\d{2}-\\d{2} \\d{2}:\\d{2}:\\d{2}) +([A-Z]+) +\\[([^\\]]*)\\] +(.*)"

  val AppLogFields: Seq[(String, DataType)] = Seq(
    "ts" -> TimestampType, "level" -> StringType,
    "component" -> StringType, "message" -> StringType)
}
