package graft

import graft.queries.Gate
import graft.sources.FileFdw
import org.apache.spark.sql.functions._

/**
 * file_fdw option mapping: the PG csv dialect (doubled-quote escaping,
 * custom delimiters, null markers, headers) and the text format
 * (tab-delimited, \N nulls) round-trip typed rows exactly.
 */
class FileFdwSpec extends SparkSpec {
  import spark.implicits._

  private def sample = Seq(
    (1L, "plain", Option("x"), 1.5),
    (2L, "with, comma", Option("y"), -2.25),
    (3L, "with \"quotes\" inside", None, 0.0),
    (4L, "pipe|and|more", Option("z"), 12345.6789))
    .toDF("id", "s", "opt", "d")

  test("csv format: quoting, doubled quotes, nulls, header") {
    val dir = new java.io.File(Gate.scratchDir("graft-filefdw-spec"),
      "csv").getAbsolutePath
    FileFdw.write(sample, dir, header = true, nullStr = Some("\\N"))
    val back = FileFdw.read(spark, dir, sample.schema, header = true,
      nullStr = Some("\\N"))
    assert(back.orderBy("id").collect().toSeq ==
      sample.orderBy("id").collect().toSeq)
  }

  test("csv format: custom delimiter and quote") {
    val dir = new java.io.File(Gate.scratchDir("graft-filefdw-spec2"),
      "csv").getAbsolutePath
    FileFdw.write(sample, dir, delimiter = Some("|"), quote = Some("'"))
    val back = FileFdw.read(spark, dir, sample.schema,
      delimiter = Some("|"), quote = Some("'"))
    assert(back.orderBy("id").collect().toSeq ==
      sample.orderBy("id").collect().toSeq)
  }

  test("text format: tab delimiter and \\N nulls by default") {
    val plain = sample.filter(!col("s").contains("\"")) // no quoting in text
    val dir = new java.io.File(Gate.scratchDir("graft-filefdw-spec3"),
      "txt").getAbsolutePath
    FileFdw.write(plain, dir, format = "text")
    val back = FileFdw.read(spark, dir, plain.schema, format = "text")
    assert(back.orderBy("id").collect().toSeq ==
      plain.orderBy("id").collect().toSeq)
  }

  test("declared schema, no inference; bad format rejected") {
    assertThrows[IllegalArgumentException](
      FileFdw.read(spark, "/tmp/x", sample.schema, format = "orc"))
    assertThrows[IllegalArgumentException](
      FileFdw.read(spark, "/tmp/x", sample.schema, delimiter = Some("ab")))
  }
}
