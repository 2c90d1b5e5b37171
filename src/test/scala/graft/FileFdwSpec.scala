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

  test("non-UTF-8 encodings round-trip (GB18030, Latin-1)") {
    val ml = Seq((1L, "café résumé"), (2L, "数据库 系统"),
      (3L, "ascii only"), (4L, "mixed 数据 café"))
      .toDF("id", "t")
    for (enc <- Seq("GB18030", "ISO-8859-1")) {
      val rows = if (enc == "ISO-8859-1") ml.filter(col("id") =!= 2 &&
        col("id") =!= 4) else ml // latin-1 cannot hold CJK
      val dir = new java.io.File(Gate.scratchDir(s"graft-filefdw-$enc"),
        "csv").getAbsolutePath
      FileFdw.write(rows, dir, header = true, encoding = enc)
      // the on-disk bytes are NOT UTF-8 (proves a conversion happened)
      if (enc == "GB18030") {
        val part = new java.io.File(dir).listFiles()
          .find(_.getName.startsWith("part-")).get
        val bytes = java.nio.file.Files.readAllBytes(part.toPath)
        val utf8 = new String(bytes, "UTF-8")
        assert(!utf8.contains("café"), "expected GB18030 bytes on disk")
      }
      val back = FileFdw.read(spark, dir, rows.schema, header = true,
        encoding = enc)
      assert(back.orderBy("id").collect().toSeq ==
        rows.orderBy("id").collect().toSeq, s"round-trip under $enc")
    }
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
