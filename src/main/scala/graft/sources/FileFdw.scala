package graft.sources

import org.apache.spark.sql.{DataFrame, DataFrameReader, SparkSession}
import org.apache.spark.sql.types.StructType

/**
 * file_fdw (reference: contrib/file_fdw/file_fdw.cpp) — foreign tables
 * over server-side files with the COPY options — re-expressed as a
 * reader that maps the PG options onto Spark's (splittable,
 * schema-declared) csv source:
 *
 *   format csv/text, header, delimiter, quote, escape, null, encoding
 *
 * PG dialect notes honored here: CSV's default escape IS the quote
 * character (doubled quotes), TEXT format defaults to tab delimiter
 * and \\N nulls with quoting disabled. Like a FOREIGN TABLE, the
 * column list is DECLARED (no schema inference pass over 100 TB of
 * files) and reads stay splittable — no multiLine, so values must not
 * embed raw newlines (COPY data never does; they arrive escaped).
 */
object FileFdw {

  /** Spark 4 restricts csv charsets to a small whitelist unless
    * spark.sql.legacy.javaCharsets is on; openGauss-side encodings
    * (GB18030, GBK, EUC-*, …) need the full JVM charset set, so flip
    * the switch when a non-whitelisted encoding is requested (and
    * fail fast on charsets the JVM itself lacks). */
  private val sparkCharsets = Set("iso-8859-1", "us-ascii", "utf-16",
    "utf-16be", "utf-16le", "utf-32", "utf-8")
  private def enableCharset(spark: SparkSession, encoding: String): Unit =
    if (!sparkCharsets.contains(
        encoding.toLowerCase(java.util.Locale.ROOT))) {
      require(java.nio.charset.Charset.isSupported(encoding),
        s"graft: file_fdw encoding '$encoding' is not a JVM charset")
      spark.conf.set("spark.sql.legacy.javaCharsets", "true")
    }

  def read(spark: SparkSession, path: String, schema: StructType,
      format: String = "csv",
      header: Boolean = false,
      delimiter: Option[String] = None,
      quote: Option[String] = None,
      escape: Option[String] = None,
      nullStr: Option[String] = None,
      encoding: String = "UTF-8"): DataFrame = {
    val fmt = format.toLowerCase(java.util.Locale.ROOT)
    require(fmt == "csv" || fmt == "text",
      s"graft: file_fdw format must be csv or text, got $format")
    val sep = delimiter.getOrElse(if (fmt == "csv") "," else "\t")
    require(sep.length == 1, "graft: file_fdw delimiter must be one char")
    enableCharset(spark, encoding)
    val r: DataFrameReader = spark.read.schema(schema)
      .option("sep", sep)
      .option("header", header)
      .option("encoding", encoding)
      .option("mode", "FAILFAST")
    val r2 = fmt match {
      case "csv" =>
        val q = quote.getOrElse("\"")
        r.option("quote", q)
          // PG csv: escape defaults to the QUOTE char (doubled quotes)
          .option("escape", escape.getOrElse(q))
          .option("nullValue", nullStr.getOrElse(""))
      case _ => // text: no quoting, backslash escapes, \N nulls
        r.option("quote", "\u0000")
          .option("escape", escape.getOrElse("\\"))
          .option("nullValue", nullStr.getOrElse("\\N"))
    }
    r2.csv(path)
  }

  /** The matching writer (for round-trip tests and COPY TO parity);
    * same option mapping as [[read]]. `encoding` is the server-side
    * encoding-conversion half (openGauss converts between client and
    * server encodings; the reference regresses it in
    * ts_gb18030_utf8.source) — any JVM charset, e.g. GB18030. */
  def write(df: DataFrame, path: String,
      format: String = "csv",
      header: Boolean = false,
      delimiter: Option[String] = None,
      quote: Option[String] = None,
      escape: Option[String] = None,
      nullStr: Option[String] = None,
      encoding: String = "UTF-8"): Unit = {
    val fmt = format.toLowerCase(java.util.Locale.ROOT)
    val sep = delimiter.getOrElse(if (fmt == "csv") "," else "\t")
    val q = quote.getOrElse("\"")
    enableCharset(df.sparkSession, encoding)
    val w = df.write.mode("overwrite")
      .option("sep", sep)
      .option("header", header)
      .option("encoding", encoding)
    val w2 = fmt match {
      case "csv" => w.option("quote", q)
        .option("escape", escape.getOrElse(q))
        .option("nullValue", nullStr.getOrElse(""))
      case _ => w.option("quote", "\u0000")
        .option("escape", escape.getOrElse("\\"))
        .option("nullValue", nullStr.getOrElse("\\N"))
    }
    w2.csv(path)
  }
}
