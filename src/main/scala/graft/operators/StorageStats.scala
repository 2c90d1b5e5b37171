package graft.operators

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.column.statistics.{IntStatistics, LongStatistics, Statistics}
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Storage introspection over parquet footers — the lakehouse analogue
 * of contrib/pgstattuple (pgstattuple.cpp's page/tuple accounting) and
 * pg_buffercache's relation-level view: files, row groups, sizes, and
 * per-column statistics (null counts, min/max) as a queryable
 * relation, feeding the layout advisor's evidence (C-row "what-if").
 *
 * METADATA READS ONLY: each task opens footers (O(KB) per file), never
 * data pages — on a 100 TB table this scans megabytes. Distributed one
 * task per file via the Hadoop FileSystem API, so it works against any
 * store Spark can read.
 */
object StorageStats {

  /** One row per row group of each (table, path, keyColumn) spec:
    * rows, sizes, and the key column's footer statistics. */
  def rowGroups(spark: SparkSession,
      specs: Seq[(String, String, String)]): DataFrame = {
    import spark.implicits._
    // expand directories into files on the driver (cheap listing),
    // then fan the FOOTER reads out one task per file
    val conf = spark.sparkContext.hadoopConfiguration
    val files: Seq[(String, String, String)] = specs.flatMap {
      case (tbl, path, key) =>
        val p = new Path(path)
        val fs = p.getFileSystem(conf)
        val st = fs.getFileStatus(p)
        val leaves =
          if (st.isDirectory)
            fs.listStatus(p).toSeq.filter(s => s.isFile &&
              s.getPath.getName.endsWith(".parquet")).map(_.getPath.toString)
          else Seq(path)
        leaves.map(f => (tbl, f, key))
    }
    spark.createDataset(files)
      .repartition(math.max(files.size, 1))
      .mapPartitions { it =>
        val c = new Configuration()
        it.flatMap { case (tbl, file, key) =>
          val reader = ParquetFileReader.open(HadoopInputFile.fromPath(
            new Path(file), c))
          try {
            val md = reader.getFooter
            val blocks = md.getBlocks
            (0 until blocks.size()).map { i =>
              val b = blocks.get(i)
              var kMin = Long.MaxValue
              var kMax = Long.MinValue
              var kNulls = 0L
              var found = false
              val cols = b.getColumns
              var j = 0
              while (j < cols.size()) {
                val ch = cols.get(j)
                if (ch.getPath.toDotString == key) {
                  found = true
                  val st: Statistics[_] = ch.getStatistics
                  kNulls = st.getNumNulls
                  if (st.hasNonNullValue) st match {
                    case l: LongStatistics => kMin = l.getMin; kMax = l.getMax
                    case n: IntStatistics =>
                      kMin = n.getMin.toLong; kMax = n.getMax.toLong
                    case _ => ()
                  }
                }
                j += 1
              }
              require(found, s"graft: storage_stats: column $key not in $file")
              (tbl, file.substring(file.lastIndexOf('/') + 1), i,
                b.getRowCount, b.getTotalByteSize, b.getCompressedSize,
                kMin, kMax, kNulls)
            }
          } finally reader.close()
        }
      }
      .toDF("tbl", "file", "row_group", "rows", "total_byte_size",
        "compressed_size", "key_min", "key_max", "key_nulls")
  }

  /** Per-table rollup: row counts and key min/max/null-count — every
    * value recomputable by SQL over the data, which is the gate. */
  def tableStats(spark: SparkSession, dir: String,
      specs: Seq[(String, String)]): DataFrame =
    rowGroups(spark, specs.map { case (t, k) => (t, s"$dir/$t.parquet", k) })
      .groupBy(col("tbl"))
      .agg(sum(col("rows")).as("row_cnt"),
        min(col("key_min")).as("key_min"),
        max(col("key_max")).as("key_max"),
        sum(col("key_nulls")).as("key_nulls"),
        countDistinct(col("file")).as("n_files"),
        count(lit(1)).as("n_row_groups"))
}
