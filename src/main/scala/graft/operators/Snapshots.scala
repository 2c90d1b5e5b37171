package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * DB4AI Snapshots — relational dataset versioning (reference:
 * src/gausskernel/dbmind/db4ai/snapshots/README.md, schema.sql
 * (catalog: id/parent_id/root_id/name/commands/published/archived/
 * row_count), create.sql, prepare.sql, sample.sql, purge.sql).
 * Immutable versioned training datasets: every change creates a NEW
 * version; the catalog documents lineage; CSS mode stores derived
 * versions as deltas against their parent; PURGE refuses while
 * dependents exist.
 *
 * Spark shape: snapshot data lives as parquet under one base path,
 * the catalog is k rows of driver-side metadata persisted alongside.
 * CSS deltas REUSE the engine's own change algebra: a derived version
 * stores only `Flashback.restoreDelta(parent, child)` (changed keys,
 * not the table), and reads reconstruct by `Upsert.merge`/`delete`
 * over the parent — at 100 TB a data-cleaning step that touches 0.1%
 * of rows stores 0.1%, while MSS mode trades storage for zero-join
 * reads. Version numbers follow the reference's documented rule:
 * schema change → major, insert/delete revision → minor, update-only
 * patch → patch.
 *
 * Reproducibility: the catalog carries no wall-clock timestamps (the
 * reference stamps `created`; a deterministic engine leaves
 * provenance timestamps to the writer's environment) and sampling is
 * the deterministic Knuth-mix hash filter ([[Sampling.hashFraction]]),
 * so any snapshot tree rebuilds bit-identically.
 */
object Snapshots {
  final case class Meta(id: Long, parentId: Option[Long], rootId: Long,
      name: String, version: String, mode: String, storage: String,
      keyCol: String, command: String, published: Boolean,
      archived: Boolean, rowCount: Long) {
    def fullName = s"$name@$version"
  }
}

class SnapshotStore(spark: SparkSession, base: String) {
  import Snapshots.Meta

  private def fs = org.apache.hadoop.fs.FileSystem
    .get(new java.net.URI(base), spark.sparkContext.hadoopConfiguration)
  private def catalogPath = s"$base/_catalog"
  private def dataPath(m: Meta) = s"$base/${m.fullName}"

  /** Count the rows of a written parquet dir from its FOOTERS — a
    * driver-side metadata read, zero Spark jobs (the old
    * `spark.read.parquet(tmp).count()` paid a scheduling round-trip
    * per snapshot version; a 5-version gate ran 5 count jobs). */
  private def footerCount(dir: String): Long = {
    val conf = spark.sparkContext.hadoopConfiguration
    val d = new org.apache.hadoop.fs.Path(dir)
    fs.listStatus(d).iterator
      .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
      .map { st =>
        val in = org.apache.parquet.hadoop.ParquetFileReader.open(
          org.apache.parquet.hadoop.util.HadoopInputFile
            .fromStatus(st, conf))
        try in.getRecordCount finally in.close()
      }.sum
  }

  /** Materialize a version with ONE evaluation of its DAG: write to an
    * id-keyed temp dir, take the row count from the written parquet's
    * own footers (a metadata read — no data scan), then RENAME the dir
    * onto the final name@version path (a filesystem metadata op). The
    * old count-then-write order evaluated every snapshot DAG twice. */
  private def writeCounted(df: DataFrame, id: Long, finalPath: String): Long = {
    val tmp = s"$base/.tmp-$id"
    df.write.mode("overwrite").parquet(tmp)
    val n = footerCount(tmp)
    val dst = new org.apache.hadoop.fs.Path(finalPath)
    require(!fs.exists(dst), s"graft: snapshot path exists: $finalPath")
    require(fs.rename(new org.apache.hadoop.fs.Path(tmp), dst),
      s"graft: could not move snapshot into place: $finalPath")
    n
  }

  /** The snapshot catalog (db4ai.snapshot's Spark shape). */
  def catalog: DataFrame = {
    import spark.implicits._
    metas.map(m => (m.id, m.parentId, m.rootId, m.name, m.version, m.mode,
      m.storage, m.keyCol, m.command, m.published, m.archived, m.rowCount))
      .toDF("id", "parent_id", "root_id", "name", "version", "mode",
        "storage", "key_col", "command", "published", "archived", "row_count")
  }

  /** Catalog rows, cached per store instance (write-through): the
    * persisted parquet stays the durable source — a FRESH store over
    * an existing base loads it once — but the k-row catalog is not
    * re-read (listing + footer + a 1-task collect job) on every
    * find/derive/read; a 3-derivation tree was paying ~10 such
    * round-trips. Every mutation goes through [[saveMetas]], which
    * persists first and updates the cache after.
    *
    * SINGLE-WRITER ASSUMPTION: a store instance never sees catalog
    * mutations made through ANOTHER instance (or process) over the
    * same base path after its first read — construct a fresh
    * SnapshotStore to pick up external changes (the reference's
    * snapshot catalog is likewise session-scoped state). */
  private var metasCache: Option[Seq[Meta]] = None

  private def metas: Seq[Meta] = metasCache.getOrElse {
    val loaded =
      if (!fs.exists(new org.apache.hadoop.fs.Path(catalogPath))) Seq.empty
      else {
        import spark.implicits._
        // schema from the encoder: skips the footer-inference pass
        spark.read.schema(implicitly[org.apache.spark.sql.Encoder[Meta]].schema)
          .parquet(catalogPath).as[Meta].collect().toSeq.sortBy(_.id)
      }
    metasCache = Some(loaded)
    loaded
  }

  private def saveMetas(ms: Seq[Meta]): Unit = {
    import spark.implicits._
    ms.toDF().coalesce(1).write.mode("overwrite").parquet(catalogPath)
    metasCache = Some(ms.sortBy(_.id))
  }

  private def find(name: String, version: String): Meta =
    metas.find(m => m.name == name && m.version == version).getOrElse(
      throw new IllegalArgumentException(
        s"graft: no snapshot '$name@$version'"))

  /** CREATE SNAPSHOT name AS <df> → name@1.0.0 (materialized root). */
  def create(name: String, df: DataFrame, keyCol: String,
      command: String = "CREATE SNAPSHOT"): Meta = {
    require(df.columns.contains(keyCol), s"graft: no key column '$keyCol'")
    val ms = metas
    require(!ms.exists(_.name == name), s"graft: snapshot '$name' exists")
    val id = ms.map(_.id).maxOption.getOrElse(0L) + 1
    val m0 = Meta(id, None, id, name, "1.0.0", "MSS", "full", keyCol,
      command, published = false, archived = false, rowCount = -1L)
    val m = m0.copy(rowCount = writeCounted(df, id, dataPath(m0)))
    saveMetas(ms :+ m)
    m
  }

  private def bump(v: String, kind: Int): String = {
    val Array(ma, mi, pa) = v.split("\\.", 3).map(_.toLong)
    kind match {
      case 0 => s"${ma + 1}.0.0"      // schema revision
      case 1 => s"$ma.${mi + 1}.0"    // data revision (insert/delete)
      case _ => s"$ma.$mi.${pa + 1}"  // patch (update only)
    }
  }

  /**
   * CREATE SNAPSHOT name FROM @version USING (<transform>): the new
   * version number is DERIVED from what actually changed (schema →
   * major / inserts-or-deletes → minor / updates only → patch). In
   * CSS mode only the compensation delta is stored — a schema-change
   * derivation always materializes (no common key space to delta on).
   */
  def derive(name: String, fromVersion: String,
      command: String = "UPDATE SNAPSHOT", css: Boolean = false)
      (transform: DataFrame => DataFrame): Meta = {
    val parent = find(name, fromVersion)
    require(!parent.archived, s"graft: '$name@$fromVersion' is archived")
    val pdf = read(name, fromVersion)
    val child = transform(pdf)
    val ms = metas
    val id = ms.map(_.id).maxOption.getOrElse(0L) + 1
    val sameSchema = child.schema.map(f => (f.name, f.dataType)) ==
      pdf.schema.map(f => (f.name, f.dataType))
    val m =
      if (!sameSchema) {
        val m0 = Meta(id, Some(parent.id), parent.rootId, name,
          bump(fromVersion, 0), if (css) "CSS" else "MSS", "full",
          parent.keyCol, command, false, false, rowCount = -1L)
        m0.copy(rowCount = writeCounted(child, id, dataPath(m0)))
      } else {
        val cols = pdf.columns
        // MSS materializes the child ONCE and derives the delta from
        // the written copy (a cheap re-scan, not a re-run of the
        // transform); CSS writes the delta PARTITIONED BY op2 so the
        // per-op counts come straight from the written parquet's
        // footers (zero Spark jobs — the old groupBy(op2).collect paid
        // a scheduling round-trip per derivation) and every later
        // delta read prunes to the ops it needs (reconstruction reads
        // I/U and D from disjoint directories)
        val tmp = s"$base/.tmp-$id"
        val counts: Map[String, Long] =
          if (css) {
            val d = Flashback.restoreDelta(
              pdf.select(cols.map(col): _*), child.select(cols.map(col): _*),
              parent.keyCol)
            d.write.mode("overwrite").partitionBy("op2").parquet(tmp)
            Seq("I", "D", "U").map { op =>
              val p = new org.apache.hadoop.fs.Path(s"$tmp/op2=$op")
              op -> (if (fs.exists(p)) footerCount(p.toString) else 0L)
            }.toMap
          } else {
            child.write.mode("overwrite").parquet(tmp)
            val childW = spark.read.schema(child.schema).parquet(tmp)
            Flashback.restoreDelta(pdf.select(cols.map(col): _*),
                childW.select(cols.map(col): _*), parent.keyCol)
              .groupBy("op2").count().collect()
              .map(r => r.getString(0) -> r.getLong(1)).toMap
          }
        val kind = if (counts.getOrElse("I", 0L) + counts.getOrElse("D", 0L) > 0) 1 else 2
        val m0 = Meta(id, Some(parent.id), parent.rootId, name,
          bump(fromVersion, kind), if (css) "CSS" else "MSS",
          if (css) "delta" else "full", parent.keyCol, command,
          false, false,
          parent.rowCount + counts.getOrElse("I", 0L) - counts.getOrElse("D", 0L))
        val dst = new org.apache.hadoop.fs.Path(dataPath(m0))
        require(!fs.exists(dst), s"graft: snapshot path exists: ${dataPath(m0)}")
        require(fs.rename(new org.apache.hadoop.fs.Path(tmp), dst),
          s"graft: could not move snapshot into place: ${dataPath(m0)}")
        m0
      }
    saveMetas(ms :+ m)
    m
  }

  /** Read `name@version` — full storage scans directly; delta storage
    * reconstructs parent + compensation (driver walks the k-row
    * catalog chain; each step is one distributed merge). */
  def read(name: String, version: String): DataFrame = {
    val m = find(name, version)
    if (m.storage == "full") spark.read.parquet(dataPath(m))
    else {
      val parent = metas.find(_.id == m.parentId.get).get
      val pdf = read(parent.name, parent.version)
      val cols = pdf.columns
      // deltas are op2-partitioned: read with the known schema (delta
      // columns + the op2 partition column — no footer inference, and
      // an all-empty delta still reads) and let the op2 filters prune
      // to their directories
      val deltaSchema = org.apache.spark.sql.types.StructType(
        pdf.schema.fields :+ org.apache.spark.sql.types.StructField(
          "op2", org.apache.spark.sql.types.StringType))
      val raw = spark.read.schema(deltaSchema).parquet(dataPath(m))
      val ups = raw.filter(col("op2") =!= "D").select(cols.map(col): _*)
      val dels = raw.filter(col("op2") === "D").select(col(m.keyCol))
      Upsert.delete(Upsert.merge(pdf, ups, m.keyCol), dels, m.keyCol)
    }
  }

  /** SAMPLE SNAPSHOT (sample.sql): children `name@<version><infix>`,
    * one per ratio, drawn by the deterministic hash filter — always
    * materialized (a sample is smaller than its delta). */
  def sample(name: String, version: String,
      infixes: Seq[String], ratios: Seq[Double]): Seq[Meta] = {
    require(infixes.length == ratios.length,
      "graft: infixes and ratios length mismatch") // sample.sql:129
    val parent = find(name, version)
    val pdf = read(name, version)
    infixes.zip(ratios).map { case (infix, ratio) =>
      val ms = metas
      val id = ms.map(_.id).maxOption.getOrElse(0L) + 1
      val sampled = Sampling.hashFraction(pdf, parent.keyCol, ratio)
      val m0 = Meta(id, Some(parent.id), parent.rootId, name,
        s"$version$infix", parent.mode, "full", parent.keyCol,
        s"SAMPLE SNAPSHOT ratio=$ratio", false, false, rowCount = -1L)
      val m = m0.copy(rowCount = writeCounted(sampled, id, dataPath(m0)))
      saveMetas(ms :+ m)
      m
    }
  }

  /** PUBLISH / ARCHIVE SNAPSHOT: catalog state flips (archived
    * snapshots refuse further derivation, like prepare.sql). */
  def publish(name: String, version: String): Unit = setFlags(name, version,
    m => m.copy(published = true, archived = false))
  def archive(name: String, version: String): Unit = setFlags(name, version,
    m => m.copy(archived = true, published = false))

  private def setFlags(name: String, version: String, f: Meta => Meta): Unit = {
    find(name, version)
    saveMetas(metas.map(m =>
      if (m.name == name && m.version == version) f(m) else m))
  }

  /** PURGE SNAPSHOT: refuses while dependents exist (purge.sql:78 —
    * "purge all dependent snapshots first"), then drops data+catalog. */
  def purge(name: String, version: String): Unit = {
    val m = find(name, version)
    val ms = metas
    require(!ms.exists(_.parentId.contains(m.id)),
      s"graft: cannot purge '${m.fullName}' having dependent snapshots")
    fs.delete(new org.apache.hadoop.fs.Path(dataPath(m)), true)
    saveMetas(ms.filterNot(x => x.id == m.id))
  }

  /** Lineage: the ancestor chain root → this, one row per hop — the
    * catalog's `commands` provenance documentation. */
  def lineage(name: String, version: String): DataFrame = {
    val all = metas
    val chain = Iterator.iterate(Option(find(name, version))) {
      case Some(m) => m.parentId.flatMap(p => all.find(_.id == p))
      case None => None
    }.takeWhile(_.isDefined).map(_.get).toSeq.reverse
    import spark.implicits._
    chain.zipWithIndex
      .map { case (m, depth) =>
        (depth, m.name, m.version, m.mode, m.storage, m.command, m.rowCount) }
      .toDF("depth", "name", "version", "mode", "storage", "command",
        "row_count")
  }
}
