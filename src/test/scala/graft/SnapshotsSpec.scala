package graft

import graft.operators.SnapshotStore
import org.apache.spark.sql.functions._

/**
 * DB4AI Snapshots contracts (reference semantics from
 * db4ai/snapshots/README.md + purge.sql): version-bump rules derived
 * from the actual change, CSS delta compactness, CSS == MSS read
 * parity, immutability of history, purge dependency guard, archived
 * refusal, deterministic sampling.
 */
class SnapshotsSpec extends SparkSpec {
  import spark.implicits._

  private def freshStore(): SnapshotStore = {
    val d = java.nio.file.Files.createTempDirectory("graft-snapspec-").toFile
    d.deleteOnExit()
    new SnapshotStore(spark, d.getAbsolutePath)
  }

  private def src = (0L until 100L).map(i => (i, s"t${i % 3}", i * 2.0))
    .toDF("pk", "tag", "v")

  test("version bumps: update→patch, insert/delete→minor, schema→major") {
    val st = freshStore()
    st.create("m0", src, "pk")
    val patch = st.derive("m0", "1.0.0", css = true)(
      _.selectExpr("pk", "tag", "CASE WHEN pk % 10 = 0 THEN v + 1e0 ELSE v END AS v"))
    assert(patch.version === "1.0.1")
    val minor = st.derive("m0", "1.0.1", css = true)(_.filter("pk % 7 <> 0"))
    assert(minor.version === "1.1.0")
    val major = st.derive("m0", "1.1.0")(_.withColumn("extra", lit(1)))
    assert(major.version === "2.0.0")
    assert(major.storage === "full") // schema change always materializes
  }

  test("CSS stores only the changed keys; read reconstructs exactly") {
    val d = java.nio.file.Files.createTempDirectory("graft-snapspec-").toFile
    d.deleteOnExit()
    val st = new SnapshotStore(spark, d.getAbsolutePath)
    st.create("m0", src, "pk")
    val xform = (df: org.apache.spark.sql.DataFrame) =>
      df.selectExpr("pk", "tag",
        "CASE WHEN pk % 10 = 0 THEN v + 1e0 ELSE v END AS v")
    val m = st.derive("m0", "1.0.0", css = true)(xform)
    assert(m.storage === "delta" && m.rowCount === 100L)
    // the stored parquet holds the 10 touched keys, not the 100 rows
    val stored = spark.read.parquet(s"${d.getAbsolutePath}/m0@1.0.1")
    assert(stored.count() === 10L)
    assert(stored.columns.contains("op2"))
    // CSS reconstruction == the transform applied directly (MSS parity)
    val got = st.read("m0", "1.0.1").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    val want = xform(src).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(got === want)
  }

  test("purge refuses while dependents exist, succeeds leaf-first") {
    val st = freshStore()
    st.create("m0", src, "pk")
    st.derive("m0", "1.0.0", css = true)(_.filter("pk < 50"))
    val e = intercept[IllegalArgumentException] { st.purge("m0", "1.0.0") }
    assert(e.getMessage.contains("dependent"))
    st.purge("m0", "1.1.0")
    st.purge("m0", "1.0.0")
    assert(st.catalog.count() === 0L)
  }

  test("archived snapshots refuse derivation; publish flips back") {
    val st = freshStore()
    st.create("m0", src, "pk")
    st.archive("m0", "1.0.0")
    intercept[IllegalArgumentException] {
      st.derive("m0", "1.0.0")(identity)
    }
    st.publish("m0", "1.0.0")
    assert(st.derive("m0", "1.0.0")(_.filter("pk < 10")).version === "1.1.0")
  }

  test("sampling: deterministic children, row counts in catalog, lineage") {
    val st = freshStore()
    st.create("m0", src, "pk")
    val kids = st.sample("m0", "1.0.0", Seq("_train", "_test"), Seq(0.8, 0.2))
    assert(kids.map(_.version) === Seq("1.0.0_train", "1.0.0_test"))
    val train = st.read("m0", "1.0.0_train")
    // deterministic: re-deriving the same hash filter yields the same set
    val again = graft.operators.Sampling.hashFraction(src, "pk", 0.8)
    assert(train.collect().map(_.getLong(0)).sorted.toSeq ===
      again.collect().map(_.getLong(0)).sorted.toSeq)
    intercept[IllegalArgumentException] {
      st.sample("m0", "1.0.0", Seq("_x"), Seq(0.5, 0.5))
    }
    val lin = st.lineage("m0", "1.0.0_train").collect()
    assert(lin.map(_.getAs[String]("version")).toSeq ===
      Seq("1.0.0", "1.0.0_train"))
  }
}
