package graft

import graft.operators.SqlDiag
import org.apache.spark.sql.functions._

/**
 * sqldiag contracts beyond the driver gate (which pins the planted
 * history hash-exact vs DuckDB): template normalization corner cases,
 * the exact-vs-similar routing, and the deterministic argmax
 * tie-break.
 */
class SqlDiagSpec extends SparkSpec {
  import spark.implicits._

  private def norm(s: String): String =
    Seq(s).toDF("q").select(SqlDiag.normalize(col("q"))).collect()(0)
      .getString(0)

  test("normalization: literals, case, whitespace") {
    assert(norm("SELECT * FROM t WHERE a = 42") ==
      "select * from t where a = ?")
    assert(norm("select x from t where s = 'O''Brien'  AND  b < 3.25") ==
      "select x from t where s = ?? and b < ?") // '' splits the literal
    assert(norm("  UPDATE t SET c = 'note 7' WHERE k = 19 ") ==
      "update t set c = ? where k = ?")
    assert(norm("select\t*\nfrom t") == "select * from t")
  }

  test("train aggregates exact integer sums per template") {
    val h = Seq(
      ("SELECT * FROM t WHERE k = 1", 100L),
      ("SELECT * FROM t WHERE k = 2", 140L),
      ("DELETE FROM t WHERE k = 3", 1000L))
      .toDF("q", "d")
    val m = SqlDiag.train(h, "q", "d").orderBy("template").collect()
    assert(m.length == 2)
    assert(m(0).getAs[String]("template") == "delete from t where k = ?")
    assert(m(0).getAs[Long]("n_samples") == 1L &&
      m(0).getAs[Double]("avg_ms") == 1000.0)
    assert(m(1).getAs[Long]("n_samples") == 2L &&
      m(1).getAs[Double]("avg_ms") == 120.0)
  }

  test("predict routes exact hits to 'template' and unseen to 'similar'") {
    val h = Seq(
      ("SELECT * FROM orders WHERE o_orderkey = 5", 100L),
      ("SELECT count(*) FROM lineitem WHERE l_tax > 0.02", 900L))
      .toDF("q", "d")
    val model = SqlDiag.train(h, "q", "d")
    val probes = Seq(
      (1L, "SELECT * FROM orders WHERE o_orderkey = 99"),
      (2L, "SELECT * FROM orders WHERE o_orderkey = 7 AND o_orderstatus = 'F'"))
      .toDF("id", "q")
    val out = SqlDiag.predict(model, probes, "id", "q")
      .orderBy("id").collect()
    assert(out(0).getAs[String]("method") == "template")
    assert(out(0).getAs[Double]("pred_ms") == 100.0)
    assert(out(1).getAs[String]("method") == "similar")
    // the extended orders query is trigram-closest to the orders
    // template, not the lineitem one
    assert(out(1).getAs[String]("template") ==
      "select * from orders where o_orderkey = ?")
    assert(out(1).getAs[Double]("pred_ms") == 100.0)
  }

  test("similarity ties break to the lexicographically smaller template") {
    val h = Seq(("SELECT b FROM u", 10L), ("SELECT a FROM u", 20L))
      .toDF("q", "d")
    val model = SqlDiag.train(h, "q", "d")
    // 'select c from u' is equidistant from both templates (one
    // differing single-letter word each) — the tie must go to
    // 'select a from u' deterministically
    val probes = Seq((1L, "SELECT c FROM u")).toDF("id", "q")
    val out = SqlDiag.predict(model, probes, "id", "q").collect()
    assert(out(0).getAs[String]("template") == "select a from u")
    assert(out(0).getAs[Double]("pred_ms") == 20.0)
  }
}
