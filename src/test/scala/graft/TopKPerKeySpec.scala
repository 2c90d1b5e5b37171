package graft

import graft.functions.SqlFunctions
import graft.plans.TopKPerKey
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class TopKPerKeySpec extends SparkSpec {
  import spark.implicits._

  private lazy val orders = Tables(spark, sfDir, "orders").cache()

  test("custom TopKPerKeyExec equals window row_number") {
    // compound order value: unique per row -> deterministic top-k
    val df = orders.withColumn("ordv",
      col("o_totalprice") * 1e6 - col("o_orderkey"))
    val viaCustom = TopKPerKey.perKey(df, Seq("o_custkey"), "ordv", 3, desc = true)
      .select("o_custkey", "o_orderkey").as[(Long, Long)].collect().toSet
    val w = Window.partitionBy($"o_custkey")
      .orderBy($"o_totalprice".desc, $"o_orderkey")
    val viaWindow = orders.withColumn("rk", row_number().over(w))
      .filter($"rk" <= 3)
      .select("o_custkey", "o_orderkey").as[(Long, Long)].collect().toSet
    assert(viaCustom == viaWindow)
  }

  test("custom plan shuffles once and never sorts") {
    val df = orders.withColumn("ordv", col("o_totalprice") * 1e6 - col("o_orderkey"))
    val plan = TopKPerKey.perKey(df, Seq("o_custkey"), "ordv", 3, desc = true)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey"))
    assert(!plan.contains("Sort "), s"unexpected sort in:\n$plan")
    assert("Exchange".r.findAllIn(plan).length == 1, plan)
  }

  test("SQL-registered vector functions work in spark.sql") {
    SqlFunctions.register(spark)
    Tables(spark, sfDir, "embeddings").createOrReplaceTempView("emb_sql")
    val r = spark.sql(
      """SELECT e.vec_id,
        |  l2_distance(e.embedding, q.embedding) AS d,
        |  round(vector_norm(e.embedding), 6) AS nrm,
        |  hamming_distance(binary_quantize(e.embedding), binary_quantize(q.embedding)) AS h
        |FROM emb_sql e, (SELECT embedding FROM emb_sql WHERE vec_id = 0) q
        |ORDER BY d, vec_id LIMIT 5""".stripMargin).collect()
    assert(r.length == 5)
    assert(r.head.getLong(0) == 0L && r.head.getDouble(1) == 0.0)
    assert(r.forall(_.getDouble(2) > 0))
  }
}
