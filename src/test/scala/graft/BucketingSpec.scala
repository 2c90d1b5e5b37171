package graft

import graft.operators.Bucketing
import org.apache.spark.sql.functions._

class BucketingSpec extends SparkSpec {

  test("same-bucketed fact tables sort-merge-join with zero exchanges") {
    val li = Tables(spark, sfDir, "lineitem")
    val ord = Tables(spark, sfDir, "orders")
    Bucketing.writeBucketed(li.select("l_orderkey", "l_quantity", "l_extendedprice"),
      "li_bkt", "l_orderkey", 8)
    Bucketing.writeBucketed(ord.select("o_orderkey", "o_totalprice"),
      "ord_bkt", "o_orderkey", 8)

    // at test scale the planner would broadcast; force the SMJ path the
    // bucketing exists for (at 100 TB neither side broadcasts)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val plan =
      try Bucketing.colocatedJoin(spark, "li_bkt", "ord_bkt",
        "l_orderkey", "o_orderkey").queryExecution.executedPlan.toString
      finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert(plan.contains("SortMergeJoin"))
    assert(!plan.contains("Exchange"), s"unexpected shuffle in:\n$plan")

    // and it computes the right thing
    val got = Bucketing.colocatedJoin(spark, "li_bkt", "ord_bkt",
      "l_orderkey", "o_orderkey").agg(count(lit(1))).head().getLong(0)
    val expect = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .agg(count(lit(1))).head().getLong(0)
    assert(got == expect)
  }
}
