package graft

import graft.operators.SparseAnn
import org.apache.spark.sql.functions._

class SparseAnnSpec extends SparkSpec {
  import spark.implicits._

  private def sparsified = {
    def entries(c: org.apache.spark.sql.Column) =
      filter(transform(c, (x, i) => struct(i.as("i"), x.as("v"))),
        e => abs(e.getField("v")) > 0.1f)
    spark.read.parquet(s"$sfDir/embeddings.parquet")
      .withColumn("se", entries(col("embedding")))
      .select(col("vec_id"),
        transform(col("se"), e => e.getField("i")).as("sidx"),
        transform(col("se"), e => e.getField("v")).as("sval"))
  }

  test("postings top-k equals dense brute force on identical quantization") {
    val sp = sparsified.cache()
    try {
      val qs = sp.filter(col("vec_id") < 5)
      val got = SparseAnn.topKInnerProduct(sp, "vec_id", "sidx", "sval",
          qs, "vec_id", "sidx", "sval", k = 8)
        .select($"qid", $"rank", $"id", $"n_common", $"score")
        .as[(Long, Int, Long, Long, Double)].collect().sortBy(r => (r._1, r._2))

      // dense brute force: same floor(v*1000) quantization, exact long
      // dot per pair, rank by (dot desc, id) among overlapping pairs
      val quant = sp.select(col("vec_id"), col("sidx"),
        transform(col("sval"), v => floor(v.cast("double") * 1000).cast("long"))
          .as("qv")).as[(Long, Seq[Int], Seq[Long])].collect()
      val qvecs = quant.filter(_._1 < 5)
      val expect = (for {
        (qid, qi, qv) <- qvecs
        qm = qi.zip(qv).toMap
        (id, ci, cv) <- quant
        prods = ci.zip(cv).flatMap { case (i, v) => qm.get(i).map(q => v * q) }
        if prods.nonEmpty
      } yield (qid, id, prods.sum, prods.length.toLong))
        .groupBy(_._1).toSeq.flatMap { case (qid, rows) =>
          rows.sortBy(r => (-r._3, r._2)).take(8).zipWithIndex.map {
            case ((_, id, dot, nc), i) =>
              (qid, i + 1, id, nc, dot.toDouble / 1e6)
          }
        }.sortBy(r => (r._1, r._2))
      assert(got.toSeq == expect)
      assert(got.nonEmpty && got.exists(r => r._1 == r._3 && r._2 == 1),
        "a query vector should retrieve itself at rank 1")
    } finally sp.unpersist()
  }
}
