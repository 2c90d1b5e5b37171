package graft

import graft.operators.{LateInteraction, Lexize}
import org.apache.spark.sql.functions._

class LateInteractionSpec extends SparkSpec {
  import spark.implicits._

  test("driver-side embedLocal equals the Spark tokenEmbedding expression") {
    val toks = Seq("spark", "merge", "vector", "quick", "a", "zz9_x")
    val got = toks.toDF("tok")
      .select(col("tok"), LateInteraction.tokenEmbedding(col("tok")).as("e"))
      .as[(String, Seq[Int])].collect().toMap
    toks.foreach { t => assert(got(t) == LateInteraction.embedLocal(t), t) }
    // values stay in the documented [-4, 4] envelope
    assert(got.values.flatten.forall(v => v >= -4 && v <= 4))
  }

  test("maxsim equals the hand-computed max/sum over token dots") {
    val docs = Seq(
      (1L, "spark merge spark"),          // dup token — dedup must not change max
      (2L, "vector"),
      (3L, "table scan")).toDF("doc_id", "text")
    val q = Seq("spark", "vector")
    val got = LateInteraction.maxsim(docs, "doc_id", "text", q)
      .select("doc_id", "m_0", "m_1", "maxsim")
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3, r._4))).toMap

    def dot(a: Seq[Int], b: Seq[Int]) = a.zip(b).map { case (x, y) => x * y }.sum.toLong
    val qe = q.map(LateInteraction.embedLocal)
    def expect(tokens: Seq[String]) = {
      val te = tokens.distinct.map(LateInteraction.embedLocal)
      val ms = qe.map(qv => te.map(tv => dot(qv, tv)).max)
      (ms(0), ms(1), ms.sum)
    }
    assert(got(1L) == expect(Seq("spark", "merge", "spark")))
    assert(got(2L) == expect(Seq("vector")))
    assert(got(3L) == expect(Seq("table", "scan")))
    // self-match dominates: a doc containing the query token scores
    // that token's self dot (the max over its tokens is >= self-dot)
    val selfDot = dot(qe(0), qe(0))
    assert(got(1L)._1 == selfDot || got(1L)._1 > 0)
  }

  test("synonym canonicalization rewrites members, passes unknowns") {
    val dict = Map("fast" -> "speed", "quick" -> "speed", "tbl" -> "tabl0")
    val got = Seq(Seq("fast", "quick", "other", "tbl")).toDF("t")
      .select(Lexize.canonTokens(col("t"), dict).as("c"))
      .as[Seq[String]].head()
    assert(got == Seq("speed", "speed", "other", "tabl0"))
  }
}
