package graft

import graft.operators.Ltree
import org.apache.spark.sql.functions._

/**
 * ltree semantics pinned against contrib/ltree's documented behavior
 * (ltree_op.cpp, lquery_op.cpp): nlevel/subpath/subltree/index on the
 * PG docs' own examples, lca's strictly-proper-ancestor cap
 * (lca_inner caps at numlevel-1 of every input), and lquery matching
 * incl. `*{n,m}` bounds, alternation, and `!` negation.
 */
class LtreeSpec extends SparkSpec {
  import spark.implicits._

  private def one[T](c: org.apache.spark.sql.Column): T =
    Seq(1).toDF("x").select(c.as("r")).collect().head.getAs[T]("r")

  test("nlevel / subpath / subltree match PG docs examples") {
    assert(one[Int](Ltree.nlevel(lit("Top.Child1.Child2"))) == 3)
    // subltree('Top.Child1.Child2',1,2) = 'Child1'
    assert(one[String](Ltree.subltree(lit("Top.Child1.Child2"), 1, 2)) == "Child1")
    // subpath('Top.Child1.Child2',0,2) = 'Top.Child1'
    assert(one[String](Ltree.subpath(lit("Top.Child1.Child2"), 0, 2)) == "Top.Child1")
    assert(one[String](Ltree.subpath(lit("Top.Child1.Child2"), 1, 2)) == "Child1.Child2")
  }

  test("index finds label-aligned subpaths only") {
    // index('0.1.2.3.5.4.5.6.8.5.6.8','5.6') = 6 (PG docs)
    assert(one[Int](Ltree.ltreeIndex(lit("0.1.2.3.5.4.5.6.8.5.6.8"), lit("5.6"))) == 6)
    assert(one[Int](Ltree.ltreeIndex(lit("a.b.c"), lit("b"))) == 1)
    assert(one[Int](Ltree.ltreeIndex(lit("a.b.c"), lit("z"))) == -1)
    // 'b.c' present, 'bb.c' label-boundary miss
    assert(one[Int](Ltree.ltreeIndex(lit("a.bb.c"), lit("b"))) == -1)
    assert(one[Int](Ltree.ltreeIndex(lit("a.b.c"), lit("a.b.c"))) == 0)
  }

  test("isAncestor is ancestor-or-equal with label boundaries") {
    assert(one[Boolean](Ltree.isAncestor(lit("a.b"), lit("a.b.c"))))
    assert(one[Boolean](Ltree.isAncestor(lit("a.b"), lit("a.b"))))
    assert(!one[Boolean](Ltree.isAncestor(lit("a.b"), lit("a.bb.c"))))
    assert(!one[Boolean](Ltree.isAncestor(lit("a.b.c"), lit("a.b"))))
  }

  test("lquery: wildcards, bounds, alternation, negation") {
    def m(p: String, q: String): Boolean =
      one[Boolean](Ltree.lqueryMatch(lit(p), q))
    assert(m("Top.Science.Astronomy", "Top.*"))
    assert(m("Top.Science.Astronomy", "*.Astronomy"))
    assert(m("Top.Science.Astronomy", "Top.*{1}.Astronomy"))
    assert(!m("Top.Science.Astronomy", "Top.*{2}.Astronomy"))
    assert(m("Top.Science.Astronomy", "Top.*{0,2}.Astronomy"))
    assert(m("Top.Science.Astronomy", "Top.Science|Arts.*"))
    assert(m("Top.Arts.Astronomy", "Top.Science|Arts.*"))
    assert(!m("Top.Hobby.Astronomy", "Top.Science|Arts.*"))
    assert(m("Top.Hobby.Astronomy", "Top.!Science.*"))
    assert(!m("Top.Science.Astronomy", "Top.!Science.*"))
    assert(m("a.b.c.d", "a.*{2,}.d"))
    assert(!m("a.b.d", "a.*{2,}.d"))
  }

  test("lquery modifiers: @ case-insensitive, * prefix, % word match") {
    def m(p: String, q: String): Boolean =
      one[Boolean](Ltree.lqueryMatch(lit(p), q))
    // PG docs: 'sCiEnCeS@' matches 'sciences'
    assert(m("Top.sciences.astronomy", "Top.sCiEnCeS@.*"))
    assert(!m("Top.sciences.astronomy", "Top.sCiEnCeS.*"))
    // prefix: 'astr*' matches 'astronomy'
    assert(m("Top.sciences.astronomy", "Top.*.astr*"))
    assert(!m("Top.sciences.astronomy", "Top.*.astrx*"))
    // word match on underscore-separated words
    assert(m("Top.big_data_eng.x", "Top.data%.*"))
    assert(m("Top.data_eng.x", "Top.data%.*"))
    assert(!m("Top.metadata_eng.x", "Top.data%.*"))
    // flags compose: case-insensitive prefix
    assert(m("Top.sciences.astronomy", "Top.SCI*@.*"))
    // modifiers inside alternation
    assert(m("Top.arts.x", "Top.sci*|arts.*"))
  }

  test("lcaAgg: min/max prefix trick + strictly-proper cap") {
    val df = Seq("1.2.3", "1.2.4", "1.2.5.6").toDF("p")
    assert(df.agg(Ltree.lcaAgg(col("p")).as("l")).as[String].head() == "1.2")
    // identical paths: lca is the path minus its last label (cap)
    val same = Seq("1.2.3", "1.2.3").toDF("p")
    assert(same.agg(Ltree.lcaAgg(col("p")).as("l")).as[String].head() == "1.2")
    // single path behaves the same
    val single = Seq("1.2.3").toDF("p")
    assert(single.agg(Ltree.lcaAgg(col("p")).as("l")).as[String].head() == "1.2")
    // divergence at the first label → empty lca
    val div = Seq("1.2", "7.8").toDF("p")
    assert(div.agg(Ltree.lcaAgg(col("p")).as("l")).as[String].head() == "")
    // multi-digit labels: label order, not char order ('n10' vs 'n2')
    val dig = Seq("a.n10.x", "a.n2.y").toDF("p")
    assert(dig.agg(Ltree.lcaAgg(col("p")).as("l")).as[String].head() == "a")
  }

  test("ltxtquery: boolean word search over labels with precedence") {
    def m(p: String, q: String): Boolean =
      one[Boolean](Ltree.ltxtMatch(lit(p), q))
    assert(m("Top.Science.Astronomy", "Science"))
    assert(!m("Top.Science.Astronomy", "Hobby"))
    assert(m("Top.Science.Astronomy", "Science & Astronomy"))
    assert(!m("Top.Science.Astronomy", "Science & Hobby"))
    assert(m("Top.Science.Astronomy", "Hobby | Astronomy"))
    assert(m("Top.Science.Astronomy", "!Hobby"))
    assert(!m("Top.Science.Astronomy", "!Science"))
    // '|' is lowest precedence: a | b & c  ==  a | (b & c)
    assert(m("Top.Science.Astronomy", "Hobby | Science & Astronomy"))
    assert(!m("Top.Arts.Astronomy", "Hobby | Science & Astronomy"))
    // parens override
    assert(m("Top.Arts.Astronomy", "(Hobby | Arts) & Astronomy"))
    // '!' binds tightest: !a & b
    assert(m("Top.Arts.Astronomy", "!Science & Astronomy"))
  }

  test("ancestorJoin equals the LIKE-predicate semantics") {
    val rows = Seq("top.a.x", "top.a.y", "top.b.z", "top.a", "other.a.q")
      .toDF("path")
    val roots = Seq("top.a", "other").toDF("root")
    val got = Ltree.ancestorJoin(rows, "path", roots, "root")
      .select("path", "root").as[(String, String)].collect().toSet
    val want = Set(("top.a.x", "top.a"), ("top.a.y", "top.a"),
      ("top.a", "top.a"), ("other.a.q", "other"))
    assert(got == want)
  }
}
