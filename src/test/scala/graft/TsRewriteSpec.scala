package graft

import graft.functions.Snowball
import graft.operators.{FullText, Lexize}
import org.apache.spark.sql.functions._

/**
 * ts_rewrite (tsquery_rewrite.c) and the language-pluggable Snowball
 * chain (dict_snowball.c): PG-documented rewrite shapes (modulo the
 * documented canonical-order departure) and the published Swedish
 * algorithm's outputs.
 */
class TsRewriteSpec extends SparkSpec {
  import spark.implicits._

  private def rw(q: String, t: String, s: String): String =
    FullText.tsRewriteText(q, t, s)

  test("PG doc example: ts_rewrite('a & b', 'a', 'foo|bar')") {
    // PG renders 'b & ( foo | bar )'; ours is the same tree in
    // canonical child order
    assert(rw("a & b", "a", "foo | bar") == "(b) & ((bar) | (foo))")
  }

  test("n-ary subset rewrite inside a larger group (findsubquery)") {
    assert(rw("a & b & c", "a & b", "x") == "(c) & (x)")
    // commutativity/associativity: target matches in any order/shape
    assert(rw("c & (b & a)", "a & b", "x") == "(c) & (x)")
    assert(rw("b & a", "a & b", "x") == "x")
    // OR groups too
    assert(rw("a | b | c", "b | c", "y") == "(a) | (y)")
  }

  test("rewrite under negation and phrase atomicity") {
    assert(rw("q & !slow", "slow", "slow | small") ==
      "(q) & (!((slow) | (small)))")
    // phrases are atomic: matched whole, never decomposed
    assert(rw("a <-> b & c", "a <-> b", "x") == "(c) & (x)")
    assert(rw("a <-> b & c", "a", "x") == "(a <-> b) & (c)")
  }

  test("self-referencing substitute converges (bounded fixpoint)") {
    assert(rw("a", "a", "a | b") == "(a) | (b)")
    // duplicates collapse (QTNUniq): a & a ≡ a
    assert(rw("a & a", "a", "z") == "z")
    // no occurrence → unchanged tree
    assert(rw("a & b", "zz", "x") == "(a) & (b)")
  }

  test("rewritten queries drive the match pipeline") {
    val docs = Seq((1L, "spark fast merge"), (2L, "spark join fast"),
      (3L, "slow join")).toDF("id", "text")
    val q = FullText.tsRewriteText("spark & merge", "merge", "merge | join")
    val hits = docs.filter(FullText.tsMatch(col("text"), q))
      .select("id").as[Long].collect().sorted.toSeq
    assert(hits == Seq(1L, 2L)) // doc 2 matches only via the rewrite
  }

  test("Swedish Snowball stemmer: algorithm-derived outputs") {
    val S = Snowball.SwedishStemmer
    val cases = Seq(
      "klokaste" -> "klok",          // step 1 'aste'
      "flickorna" -> "flick",        // step 1 'orna'
      "bilarna" -> "bil",            // step 1 'arna'
      "möjligheterna" -> "möj",      // 'heterna' then step 3 'lig'
      "häftigt" -> "häft",           // step 2 'gt' then step 3 'ig'
      "friskt" -> "frisk",           // step 2 'kt'
      "dagars" -> "dagar",           // s after valid s-ending 'r'
      "trötthet" -> "trött",         // 'het'; 'tt' NOT wholly in R1 → kept
      "löst" -> "löst",              // suffix outside R1 → untouched
      "meningslöst" -> "meningslös", // step 3 'löst' → 'lös'
      "beslutsfullt" -> "beslutsfull", // step 3 'fullt' → 'full'
      "bok" -> "bok")                // short word unchanged
    for ((in, want) <- cases)
      assert(S.stem(in) == want, s"stem($in): got ${S.stem(in)}, want $want")
  }

  test("dict_simple: stopword empties, accept passthrough, reject fall-through") {
    // dsimple_lexize's three outcomes (dict_simple.cpp:147-160)
    val stop = Set("the", "a")
    assert(Snowball.simpleLexize("The", stop) == Some(Seq.empty))  // stopword
    assert(Snowball.simpleLexize("", stop) == Some(Seq.empty))     // empty
    assert(Snowball.simpleLexize("Word", stop) == Some(Seq("word"))) // accept
    assert(Snowball.simpleLexize("Word", stop, accept = false).isEmpty) // fall through
    assert(Snowball.simpleLexize("the", stop, accept = false) == Some(Seq.empty))
  }

  test("the lexize chain is language-keyed") {
    val df = Seq("och flickorna läste den klokaste boken").toDF("text")
    val sv = df.select(Lexize.lexemes(col("text"), "swedish",
        stop = Seq("och", "den")).as("lex"))
      .selectExpr("transform(lex, x -> x.lex) AS l", "transform(lex, x -> x.pos) AS p")
      .head()
    assert(sv.getSeq[String](0) == Seq("flickorna", "läste", "klokaste", "boken")
      .map(Snowball.SwedishStemmer.stem))
    // stopwords consume positions (gaps preserved, the PG layout)
    assert(sv.getSeq[Int](1) == Seq(2, 3, 5, 6))
    // english routes to Porter; unknown languages fail loudly
    val en = Seq("running quickly").toDF("text")
      .select(Lexize.lexemes(col("text"), "english", Seq.empty).as("lex"))
      .selectExpr("transform(lex, x -> x.lex) AS l").head()
    assert(en.getSeq[String](0) == Seq("run", "quickli"))
    intercept[Exception] {
      Seq("x").toDF("text")
        .select(Lexize.lexemes(col("text"), "klingon", Seq.empty)).collect()
    }
  }
}
