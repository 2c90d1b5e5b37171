package graft

import graft.operators.FullText
import org.apache.spark.sql.functions._

class FullTextSpec extends SparkSpec {
  import spark.implicits._

  private def matches(query: String, texts: String*): Seq[Boolean] =
    texts.toSeq.toDF("text")
      .select(FullText.tsMatch(col("text"), query).as("m"))
      .as[Boolean].collect().toSeq

  test("single-term membership, case-insensitive, whole-token only") {
    assert(matches("spark", "a Spark row", "sparkle row", "row a") ==
      Seq(true, false, false))
  }

  test("phrase <-> requires adjacency in order") {
    assert(matches("spark <-> key",
      "a spark key b", "key spark a", "spark a key", "spark key") ==
      Seq(true, false, false, true))
  }

  test("three-term phrase chains adjacency") {
    assert(matches("a <-> b <-> c", "x a b c y", "a b x c", "b c a") ==
      Seq(true, false, false))
  }

  test("<N> followed-by matches at exactly distance N") {
    assert(matches("a <2> b", "a x b", "a b", "a x x b", "b x a") ==
      Seq(true, false, false, false))
    // chain mixing <-> and <N>: positions p, p+1, p+3
    assert(matches("a <-> b <2> c", "a b x c", "a b c", "a x b c") ==
      Seq(true, false, false))
    // <1> is exactly <->
    assert(matches("a <1> b", "a b c", "a x b") == Seq(true, false))
    intercept[IllegalArgumentException](FullText.parseQuery("a <0> b"))
    intercept[IllegalArgumentException](FullText.parseQuery("a <x> b"))
    intercept[IllegalArgumentException](FullText.parseQuery("a <2 b"))
  }

  test("boolean operators and precedence: ! binds tighter than & than |") {
    // a | b & !c  ==  a | (b & (!c))
    assert(matches("a | b & !c", "a c", "b", "b c", "x") ==
      Seq(true, true, false, false))
    // parens override
    assert(matches("(a | b) & !c", "a c", "b", "a x") ==
      Seq(false, true, true))
  }

  test("matches the gate's compound query on a crafted corpus") {
    val q = "(spark <-> key | dup) & !(slow <-> query)"
    assert(matches(q,
      "spark key here",        // phrase hit
      "a dup doc",             // term hit
      "spark key slow query",  // hit negated away
      "key spark dup",         // dup hit (phrase reversed)
      "slow query only") ==
      Seq(true, true, false, true, false))
  }

  test("positiveTerms collects non-negated terms in tree order") {
    assert(FullText.positiveTerms("(spark <-> key | dup) & !(slow <-> query)")
      == Seq("spark", "key", "dup"))
    assert(FullText.positiveTerms("!a & b") == Seq("b"))
    // double negation flips back to positive
    assert(FullText.positiveTerms("!(!a)") == Seq("a"))
  }

  test("headline: window around the first positive-term hit, clamped, null on miss") {
    def snip(query: String, texts: String*): Seq[String] =
      texts.toSeq.toDF("text")
        .select(FullText.headline(col("text"), query, window = 2).as("s"))
        .as[String].collect().toSeq
    assert(snip("c | d", "x y c z w q") == Seq("x y c z w"))
    // clamp at doc start; earliest hit across terms wins
    assert(snip("c | a", "a b c d e") == Seq("a b c"))
    // no positive term -> null
    assert(snip("zzz", "a b c") == Seq(null))
    // negated terms don't anchor the snippet
    assert(snip("c & !a", "a b c d e f") == Seq("a b c d e"))
  }

  test("plainQuery ANDs free-text tokens") {
    assert(FullText.plainQuery("Fast Spark join") == "fast & spark & join")
    assert(matches(FullText.plainQuery("spark key"),
      "key x spark", "spark only") == Seq(true, false))
    intercept[IllegalArgumentException](FullText.plainQuery("   "))
  }

  test("malformed queries fail loudly") {
    intercept[IllegalArgumentException](FullText.parseQuery("a &"))
    intercept[IllegalArgumentException](FullText.parseQuery("(a | b"))
    intercept[IllegalArgumentException](FullText.parseQuery("a <->"))
    intercept[IllegalArgumentException](FullText.parseQuery(""))
    intercept[IllegalArgumentException](FullText.parseQuery("a b"))
  }

  test("tsRank: calc_rank_or arithmetic under uniform D weights") {
    def rank(query: String, norm: Int, texts: String*): Seq[Double] =
      texts.toSeq.toDF("text")
        .select(FullText.tsRank(col("text"), query, norm).as("r"))
        .as[Double].collect().toSeq
    // independent recomputation of the per-tf contribution
    def contrib(tf: Int): Double = {
      val h = (1 to math.min(tf, 256)).map(j => 1.0 / (j.toDouble * j)).sum
      0.1 * h / 1.64493406685
    }
    val Seq(r) = rank("a | b", 0, "a b a")
    assert(r == contrib(2) + contrib(1))
    // phrase terms score like their AND of lexemes (calc_rank_or walks
    // every positive lexeme)
    assert(rank("a <-> b", 0, "a b a") == rank("a & b", 0, "a b a"))
    // absent terms contribute zero; no terms present -> rank 0
    assert(rank("a | zzz", 0, "a b a") == Seq(contrib(2)))
    assert(rank("zzz", 0, "a b a") == Seq(0.0))
    // tf saturates at PG's MAXNUMPOS = 256 positions per lexeme
    val long = Seq.fill(300)("a").mkString(" ")
    assert(rank("a", 0, long) == Seq(contrib(256)))
    // normalizations: log-length, length, uniq, rank/(rank+1), PG order
    val raw = contrib(2) + contrib(1)
    assert(rank("a | b", 1, "a b a") ==
      Seq(raw / (math.log(4.0) / math.log(2.0))))
    assert(rank("a | b", 2, "a b a") == Seq(raw / 3.0))
    assert(rank("a | b", 2 | 8, "a b a") == Seq(raw / 3.0 / 2.0))
    assert(rank("a | b", 32, "a b a") == Seq(raw / (raw + 1.0)))
    intercept[IllegalArgumentException](FullText.tsRank(col("text"), "a", 4))
    intercept[IllegalArgumentException](FullText.tsRank(col("text"), "!a"))
  }

  test("tsRankCd: PG cover enumeration on hand-checked layouts") {
    def cd(query: String, texts: String*): Seq[Double] =
      texts.toSeq.toDF("text")
        .select(FullText.tsRankCd(col("text"), query).as("r"))
        .as[Double].collect().toSeq
    def n(xs: Long*): Double = xs.sum / 1.0e9
    // a@1 b@3 a@5: covers [1,3] d=2 and [3,5] d=2
    assert(cd("a & b", "a x b x a") == Seq(n(50000000L, 50000000L)))
    // a@1 a@2 b@3: shrink keeps only [2,3], d=1
    assert(cd("a & b", "a a b") == Seq(n(100000000L)))
    // interleaved a@1 b@2 a@4 b@6: covers d=1, d=2, d=2
    assert(cd("a & b", "a b x a x b") ==
      Seq(n(100000000L, 50000000L, 50000000L)))
    // single term: every occurrence is a cover worth 0.1
    assert(cd("a", "a x a x a") == Seq(n(100000000L, 100000000L, 100000000L)))
    // three terms, one cover [1,5] with entries=3: d = 5-1-3+2 = 3
    assert(cd("a & b & c", "a x b x c") == Seq(n(33333333L)))
    // a missing term -> no cover -> 0 (PG AND semantics)
    assert(cd("a & b", "a x a") == Seq(0.0))
    // phrase terms rank like their lexemes (positive-term extraction)
    assert(cd("a <-> b", "a b") == cd("a & b", "a b"))
    // OR queries are rejected: covers here need ALL positive terms,
    // while PG's TS_execute would cover via a single arm
    intercept[IllegalArgumentException](cd("a | b", "a b"))
  }

  test("tsRankWeighted: setweight zone arithmetic, hand-computed") {
    def wr(query: String, T: Int, texts: String*): Seq[Double] =
      texts.toSeq.toDF("text")
        .select(FullText.tsRankWeighted(col("text"), query, T).as("r"))
        .as[Double].collect().toSeq
    val c = 1.64493406685
    def nano(w: Double, j: Int): Long = math.round(w * 1e9 / (j * j))
    // 'a' at pos 2 (title, w=1.0) and pos 5 (body, 0.1):
    // resj = n(1,1)+n(0.1,2); wjm=1.0 at jm=1 → contrib = wjm + resj − wjm/1²
    val expect1 = (1.0e9 + (nano(1.0, 1) + nano(0.1, 2)) - 1.0e9) / 1e9 / c
    assert(wr("a", 3, "x a y z a") == Seq(expect1))
    // body-only occurrences: wjm=0.1, jm=1
    val expect2 = (1.0e8 + (nano(0.1, 1) + nano(0.1, 2)) - 1.0e8) / 1e9 / c
    assert(wr("a", 3, "x y z a a") == Seq(expect2))
    // first occurrence body, SECOND in title: jm moves to the title hit
    // (strict-> update): ps = (4<=T? no with T=3... use T=5) —
    // positions 4 (body w/ T=3) then 2? construct: T=3, a at 4 and... a
    // title hit after a body hit needs pos_later <= 3 < pos_earlier —
    // impossible for sorted positions, so PG's jm is ALWAYS the first
    // title hit or 1; assert title-anywhere dominates body-everywhere
    assert(wr("a", 3, "a x y").head > wr("a", 3, "x y z a").head)
    // absent term → 0; title zone off (T=0) degrades to plain tsRank
    assert(wr("zzz", 3, "a b") == Seq(0.0))
    val flat = wr("a | b", 0, "a b a b")
    val plain = Seq("a b a b").toDF("text")
      .select(FullText.tsRank(col("text"), "a | b").as("r"))
      .as[Double].collect().toSeq
    assert(math.abs(flat.head - plain.head) < 1e-9)
  }

  test("rankTableSql literals roundtrip to the exact table doubles") {
    val body = FullText.rankTableSql.stripPrefix("[").stripSuffix("]")
    val parsed = body.split(", ").map(_.toDouble)
    assert(parsed.toSeq == FullText.rankTable.toSeq)
    assert(parsed.length == 257 && parsed(0) == 0.0)
  }

  test("websearchQuery compiles web syntax to tsquery") {
    assert(FullText.websearchQuery("\"spark key\" OR dup -\"slow query\"")
      == "(spark <-> key) | dup & !(slow <-> query)")
    assert(FullText.websearchQuery("Fast Spark join") == "fast & spark & join")
    assert(FullText.websearchQuery("-bad good") == "!bad & good")
    assert(FullText.websearchQuery("a OR b OR c") == "a | b | c")
    // dangling/leading OR is ignored, like PG's websearch parser
    assert(FullText.websearchQuery("or a") == "a")
    assert(FullText.websearchQuery("a or") == "a")
    // unterminated quote swallows the rest as the phrase
    assert(FullText.websearchQuery("\"a b") == "(a <-> b)")
    intercept[IllegalArgumentException](FullText.websearchQuery("  "))
    // the compiled string parses and matches end-to-end
    assert(matches(FullText.websearchQuery("\"spark key\" OR dup -\"slow query\""),
      "x spark key y", "a dup b", "dup slow query", "slow query spark") ==
      Seq(true, true, false, false))
  }

  test("indexedMatch equals the tsMatch scan across query shapes") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val post = FullText.postings(docs, "doc_id", "text").cache()
    try {
      for (q <- Seq("spark", "spark & key", "spark | dup",
          "spark <-> key", "spark <2> key", "key <-> spark <-> table",
          "(spark <-> key | dup) & !(slow <-> query)",
          "dup & !spark", "(a <-> a) | dup",
          // Not-under-Or shapes: served via the DNF rewrite
          "spark & (key | !dup)", "spark & !(key & !dup)",
          "!(slow | dup) & spark")) {
        val scan = docs.filter(FullText.tsMatch(col("text"), q))
          .select($"doc_id").as[Long].collect().toSet
        val idx = FullText.indexedMatch(post, q)
          .as[Long].collect().toSet
        assert(idx == scan, s"index/scan diverge for '$q': " +
          s"extra=${(idx diff scan).take(3)} missing=${(scan diff idx).take(3)}")
      }
      // one row per matching doc, even with repeated phrase hits
      val m = FullText.indexedMatch(post, "table").as[Long].collect()
      assert(m.length == m.distinct.length)
      // a GIN index cannot serve pure-negative queries — including a
      // pure-negative DNF arm hiding under an OR
      intercept[IllegalArgumentException](FullText.indexedMatch(post, "!spark"))
      intercept[IllegalArgumentException](
        FullText.indexedMatch(post, "spark | !dup"))
    } finally { post.unpersist(); () }
  }

  test("termBucket agrees with the postingsBucketed tbucket column") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val rows = FullText.postingsBucketed(docs, "doc_id", "text", buckets = 8)
      .select($"term", $"tbucket").distinct().collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getInt(1) == FullText.termBucket(r.getString(0), 8),
        s"driver/column bucket mismatch for term '${r.getString(0)}'")
    }
    // bucketed lookups return the same answer as unbucketed postings
    val post = FullText.postings(docs, "doc_id", "text")
    val postB = FullText.postingsBucketed(docs, "doc_id", "text", 8)
    val q = "(spark <-> key | dup) & !(slow <-> query)"
    assert(FullText.indexedMatch(postB, q, buckets = 8)
        .as[Long].collect().toSet ==
      FullText.indexedMatch(post, q).as[Long].collect().toSet)
  }

  test("indexedMatchMany equals per-query indexedMatch across shapes") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val post = FullText.postings(docs, "doc_id", "text").cache()
    try {
      val qs = Seq(
        0L -> "(spark <-> key | dup) & !(slow <-> query)",
        1L -> "table & !batch",
        2L -> "key <2> spark",
        3L -> "spark & (key | !dup)",
        4L -> "key <-> spark <-> table")
      val many = FullText.indexedMatchMany(post, qs)
        .as[(Long, Long)].collect().toSet
      for ((qid, q) <- qs) {
        val one = FullText.indexedMatch(post, q).as[Long].collect().toSet
        val got = many.collect { case (`qid`, d) => d }
        assert(got == one, s"batch/single diverge for qid=$qid '$q': " +
          s"extra=${(got diff one).take(3)} missing=${(one diff got).take(3)}")
      }
      // a pure-negative arm anywhere in the batch throws
      intercept[IllegalArgumentException](
        FullText.indexedMatchMany(post, Seq(0L -> "spark", 1L -> "a | !b")))
    } finally { post.unpersist(); () }
  }

  test("match column is pure codegen: no HOFs, no explode, no shuffle") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val plan = docs.filter(FullText.tsMatch(col("text"),
        "(spark <-> key | dup) & !(slow <-> query)"))
      .select(col("doc_id")).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), "fts match must be map-only")
    assert(!plan.contains("Generate"), "fts match must not explode")
    assert(!plan.contains("ArrayExists") && !plan.contains("ArrayFilter"),
      "fts match must not use interpreted HOFs")
  }

  test("prefix match: token-start only, boundary-respecting") {
    import spark.implicits._
    val got = Seq("a query row", "aquery row", "row quer", "que ry")
      .toDF("text")
      .select(FullText.prefixMatch(col("text"), "quer").as("m"))
      .as[Boolean].collect().toSeq
    // 'aquery' must NOT match (no token boundary); 'quer' itself does
    assert(got == Seq(true, false, true, false))
    intercept[IllegalArgumentException](
      FullText.prefixMatch(col("text"), "two words"))
  }

  test("indexed prefix equals the scan, prunes the letter partition") {
    import spark.implicits._
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val dir = java.nio.file.Files.createTempDirectory("graft_prepost").toString
    FullText.postingsPrefixParted(docs, "doc_id", "text")
      .write.mode("overwrite").partitionBy("tletter").parquet(dir)
    val post = spark.read.parquet(dir)
    for (p <- Seq("sc", "sm", "s", "quer", "spark")) {
      val scan = docs.filter(FullText.prefixMatch(col("text"), p))
        .select("doc_id").as[Long].collect().toSet
      val idx = FullText.indexedPrefix(post, p)
        .select("doc_id").as[Long].collect().toSet
      assert(idx == scan, s"index!=scan for '$p:*'")
    }
    val plan = FullText.indexedPrefix(post, "sc")
      .queryExecution.executedPlan.toString
    val scanLine = plan.linesIterator.find(_.contains("FileScan")).getOrElse("")
    assert(scanLine.contains("PartitionFilters") && scanLine.contains("tletter"),
      s"prefix lookup lost letter-partition pruning: $scanLine")
  }

  test("prefix atoms compose in the tsquery tree, scan and indexed") {
    import spark.implicits._
    def m(q: String, texts: String*): Seq[Boolean] =
      texts.toSeq.toDF("text")
        .select(FullText.tsMatch(col("text"), q).as("m"))
        .as[Boolean].collect().toSeq
    // boolean composition
    assert(m("sp:* & ke:*", "spark key", "spark dup", "key dup") ==
      Seq(true, false, false))
    assert(m("du:* | sl:*", "a dup", "slow b", "fast c") ==
      Seq(true, true, false))
    assert(m("spark & !qu:*", "spark row", "spark query") == Seq(true, false))
    // prefix slots inside phrases: position arithmetic + startsWith
    // ('spa' itself starts with 'sp', so it matches sp:* too)
    assert(m("spar:* <-> key", "spark key", "spa key", "key spark") ==
      Seq(true, false, false))
    assert(m("sp:* <-> key", "spa key") == Seq(true))
    assert(m("sp:* <2> ke:*", "spark x key", "spark key") == Seq(true, false))
    intercept[IllegalArgumentException](FullText.parseQuery("a:b"))
    intercept[IllegalArgumentException](
      FullText.positiveTerms("sp:* & key"))

    // indexed == scan for prefix queries, incl. multi-term-per-doc
    // position union (e.g. 's:*' hits several lexemes in one doc)
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val post = FullText.postings(docs, "doc_id", "text").cache()
    try {
      for (q <- Seq("sc:* | sm:*", "(sc:* | sm:*) & !dup",
          "sp:* <-> ke:*", "s:* & !du:*", "sp:* <2> key")) {
        val scan = docs.filter(FullText.tsMatch(col("text"), q))
          .select("doc_id").as[Long].collect().toSet
        val idx = FullText.indexedMatch(post, q)
          .select("doc_id").as[Long].collect().toSet
        assert(idx == scan, s"index!=scan for '$q'")
        assert(scan.nonEmpty, s"degenerate prefix query '$q'")
      }
    } finally { post.unpersist(); () }
  }

  test("plainto_tsquery: the reference's regress pins") {
    val FT = graft.operators.FullText
    // tsearch.out: stopwords and punctuation drop, lexemes AND together
    assert(FT.plaintoTsquery("the and z 1))& fghj") == "z & 1 & fghj")
    // english config stems and drops 'My' (the engine's stemmer is
    // classic Porter: 'skies'->'ski'; Snowball's exception list says
    // 'sky' — the documented departure shared by the whole FTS stack)
    assert(FT.plaintoTsquery("SKIES My booKs") == "ski & book")
    // parser tokens survive whole: hosts/files are single lexemes
    assert(FT.plaintoTsquery("visit www.example.com today") ==
      "visit & www.example.com & todai")
    // all-stopword input compiles to the empty query
    assert(FT.plaintoTsquery("the of and") == "")
  }
}
