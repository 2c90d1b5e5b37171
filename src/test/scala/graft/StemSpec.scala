package graft

import graft.functions.Porter
import graft.operators.{FullText, Lexize}
import org.apache.spark.sql.functions._

/**
 * Porter stemmer + dictionary-chain (stopword → stem) behavior.
 *
 * The canonical pairs below pin the ORIGINAL Porter algorithm's
 * published behavior — examples from the 1980 paper's rule lists and
 * the reference implementation's sample vocabulary — including its
 * documented departures (bli→ble, logi→log, short words unchanged).
 * If the implementation drifts, these fail loudly.
 */
class StemSpec extends SparkSpec {
  import spark.implicits._

  test("canonical Porter outputs (paper rule examples)") {
    val pairs = Seq(
      // step 1a
      "caresses" -> "caress", "ponies" -> "poni", "ties" -> "ti",
      "caress" -> "caress", "cats" -> "cat",
      // step 1b (+ 5a cleanup for agreed)
      "feed" -> "feed", "agreed" -> "agre", "plastered" -> "plaster",
      "bled" -> "bled", "motoring" -> "motor", "sing" -> "sing",
      "conflated" -> "conflat", "troubled" -> "troubl", "sized" -> "size",
      "hopping" -> "hop", "tanned" -> "tan", "falling" -> "fall",
      "hissing" -> "hiss", "fizzed" -> "fizz", "failing" -> "fail",
      "filing" -> "file", "running" -> "run",
      // step 1c
      "happy" -> "happi", "sky" -> "sky",
      // step 2
      "relational" -> "relat", "conditional" -> "condit",
      "rational" -> "ration", "valenci" -> "valenc",
      "hesitanci" -> "hesit", "digitizer" -> "digit",
      "radicalli" -> "radic", "differentli" -> "differ",
      "vileli" -> "vile", "analogousli" -> "analog",
      "vietnamization" -> "vietnam", "predication" -> "predic",
      "operator" -> "oper", "feudalism" -> "feudal",
      "decisiveness" -> "decis", "hopefulness" -> "hope",
      "callousness" -> "callous", "formaliti" -> "formal",
      "sensitiviti" -> "sensit", "sensibiliti" -> "sensibl",
      // step 3
      "triplicate" -> "triplic", "formative" -> "form",
      "formalize" -> "formal", "electriciti" -> "electr",
      "electrical" -> "electr", "hopeful" -> "hope", "goodness" -> "good",
      // step 4
      "revival" -> "reviv", "allowance" -> "allow",
      "inference" -> "infer", "airliner" -> "airlin",
      "gyroscopic" -> "gyroscop", "adjustable" -> "adjust",
      "defensible" -> "defens", "irritant" -> "irrit",
      "replacement" -> "replac", "adjustment" -> "adjust",
      "dependent" -> "depend", "adoption" -> "adopt",
      "communism" -> "commun", "activate" -> "activ",
      "angulariti" -> "angular", "homologous" -> "homolog",
      "effective" -> "effect", "bowdlerize" -> "bowdler",
      // step 5
      "probate" -> "probat", "rate" -> "rate", "cease" -> "ceas",
      "controll" -> "control", "roll" -> "roll")
    val bad = pairs.collect {
      case (in, want) if Porter.stem(in) != want =>
        s"$in -> ${Porter.stem(in)} (want $want)"
    }
    assert(bad.isEmpty, bad.mkString("; "))
  }

  test("short words, case, and non-alpha tokens pass through") {
    assert(Porter.stem("a") == "a")
    assert(Porter.stem("ab") == "ab")
    assert(Porter.stem("RUNNING") == "run")
    assert(Porter.stem("x86") == "x86")
    assert(Porter.stem("co-op") == "co-op")
  }

  test("TESTDATA corpus vocabulary stems (the oracle stem map)") {
    val expected = Map(
      "customer" -> "custom", "key" -> "kei", "merge" -> "merg",
      "query" -> "queri", "table" -> "tabl", "value" -> "valu")
    Lexize.corpusVocab.foreach { w =>
      assert(Porter.stem(w) == expected.getOrElse(w, w),
        s"$w -> ${Porter.stem(w)}")
    }
    // the SQL CASE map renders exactly these stems
    val sql = Lexize.stemCaseSql("t")
    expected.foreach { case (w, s) =>
      assert(sql.contains(s"WHEN '$w' THEN '$s'"))
    }
  }

  test("stop list has PG english.stop's 127 words, checked pre-stem") {
    assert(Lexize.stopWords.size == 127)
    assert(Lexize.isStop("The") && Lexize.isStop("a") && !Lexize.isStop("spark"))
  }

  test("lexemes keep parser positions with stopword gaps") {
    val got = Seq("value the table", "The big  Query", "the a of")
      .toDF("text")
      .select(Lexize.lexemes(col("text")).as("lex"))
      .as[Seq[(String, Int)]].collect().toSeq
    assert(got(0) == Seq(("valu", 1), ("tabl", 3)))
    // double space yields an empty token that still consumes a position
    assert(got(1) == Seq(("big", 2), ("queri", 4)))
    assert(got(2) == Seq.empty)
  }

  test("phraseQuery compiles stopword gaps like phraseto_tsquery") {
    val ph = Lexize.phraseQuery("value the table")
    assert(ph.terms == Seq("valu", "tabl") && ph.gaps == Seq(2))
    val ph2 = Lexize.phraseQuery("customers merge")
    assert(ph2.terms == Seq("custom", "merg") && ph2.gaps == Seq(1))
    intercept[IllegalArgumentException](Lexize.phraseQuery("the a"))
  }

  test("tsquery normalization stems terms and drops stopword arms") {
    import FullText.{And, Phrase}
    assert(Lexize.tsquery("customers & merging") ==
      And(Phrase(Seq("custom"), Nil), Phrase(Seq("merg"), Nil)))
    // 'the & big' -> 'big' (PG drops the stopword arm with a notice)
    assert(Lexize.tsquery("the & big") == Phrase(Seq("big"), Nil))
    assert(Lexize.tsquery("the | big") == Phrase(Seq("big"), Nil))
    // in-phrase stopword folds its gap into the successor
    assert(Lexize.tsquery("value <-> the <-> table") ==
      Phrase(Seq("valu", "tabl"), Seq(2)))
    intercept[IllegalArgumentException](Lexize.tsquery("the & a"))
  }

  test("stemmed match: surface-form queries hit normalized docs") {
    def m(q: String, texts: String*): Seq[Boolean] =
      texts.toSeq.toDF("text")
        .select(Lexize.tsMatch(col("text"), q).as("m"))
        .as[Boolean].collect().toSeq
    // 'customers & merging' matches docs saying 'customer … merge'
    assert(m("customers & merging",
      "customer row merge", "customer only", "merge only") ==
      Seq(true, false, false))
    // phrase across a dropped stopword: positions differ by 2
    assert(m("value <-> the <-> table",
      "a value the table b", "value big table", "value table") ==
      Seq(true, true, false))
    // stopwords in the document never match a lexeme
    assert(m("values", "the a value", "the a") == Seq(true, false))
  }

  test("stemmed rank matches a hand-computed contribution sum") {
    val df = Seq("customer merge customer", "customer the merge")
      .toDF("text")
      .select(
        Lexize.tsRank(col("text"), "customers & merging").as("r0"),
        Lexize.tsRank(col("text"), "customers & merging", norm = 2 | 8).as("r28"))
    val rows = df.collect()
    val t = FullText.rankTable
    assert(math.abs(rows(0).getDouble(0) - (t(2) + t(1))) < 1e-12)
    // doc 2: 2 lexemes (stopword dropped), 2 distinct
    assert(math.abs(rows(1).getDouble(1) - (t(1) + t(1)) / 2.0 / 2.0) < 1e-12)
  }

  test("renderQuery round-trips normalized trees") {
    for (q <- Seq("customers & merging", "value <-> the <-> table",
        "(customers & merging & !queries) | (value <-> the <-> table)",
        "tables | queries", "!(tables & values) & spark")) {
      val n = Lexize.tsquery(q)
      assert(FullText.parseQuery(Lexize.renderQuery(n)) == n, q)
    }
  }

  test("indexed stemmed match equals the scan across query shapes") {
    val docs = spark.read.parquet(s"${SparkTestSession.sfDir}/documents.parquet")
    val post = Lexize.postings(docs, "doc_id", "text").cache()
    try {
      for (q <- Seq(
          "customers & merging",
          "value <-> the <-> table",
          "(customers & merging & !queries) | (value <-> the <-> table)",
          "tables | queries",
          "customers & !merging")) {
        val scan = docs.filter(Lexize.tsMatch(col("text"), q))
          .select("doc_id").as[Long].collect().toSet
        val idx = Lexize.indexedMatch(post, q)
          .select("doc_id").as[Long].collect().toSet
        assert(idx == scan, s"index!=scan for '$q'")
        assert(scan.nonEmpty, s"degenerate (empty) gate query '$q'")
      }
    } finally post.unpersist()
  }

  test("lexeme postings store parser positions with stopword gaps") {
    val post = Lexize.postings(
      Seq((1L, "value the table")).toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => (r.getString(0), r.getSeq[Int](2))).toMap
    assert(post("valu") == Seq(1) && post("tabl") == Seq(3))
    assert(!post.contains("the"))
  }

  test("stem memo is consistent under repetition") {
    val words = Seq("running", "relational", "key", "value", "sky")
    val first = words.map(Porter.stem)
    (1 to 3).foreach { _ => assert(words.map(Porter.stem) == first) }
  }

  test("dict_int lexize: pass / trim / reject per dintdict_lexize") {
    // dict_int.cpp measures the RAW length (sign included) and trims
    // to the first maxlen characters — "-123456" at maxlen=6 keeps
    // the sign and only 5 digits.
    val toks = Seq("69", "123456", "1234567", "-123456", "000012345")
      .toDF("tok")
    val out = toks.select(
        Lexize.dictInt(col("tok")).as("lex"),
        Lexize.dictInt(col("tok"), maxlen = 4, rejectlong = true)
          .as("strict"))
      .collect().map(r => (r.getString(0), Option(r.getString(1))))
    assert(out(0) == ("69", Some("69")))            // short: unchanged
    assert(out(1) == ("123456", None))              // == maxlen passes; >4 rejected
    assert(out(2) == ("123456", None))              // trimmed, not rounded
    assert(out(3) == ("-12345", None))              // sign counts toward maxlen
    assert(out(4) == ("000012", None))              // leading zeros kept
  }
}
