package graft

import graft.functions.TsDefaultParser
import org.scalatest.funsuite.AnyFunSuite

/**
 * Default text-search parser (wparser_def.cpp): the reference's own
 * regress battery pinned verbatim — the 133-row ts_parse('default', ...)
 * stream from src/test/regress/sql/tsearch.sql (expected/tsearch.out),
 * the four URL ts_debug cases, the tag/entity ts_debug case, and the
 * to_tsvector position arithmetic of the same text.
 */
class TsParserSpec extends AnyFunSuite {

  private val regressInput =
    "345 qwe@efd.r ' http://www.com/ http://aew.werc.ewr/?ad=qwe&dw 1aew.werc.ewr/?ad=qwe&dw 2a" +
    "ew.werc.ewr http://3aew.werc.ewr/?ad=qwe&dw http://4aew.werc.ewr http://5aew.werc.ewr:8100" +
    "/?  ad=qwe&dw 6aew.werc.ewr:8100/?ad=qwe&dw 7aew.werc.ewr:8100/?ad=qwe&dw=%20%32 +4.0e-10 " +
    "qwe qwe qwqwe 234.435 455 5.005 teodor@stack.net qwe-wer asdf <fr>qwer jf sdjk<we hjwer <w" +
    "errwe> ewr1> ewri2 <a href=\"qwe<qwe>\">\n/usr/local/fff /awdf/dwqe/4325 rewt/ewr wefjn /wqe-" +
    "324/ewr gist.h gist.h.c gist.c. readline 4.2 4.2. 4.2, readline-4.2 readline-4.2. 234\n<i <" +
    "b> wow  < jqw <> qwerty"

  private val regressExpected: Seq[(Int, String)] = Seq(
    (1, "ad"),
    (1, "asdf"),
    (1, "dw"),
    (1, "hjwer"),
    (1, "i"),
    (1, "jf"),
    (1, "jqw"),
    (1, "qwe"),
    (1, "qwe"),
    (1, "qwe"),
    (1, "qwe"),
    (1, "qwer"),
    (1, "qwerty"),
    (1, "qwqwe"),
    (1, "readline"),
    (1, "readline"),
    (1, "readline"),
    (1, "sdjk"),
    (1, "we"),
    (1, "wefjn"),
    (1, "wow"),
    (3, "ewr1"),
    (3, "ewri2"),
    (4, "teodor@stack.net"),
    (5, "1aew.werc.ewr/?ad=qwe&dw"),
    (5, "3aew.werc.ewr/?ad=qwe&dw"),
    (5, "5aew.werc.ewr:8100/?"),
    (5, "6aew.werc.ewr:8100/?ad=qwe&dw"),
    (5, "7aew.werc.ewr:8100/?ad=qwe&dw=%20%32"),
    (5, "aew.werc.ewr/?ad=qwe&dw"),
    (6, "1aew.werc.ewr"),
    (6, "2aew.werc.ewr"),
    (6, "3aew.werc.ewr"),
    (6, "4aew.werc.ewr"),
    (6, "5aew.werc.ewr:8100"),
    (6, "6aew.werc.ewr:8100"),
    (6, "7aew.werc.ewr:8100"),
    (6, "aew.werc.ewr"),
    (6, "www.com"),
    (7, "+4.0e-10"),
    (11, "qwe"),
    (11, "wer"),
    (12, "\n"),
    (12, "\n"),
    (12, " "),
    (12, " "),
    (12, " "),
    (12, " "),
    (12, " "),
    (12, " "),
    (12, " "),
    (12, " "),
    (12, " "),
    (12, " "),
    (12, " "),
    (12, " "),
    (12, " "),
    (12, " "),
    (12, " "),
    (12, " "),
    (12, " "),
    (12, " "),
    (12, " "),
    (12, " "),
    (12, " "),
    (12, " "),
    (12, " "),
    (12, " "),
    (12, " "),
    (12, " "),
    (12, " "),
    (12, " "),
    (12, " "),
    (12, " "),
    (12, " "),
    (12, " "),
    (12, " "),
    (12, " "),
    (12, " "),
    (12, " "),
    (12, " "),
    (12, " "),
    (12, "  "),
    (12, "  "),
    (12, " ' "),
    (12, "&"),
    (12, ", "),
    (12, "-"),
    (12, ". "),
    (12, ". "),
    (12, ". "),
    (12, "/ "),
    (12, "<"),
    (12, "<"),
    (12, "< "),
    (12, "<> "),
    (12, "="),
    (12, "> "),
    (12, "@"),
    (13, "<a href=\"qwe<qwe>\">"),
    (13, "<b>"),
    (13, "<fr>"),
    (13, "<werrwe>"),
    (14, "http://"),
    (14, "http://"),
    (14, "http://"),
    (14, "http://"),
    (14, "http://"),
    (16, "qwe-wer"),
    (18, "/?"),
    (18, "/?ad=qwe&dw"),
    (18, "/?ad=qwe&dw"),
    (18, "/?ad=qwe&dw"),
    (18, "/?ad=qwe&dw"),
    (18, "/?ad=qwe&dw=%20%32"),
    (19, "/awdf/dwqe/4325"),
    (19, "/usr/local/fff"),
    (19, "/wqe-324/ewr"),
    (19, "efd.r"),
    (19, "gist.c"),
    (19, "gist.h"),
    (19, "gist.h.c"),
    (19, "rewt/ewr"),
    (20, "-4.2"),
    (20, "-4.2"),
    (20, "234.435"),
    (20, "4.2"),
    (20, "4.2"),
    (20, "4.2"),
    (20, "5.005"),
    (22, "234"),
    (22, "345"),
    (22, "455"))

  test("regress battery: ts_parse('default', ...) 133-row stream") {
    val got = TsDefaultParser.parse(regressInput)
    assert(got.size == regressExpected.size)
    // the expected file is ORDER BY tokid, token COLLATE "POSIX" —
    // multiset compare under the same (codepoint) ordering
    val sortKey = (p: (Int, String)) => (p._1, p._2)
    assert(got.sortBy(sortKey) == regressExpected.sortBy(sortKey))
  }

  test("URL ts_debug cases: protocol/url/host/url_path split") {
    def nonBlank(s: String) =
      TsDefaultParser.parse(s).filter(_._1 != TsDefaultParser.SPACE)
        .map { case (t, tok) => (TsDefaultParser.alias(t), tok) }
    assert(nonBlank("http://www.harewoodsolutions.co.uk/press.aspx</span>") ==
      Seq("protocol" -> "http://",
        "url" -> "www.harewoodsolutions.co.uk/press.aspx",
        "host" -> "www.harewoodsolutions.co.uk",
        "url_path" -> "/press.aspx",
        "tag" -> "</span>"))
    assert(nonBlank("http://aew.wer0c.ewr/id?ad=qwe&dw<span>") ==
      Seq("protocol" -> "http://",
        "url" -> "aew.wer0c.ewr/id?ad=qwe&dw",
        "host" -> "aew.wer0c.ewr",
        "url_path" -> "/id?ad=qwe&dw",
        "tag" -> "<span>"))
    assert(nonBlank("http://5aew.werc.ewr:8100/?") ==
      Seq("protocol" -> "http://",
        "url" -> "5aew.werc.ewr:8100/?",
        "host" -> "5aew.werc.ewr:8100",
        "url_path" -> "/?"))
    assert(nonBlank("5aew.werc.ewr:8100/?xx") ==
      Seq("url" -> "5aew.werc.ewr:8100/?xx",
        "host" -> "5aew.werc.ewr:8100",
        "url_path" -> "/?xx"))
  }

  test("tag + entity ts_debug case") {
    val s = "<myns:foo-bar_baz.blurfl>abc&nm1;def&#xa9;ghi&#245;jkl" +
      "</myns:foo-bar_baz.blurfl>"
    val got = TsDefaultParser.parse(s)
      .filter(_._1 != TsDefaultParser.SPACE)
      .map { case (t, tok) => (TsDefaultParser.alias(t), tok) }
      .sorted
    assert(got == Seq(
      "asciiword" -> "abc", "asciiword" -> "def", "asciiword" -> "ghi",
      "asciiword" -> "jkl",
      "entity" -> "&#245;", "entity" -> "&#xa9;", "entity" -> "&nm1;",
      "tag" -> "</myns:foo-bar_baz.blurfl>",
      "tag" -> "<myns:foo-bar_baz.blurfl>").sorted)
  }

  test("to_tsvector position arithmetic over the regress text") {
    // expected/tsearch.out's to_tsvector shows 67 positions; anchors:
    // '345':1 'qwe':2 'efd.r':3 'www.com':4 ... 'wow':65 'jqw':66
    // 'qwerti':67 (stemmed 'qwerty'). Unmapped types (blank, tag,
    // protocol, entity) consume no position.
    val withPos = TsDefaultParser.parseWithPos(regressInput)
    val mapped = withPos.filter(_._3 > 0)
    assert(mapped.last._3 == 67)
    def posOf(tok: String) = mapped.filter(_._2 == tok).map(_._3)
    assert(posOf("345") == Seq(1))
    assert(posOf("www.com") == Seq(4))
    assert(posOf("wow") == Seq(65))
    assert(posOf("jqw") == Seq(66))
    assert(posOf("qwerty") == Seq(67))
    assert(posOf("qwe") == Seq(2, 20, 29, 30, 37))
    assert(posOf("-4.2") == Seq(60, 62))
    // blanks, tags and protocol heads carry pos 0
    assert(withPos.filter(t => t._1 == TsDefaultParser.SPACE ||
      t._1 == TsDefaultParser.TAG || t._1 == TsDefaultParser.PROTOCOL)
      .forall(_._3 == 0))
  }

  test("script/style content is ignored (SpecialTags)") {
    val s = "before <script>var x = 1 + 2;</script> after " +
      "<style>p { color: red }</style> done"
    val words = TsDefaultParser.parse(s)
      .filter(_._1 == TsDefaultParser.ASCIIWORD).map(_._2)
    assert(words == Seq("before", "after", "done"))
  }

  test("version numbers, decimals and scientific notation") {
    def one(s: String) = TsDefaultParser.parse(s)
      .filterNot(_._1 == TsDefaultParser.SPACE)
      .map { case (t, tok) => (TsDefaultParser.alias(t), tok) }
    assert(one("1.2.3") == Seq("version" -> "1.2.3"))
    assert(one("4.2") == Seq("float" -> "4.2"))
    assert(one("-4.2") == Seq("float" -> "-4.2"))
    assert(one("+4.0e-10") == Seq("sfloat" -> "+4.0e-10"))
    assert(one("455") == Seq("uint" -> "455"))
    assert(one("foo-bar") == Seq("asciihword" -> "foo-bar",
      "hword_asciipart" -> "foo", "hword_asciipart" -> "bar"))
    // a digit tail with no letter after it is NOT a numword part —
    // the lookahead pops and the tail re-parses from Base as an int
    assert(one("big-data-2024") == Seq("asciihword" -> "big-data",
      "hword_asciipart" -> "big", "hword_asciipart" -> "data",
      "uint" -> "2024"))
    assert(one("qwe-wer2") == Seq("numhword" -> "qwe-wer2",
      "hword_asciipart" -> "qwe", "hword_numpart" -> "wer2"))
  }

  test("non-ASCII letters are word chars (C-locale wide semantics)") {
    def one(s: String) = TsDefaultParser.parse(s)
      .filterNot(_._1 == TsDefaultParser.SPACE)
      .map { case (t, tok) => (TsDefaultParser.alias(t), tok) }
    assert(one("caf\u00e9 beta") ==
      Seq("word" -> "caf\u00e9", "asciiword" -> "beta"))
    // combining mark (zero display width) is not a breaker mid-word
    assert(one("ab\u0301c") == Seq("word" -> "ab\u0301c"))
  }

  test("property fuzz: non-composite tokens tile the input exactly") {
    // composite tokens (url / hyphenated words — generateHeadline's
    // HLIDSKIP set) deliberately OVERLAP their re-emitted parts; after
    // dropping them, every input char lands in exactly one token, in
    // order — the invariant behind ts_debug showing the whole text
    val skip = Set(TsDefaultParser.URL, TsDefaultParser.NUMHWORD,
      TsDefaultParser.ASCIIHWORD, TsDefaultParser.HWORD)
    val alphabet = "ab1./-@:<>&;?#~_ \t\ne$%\"'!xX=+\u00e9\u4e2d\u0301"
    val rnd = new scala.util.Random(20260815L)
    for (trial <- 0 until 400) {
      val n = 1 + rnd.nextInt(40)
      val s = Seq.fill(n)(alphabet(rnd.nextInt(alphabet.length))).mkString
      val toks = graft.functions.TsDefaultParser.tokenize(s)
        .filterNot(t => skip(t.tpe))
      var pos = 0
      toks.foreach { t =>
        assert(t.start == pos,
          s"trial $trial gap/overlap at ${t.start} (expected $pos) in '$s'")
        pos = t.start + t.len
      }
      assert(pos == s.length,
        s"trial $trial dropped tail after $pos of ${s.length} in '$s'")
    }
  }

  test("fuzz: headline never crashes and always returns a string") {
    val alphabet = "ab cd-ef.12 <b>tag</b> http://x.y/z &amp; paint water "
    val rnd = new scala.util.Random(42L)
    for (_ <- 0 until 100) {
      val n = 1 + rnd.nextInt(120)
      val s = Seq.fill(n)(alphabet(rnd.nextInt(alphabet.length))).mkString
      val h1 = graft.operators.HeadlineDefault.headline(s, "paint & water")
      val h2 = graft.operators.HeadlineDefault.headline(s, "water | ab",
        maxFragments = 2, minWords = 3, maxWords = 8)
      val h3 = graft.operators.HeadlineDefault.headline(s, "tag",
        highlightAll = true)
      assert(h1 != null && h2 != null && h3 != null)
    }
  }

  test("ts_token_type('default'): the 23-row catalog verbatim") {
    val got = TsDefaultParser.tokenTypes
    assert(got.size == 23)
    assert(got.head == (1, "asciiword", "Word, all ASCII"))
    assert(got(6) == (7, "sfloat", "Scientific notation"))
    assert(got(11) == (12, "blank", "Space symbols"))
    assert(got(18) == (19, "file", "File or path name"))
    assert(got.last == (23, "entity", "XML entity"))
  }

  test("ts_debug: the regress tag/entity case with dictionary routing") {
    val FT = graft.operators.FullText
    val rows = FT.tsDebug("<myns:foo-bar_baz.blurfl>abc&nm1;def&#xa9;" +
        "ghi&#245;jkl</myns:foo-bar_baz.blurfl>")
      .sortBy(r => (r.alias, r.token))
    def row(a: String, tok: String) =
      rows.find(r => r.alias == a && r.token == tok).get
    // asciiwords lexize through english_stem
    assert(row("asciiword", "abc") ==
      FT.DebugRow("asciiword", "Word, all ASCII", "abc",
        Some("english_stem"), Some(Seq("abc"))))
    // entities and tags have no dictionary (NULL lexemes)
    assert(row("entity", "&nm1;").dictionary.isEmpty)
    assert(row("entity", "&nm1;").lexemes.isEmpty)
    assert(row("tag", "<myns:foo-bar_baz.blurfl>").dictionary.isEmpty)
    // URL pieces route through simple
    val url = FT.tsDebug("http://www.harewoodsolutions.co.uk/press.aspx")
      .filter(_.alias != "blank")
    assert(url.map(r => (r.alias, r.token, r.dictionary)) == Seq(
      ("protocol", "http://", None),
      ("url", "www.harewoodsolutions.co.uk/press.aspx", Some("simple")),
      ("host", "www.harewoodsolutions.co.uk", Some("simple")),
      ("url_path", "/press.aspx", Some("simple"))))
    // stopwords consume through english_stem with EMPTY lexemes
    val stop = FT.tsDebug("the").head
    assert(stop.dictionary == Some("english_stem") &&
      stop.lexemes == Some(Nil))
  }
}
