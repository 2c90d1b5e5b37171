package graft.operators

import graft.functions.{Porter, TsDefaultParser => TP}
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * ts_headline over the DEFAULT parser — prsd_headline
 * (wparser_def.cpp:2266) ported whole: hlCover's minimal-window cover
 * search (:1836), the default single-fragment selector mark_hl_words
 * (:2128), the MaxFragments>0 selector mark_hl_fragments (:1976) with
 * get_next_fragment splitting and stretch/trim, and generateHeadline's
 * rendering (ts_parse.cpp) with the replace/skip/repeated word flags
 * (HLIDREPLACE = tag → one space; HLIDSKIP = url/hyphenated compounds
 * whose PARTS render separately; repeated = duplicate entries added by
 * hlfinditem when several query atoms match one word).
 *
 * Lexization mirrors the 'english' configuration: word-ish types run
 * the stop list + Porter stemmer, numeric/url/file types the simple
 * dictionary, blank/tag/protocol/entity none. Query atoms stem the
 * same way (to_tsquery semantics), so 'paint & water' highlights
 * 'painted' — the reference's own regress battery is the spec.
 *
 * Options: MaxWords=35, MinWords=15, ShortWord=3, MaxFragments=0,
 * HighlightAll=false, StartSel/StopSel/FragmentDelimiter — the
 * prsd_headline defaults and validation.
 */
object HeadlineDefault {

  // english-config dictionary routing
  private val stemTypes = Set(TP.ASCIIWORD, TP.WORD, TP.HWORD,
    TP.ASCIIHWORD, TP.PARTHWORD, TP.ASCIIPARTHWORD)
  private val ignoreTypes = Set(TP.SPACE, TP.TAG, TP.PROTOCOL, TP.XMLENTITY)

  // the flag macros (wparser_def.cpp:1806-1817)
  private def hlIdReplace(t: Int) = t == TP.TAG
  private def hlIdSkip(t: Int) = t == TP.URL || t == TP.NUMHWORD ||
    t == TP.ASCIIHWORD || t == TP.HWORD
  private def nonWord(t: Int) = t == TP.SPACE || hlIdReplace(t) || hlIdSkip(t)
  private def noEnd(t: Int) = nonWord(t) || t == TP.SCIENTIFIC ||
    t == TP.VERSIONNUMBER || t == TP.DECIMAL || t == TP.SIGNEDINT ||
    t == TP.UNSIGNEDINT || ignoreTypes(t)

  private final class Word(val text: String, val tpe: Int,
      val item: Int, val repeated: Boolean) {
    val len: Int = text.getBytes("UTF-8").length
    var selected = false
    var in = false
    var replace = false
    var skip = false
  }

  /** ts_debug's view of the english lexize chain: None = no dictionary
    * for the type; Some((dict, Nil)) = stopword (consumed, no lexeme);
    * Some((dict, lexemes)) otherwise. */
  def englishDebugLexize(tpe: Int, text: String): Option[(String, Seq[String])] =
    if (ignoreTypes(tpe)) None
    else if (stemTypes(tpe)) {
      val low = text.toLowerCase(java.util.Locale.ROOT)
      if (Lexize.stopWords.contains(low)) Some(("english_stem", Nil))
      else Some(("english_stem", Seq(Porter.stem(low))))
    } else Some(("simple", Seq(text.toLowerCase(java.util.Locale.ROOT))))

  /** english_stem / simple lexize of one token; None = no dictionary
    * or stopword (no norm). Shared with plainto_tsquery. */
  def englishLexize(tpe: Int, text: String): Option[String] =
    englishDebugLexize(tpe, text).flatMap(_._2.headOption)

  /** Flattened query: atom lexemes (stemmed) + an evaluator over
    * "atom present" sets. */
  private final class Query(node: FullText.Node) {
    val atoms = scala.collection.mutable.ArrayBuffer.empty[String]
    private def collect(n: FullText.Node): Unit = n match {
      case FullText.Phrase(terms, _) =>
        terms.foreach { t =>
          val low = t.toLowerCase(java.util.Locale.ROOT)
          if (!Lexize.stopWords.contains(low)) atoms += Porter.stem(low)
        }
      case FullText.And(l, r) => collect(l); collect(r)
      case FullText.Or(l, r) => collect(l); collect(r)
      case FullText.Not(c) => collect(c)
    }
    collect(node)

    /** TS_execute with "present in window" semantics (phrase = AND,
      * like PG's TS_execute without position data). */
    def execute(present: Int => Boolean): Boolean = {
      var idx = 0
      def eval(n: FullText.Node): Boolean = n match {
        case FullText.Phrase(terms, _) =>
          terms.forall { t =>
            val low = t.toLowerCase(java.util.Locale.ROOT)
            if (Lexize.stopWords.contains(low)) true
            else { val r = present(idx); idx += 1; r }
          }
        case FullText.And(l, r) => val a = eval(l); val b = eval(r); a && b
        case FullText.Or(l, r) => val a = eval(l); val b = eval(r); a || b
        case FullText.Not(c) => !eval(c)
      }
      eval(node)
    }
  }

  /** hlparsetext: parser tokens → word entries with atom links,
    * duplicate REPEATED entries when several atoms match one word. */
  private def buildWords(text: String, q: Query): Array[Word] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Word]
    TP.tokenize(text).foreach { t =>
      val tok = text.substring(t.start, t.start + t.len)
      var first = -1
      val extra = scala.collection.mutable.ArrayBuffer.empty[Int]
      englishLexize(t.tpe, tok).foreach { lex =>
        var j = 0
        while (j < q.atoms.length) {
          if (q.atoms(j) == lex) {
            if (first < 0) first = j else extra += j
          }
          j += 1
        }
      }
      out += new Word(tok, t.tpe, first, repeated = false)
      extra.foreach(j => out += new Word(tok, t.tpe, j, repeated = true))
    }
    out.toArray
  }

  /** hlCover (wparser_def.cpp:1836), iteratively: the minimal window
    * from `p0` containing every atom at least once AND satisfying the
    * query tree. Returns (p, q) or null. */
  private def hlCover(words: Array[Word], q: Query, p0: Int): Array[Int] = {
    var pos = p0
    while (true) {
      var qq = -1
      var j = 0
      while (j < q.atoms.length) {
        var i = pos
        var found = false
        while (i < words.length && !found) {
          if (words(i).item == j) { if (i > qq) qq = i; found = true }
          i += 1
        }
        j += 1
      }
      if (qq < 0) return null
      var pp = Int.MaxValue
      j = 0
      while (j < q.atoms.length) {
        var i = qq
        var found = false
        while (i >= pos && !found) {
          if (words(i).item == j) { if (i < pp) pp = i; found = true }
          i -= 1
        }
        j += 1
      }
      if (pp <= qq) {
        val present = (a: Int) =>
          (pp to qq).exists(i => words(i).item == a)
        if (q.execute(present)) return Array(pp, qq)
        pos = pp + 1
      } else return null
    }
    null
  }

  private def markRange(words: Array[Word], highlight: Boolean,
      b: Int, e: Int): Unit = {
    var i = b
    while (i <= e) {
      val w = words(i)
      if (w.item >= 0) w.selected = true
      if (!highlight) {
        if (hlIdReplace(w.tpe)) w.replace = true
        else if (hlIdSkip(w.tpe)) w.skip = true
      } else if (hlIdSkip(w.tpe)) w.skip = true
      w.in = !w.repeated
      i += 1
    }
  }

  /** mark_hl_words (:2128) — the default single-fragment selector. */
  private def markWords(words: Array[Word], q: Query, highlight: Boolean,
      shortword: Int, minWords: Int, maxWords: Int): Unit = {
    if (highlight) { markRange(words, highlight, 0, words.length - 1); return }
    var bestb = -1
    var beste = -1
    var bestlen = -1
    var p = 0
    var cover = hlCover(words, q, p)
    while (cover != null) {
      p = cover(0)
      val qpos = cover(1)
      var curlen = 0
      var poslen = 0
      var pose = 0
      var i = p
      while (i <= qpos && curlen < maxWords) {
        if (!nonWord(words(i).tpe)) curlen += 1
        if (words(i).item >= 0 && !words(i).repeated) poslen += 1
        pose = i
        i += 1
      }
      val bestShortEnd = bestlen >= 0 &&
        (noEnd(words(beste).tpe) || words(beste).len <= shortword)
      if (poslen < bestlen && !bestShortEnd) {
        p += 1
        cover = hlCover(words, q, p)
      } else {
        var posb = p
        if (curlen < maxWords) { // find a good end
          i -= 1
          var break1 = false
          while (!break1 && i < words.length && curlen < maxWords) {
            if (i != qpos) {
              if (!nonWord(words(i).tpe)) curlen += 1
              if (words(i).item >= 0 && !words(i).repeated) poslen += 1
            }
            pose = i
            if (!(noEnd(words(i).tpe) || words(i).len <= shortword) &&
                curlen >= minWords) break1 = true
            else i += 1
          }
          if (curlen < minWords && i >= words.length) {
            // end of text before min_words: extend backwards
            i = p - 1
            var break2 = false
            while (!break2 && i >= 0) {
              if (!nonWord(words(i).tpe)) curlen += 1
              if (words(i).item >= 0 && !words(i).repeated) poslen += 1
              if (curlen >= maxWords) break2 = true
              else if (noEnd(words(i).tpe) || words(i).len <= shortword)
                i -= 1
              else if (curlen >= minWords) break2 = true
              else i -= 1
            }
            posb = if (i >= 0) i else 0
          }
        } else { // cut the over-long cover back
          // (the reference would read one-past-the-end scratch here
          // when the cover reaches the last word; clamp instead)
          if (i >= words.length) i = words.length - 1
          var break3 = false
          while (!break3 && curlen > minWords) {
            if (!nonWord(words(i).tpe)) curlen -= 1
            if (words(i).item >= 0 && !words(i).repeated) poslen -= 1
            pose = i
            if (!(noEnd(words(i).tpe) || words(i).len <= shortword))
              break3 = true
            else i -= 1
          }
        }
        val poseShort = noEnd(words(pose).tpe) || words(pose).len <= shortword
        val besteShort = bestlen >= 0 &&
          (noEnd(words(beste).tpe) || words(beste).len <= shortword)
        if (bestlen < 0 || (poslen > bestlen && !poseShort) ||
            (bestlen >= 0 && !poseShort && besteShort)) {
          bestb = posb
          beste = pose
          bestlen = poslen
        }
        p += 1
        cover = hlCover(words, q, p)
      }
    }
    if (bestlen < 0) { // no cover: show the first min_words
      var curlen = 0
      var pose = 0
      var i = 0
      while (i < words.length && curlen < minWords) {
        if (!nonWord(words(i).tpe)) curlen += 1
        pose = i
        i += 1
      }
      bestb = 0
      beste = pose
    }
    markRange(words, highlight, bestb, beste)
  }

  private final case class Cover(var startpos: Int, var endpos: Int,
    var curlen: Int, var poslen: Int, var in: Boolean, var excluded: Boolean)

  /** get_next_fragment (:1931). */
  private def nextFragment(words: Array[Word], sp: Int, ep: Int,
      maxWords: Int): (Int, Int, Int, Int) = {
    var startpos = sp
    var i = sp
    var found = false
    while (!found && i <= ep) {
      startpos = i
      if (words(i).item >= 0 && !words(i).repeated) found = true else i += 1
    }
    var curlen = 0
    var poslen = 0
    i = startpos
    while (i <= ep && curlen < maxWords) {
      if (!nonWord(words(i).tpe)) curlen += 1
      if (words(i).item >= 0 && !words(i).repeated) poslen += 1
      i += 1
    }
    var endpos = ep
    if (ep > i) { // cover was cut: retreat endpos to a query item
      endpos = i
      var j = endpos
      var stop = false
      while (!stop && j >= startpos) {
        endpos = j
        if (words(j).item >= 0 && !words(j).repeated) stop = true
        else {
          if (!nonWord(words(j).tpe)) curlen -= 1
          j -= 1
        }
      }
    }
    (startpos, endpos, curlen, poslen)
  }

  /** mark_hl_fragments (:1976) — the MaxFragments>0 selector. */
  private def markFragments(words: Array[Word], q: Query, highlight: Boolean,
      shortword: Int, minWords: Int, maxWords: Int, maxFragments: Int): Unit = {
    val covers = scala.collection.mutable.ArrayBuffer.empty[Cover]
    var p = 0
    var c = hlCover(words, q, p)
    while (c != null) {
      p = c(0)
      val qq = c(1)
      var startpos = p
      var endpos = qq
      while (startpos <= endpos) {
        val (sp2, ep2, cl, pl) = nextFragment(words, startpos, endpos, maxWords)
        covers += Cover(sp2, ep2, cl, pl, in = false, excluded = false)
        startpos = ep2 + 1
        endpos = qq
      }
      p += 1
      c = hlCover(words, q, p)
    }

    var numF = 0
    var f = 0
    var done = false
    while (f < maxFragments && !done) {
      var maxitems = 0
      var minwords = Int.MaxValue
      var minI = -1
      var i = 0
      while (i < covers.length) {
        val cv = covers(i)
        if (!cv.in && !cv.excluded && (maxitems < cv.poslen ||
            (maxitems == cv.poslen && minwords > cv.curlen))) {
          maxitems = cv.poslen
          minwords = cv.curlen
          minI = i
        }
        i += 1
      }
      if (minI >= 0) {
        val cv = covers(minI)
        cv.in = true
        var startpos = cv.startpos
        var endpos = cv.endpos
        var curlen = cv.curlen
        if (curlen < maxWords) {
          val maxstretch = (maxWords - curlen) / 2
          // stretch start
          var stretch = 0
          var posmarker = startpos
          var j = startpos - 1
          while (j >= 0 && stretch < maxstretch && !words(j).in) {
            if (!nonWord(words(j).tpe)) { curlen += 1; stretch += 1 }
            posmarker = j
            j -= 1
          }
          // trim leading short/noend tokens
          j = posmarker
          while (j < startpos &&
              (noEnd(words(j).tpe) || words(j).len <= shortword)) {
            if (!nonWord(words(j).tpe)) curlen -= 1
            j += 1
          }
          startpos = j
          // stretch end
          posmarker = endpos
          j = endpos + 1
          while (j < words.length && curlen < maxWords && !words(j).in) {
            if (!nonWord(words(j).tpe)) curlen += 1
            posmarker = j
            j += 1
          }
          // trim trailing short/noend tokens
          j = posmarker
          while (j > endpos &&
              (noEnd(words(j).tpe) || words(j).len <= shortword)) {
            if (!nonWord(words(j).tpe)) curlen -= 1
            j -= 1
          }
          endpos = j
        }
        cv.startpos = startpos
        cv.endpos = endpos
        cv.curlen = curlen
        markRange(words, highlight, startpos, endpos)
        numF += 1
        var k = 0
        while (k < covers.length) {
          val o = covers(k)
          if (k != minI &&
              ((o.startpos >= startpos && o.startpos <= endpos) ||
               (o.endpos >= startpos && o.endpos <= endpos)))
            o.excluded = true
          k += 1
        }
      } else done = true
      f += 1
    }

    if (numF <= 0) { // nothing marked: show the first min_words
      var curlen = 0
      var endpos = 0
      var i = 0
      while (i < words.length && curlen < minWords) {
        if (!nonWord(words(i).tpe)) curlen += 1
        endpos = i
        i += 1
      }
      markRange(words, highlight, 0, endpos)
    }
  }

  /** generateHeadline (ts_parse.cpp). */
  private def render(words: Array[Word], startSel: String, stopSel: String,
      fragDelim: String): String = {
    val sb = new java.lang.StringBuilder()
    var infrag = false
    var numfragments = 0
    var i = 0
    while (i < words.length) {
      val w = words(i)
      if (w.in && !w.repeated) {
        if (!infrag) {
          infrag = true
          numfragments += 1
          if (numfragments > 1) sb.append(fragDelim)
        }
        if (w.replace) sb.append(' ')
        else if (!w.skip) {
          if (w.selected) sb.append(startSel)
          sb.append(w.text)
          if (w.selected) sb.append(stopSel)
        }
      } else if (!w.repeated) infrag = false
      i += 1
    }
    sb.toString
  }

  /** prsd_headline (:2266): defaults + validation + selector switch. */
  def headline(text: String, query: String, maxWords: Int = 35,
      minWords: Int = 15, shortWord: Int = 3, maxFragments: Int = 0,
      highlightAll: Boolean = false, startSel: String = "<b>",
      stopSel: String = "</b>", fragDelim: String = " ... "): String = {
    if (!highlightAll) {
      require(minWords < maxWords, "graft: MinWords should be less than MaxWords")
      require(minWords > 0, "graft: MinWords should be positive")
      require(shortWord >= 0, "graft: ShortWord should be >= 0")
      require(maxFragments >= 0, "graft: MaxFragments should be >= 0")
    }
    val q = new Query(FullText.parseQuery(query))
    val words = buildWords(text, q)
    if (maxFragments == 0)
      markWords(words, q, highlightAll, shortWord, minWords, maxWords)
    else
      markFragments(words, q, highlightAll, shortWord, minWords, maxWords,
        maxFragments)
    render(words, startSel, stopSel, fragDelim)
  }

  def headlineCol(text: Column, query: String, maxWords: Int = 35,
      minWords: Int = 15, shortWord: Int = 3, maxFragments: Int = 0,
      highlightAll: Boolean = false): Column =
    Bridge.column(TsHeadlineExpr(Bridge.expression(text), query, maxWords,
      minWords, shortWord, maxFragments, highlightAll))
}

/** ts_headline('english', text, query, options) as a per-row expression. */
case class TsHeadlineExpr(child: Expression, query: String, maxWords: Int,
    minWords: Int, shortWord: Int, maxFragments: Int, highlightAll: Boolean,
    startSel: String = "<b>", stopSel: String = "</b>",
    fragDelim: String = " ... ")
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "ts_headline"
  override def nullSafeEval(t: Any): Any =
    UTF8String.fromString(HeadlineDefault.headline(
      t.asInstanceOf[UTF8String].toString, query, maxWords, minWords,
      shortWord, maxFragments, highlightAll, startSel, stopSel, fragDelim))
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
