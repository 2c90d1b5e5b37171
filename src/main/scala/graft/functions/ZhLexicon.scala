package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Lexicon-based CJK segmentation — the zhparser-style engine
 * (reference: src/common/backend/tsearch/ts_zh_zhparser.cpp, which the
 * reference ships as a DEPRECATED "not supported" stub because the
 * scws dictionary DATA is not distributed; the ENGINE below is the
 * published forward-maximum-matching procedure those parsers use,
 * data-independent and fed a caller-supplied lexicon — word lists are
 * config data, like stop lists).
 *
 * Semantics:
 *  - text splits into runs by the SAME char-class rules as the ngram
 *    parser (ZhNgram.charType — blanks/ignored classes break runs), so
 *    the two zh parsers compose;
 *  - inside a run, forward maximum matching: at each position take the
 *    LONGEST lexicon word that starts there (bounded by the lexicon's
 *    max word length, with a live-prefix cutoff so probing is not
 *    O(maxLen) per position on misses);
 *  - maximal out-of-lexicon stretches fall back to the D53 n-gram
 *    tokenizer (sliding grams, short runs whole) — the conventional
 *    OOV treatment, and what makes the engine total on any input.
 */
object ZhLexicon {

  /** Compiled lexicon: words in code-point form, max length, and the
    * set of proper prefixes (for the live-prefix probe cutoff). */
  final class Lexicon private[ZhLexicon] (
      private[ZhLexicon] val words: java.util.HashSet[String],
      private[ZhLexicon] val prefixes: java.util.HashSet[String],
      val maxLen: Int) extends Serializable

  /** Build a lexicon from caller-supplied words (whitespace-free). */
  def build(entries: Iterable[String]): Lexicon = {
    val words = new java.util.HashSet[String]()
    val prefixes = new java.util.HashSet[String]()
    var maxLen = 0
    entries.foreach { w =>
      val t = w.trim
      if (t.nonEmpty) {
        words.add(t)
        val n = t.codePointCount(0, t.length)
        if (n > maxLen) maxLen = n
        // proper prefixes, by code point
        var i = t.length - Character.charCount(t.codePointBefore(t.length))
        while (i > 0) {
          prefixes.add(t.substring(0, i))
          i -= Character.charCount(t.codePointBefore(i))
        }
      }
    }
    new Lexicon(words, prefixes, math.max(maxLen, 1))
  }

  /** Segment one run (code points `run[from, until)`) by FMM with
    * n-gram fallback, appending tokens to `out`. */
  private def segmentRun(run: Array[Int], from: Int, until: Int,
      lex: Lexicon, gramSize: Int, out: scala.collection.mutable.ArrayBuffer[String]): Unit = {
    def str(a: Int, b: Int): String = {
      val sb = new java.lang.StringBuilder(b - a)
      var i = a
      while (i < b) { sb.appendCodePoint(run(i)); i += 1 }
      sb.toString
    }
    def flushOov(a: Int, b: Int): Unit = if (b > a) {
      val n = b - a
      if (n < gramSize) out += str(a, b)
      else {
        var i = a
        while (i + gramSize <= b) { out += str(i, i + gramSize); i += 1 }
      }
    }
    var pos = from
    var oovStart = from
    while (pos < until) {
      // longest lexicon word starting here; the live-prefix set stops
      // the scan as soon as no word can extend the current probe
      var best = 0
      var len = 1
      var cont = true
      while (cont && len <= lex.maxLen && pos + len <= until) {
        val probe = str(pos, pos + len)
        if (lex.words.contains(probe)) best = len
        if (!lex.prefixes.contains(probe)) cont = false
        len += 1
      }
      if (best > 0) {
        flushOov(oovStart, pos)
        out += str(pos, pos + best)
        pos += best
        oovStart = pos
      } else pos += 1
    }
    flushOov(oovStart, until)
  }

  /** Tokenize: runs by ZhNgram char classes, FMM + ngram fallback. */
  def tokens(text: String, lex: Lexicon, gramSize: Int = 2,
      punctuationIgnore: Boolean = true,
      grapsymbolIgnore: Boolean = false): Seq[String] = {
    require(gramSize >= 1 && gramSize <= 4,
      "graft: ngram_gram_size must be between 1 and 4")
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val run = scala.collection.mutable.ArrayBuffer.empty[Int]
    def flush(): Unit = if (run.nonEmpty) {
      segmentRun(run.toArray, 0, run.length, lex, gramSize, out)
      run.clear()
    }
    var i = 0
    while (i < text.length) {
      val cp = text.codePointAt(i)
      val accepted = ZhNgram.charType(cp) match {
        case 1 | 2 | 3 | 5 => true
        case 6 => !punctuationIgnore
        case 7 => !grapsymbolIgnore
        case _ => false
      }
      if (accepted) run += cp else flush()
      i += Character.charCount(cp)
    }
    flush()
    out.toSeq
  }

  /** Column form; the lexicon ships to executors as a broadcast-sized
    * immutable value inside the expression (driver-built, like the
    * ispell/thesaurus dictionaries). */
  def tokensCol(text: Column, lex: Lexicon, gramSize: Int = 2,
      punctuationIgnore: Boolean = true,
      grapsymbolIgnore: Boolean = false): Column =
    Bridge.column(ZhLexiconTokens(Bridge.expression(text), lex, gramSize,
      punctuationIgnore, grapsymbolIgnore))
}

/** FMM token stream as array<string>. */
case class ZhLexiconTokens(child: Expression, lex: ZhLexicon.Lexicon,
    gramSize: Int, punctuationIgnore: Boolean, grapsymbolIgnore: Boolean)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "zh_lexicon_tokens"
  override def nullSafeEval(a: Any): Any =
    new GenericArrayData(ZhLexicon.tokens(a.asInstanceOf[UTF8String].toString,
      lex, gramSize, punctuationIgnore, grapsymbolIgnore)
      .map(UTF8String.fromString).toArray[Any])
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
