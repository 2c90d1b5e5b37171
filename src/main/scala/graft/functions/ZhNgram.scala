package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * The N-gram Chinese full-text parser (reference: src/common/backend/
 * tsearch/ts_zh_ngram.cpp — openGauss's self-contained CJK tokenizer;
 * `CREATE TEXT SEARCH CONFIGURATION ... PARSER = ngram`). Character
 * classes translate the reference's byte-range matrices to code
 * points (ts_zh_ngram.h:139-185, utf8_parser :225; ascii_matrix,
 * utf8_symbols_punctuation_matrix, fullwidth_ascii_variants_matrix
 * reproduced value-for-value):
 *
 *  - ASCII per ascii_matrix (digits 2, letters 3, blank 4, '.' and
 *    most brackets 6=punctuation, operators 7=graphic, control 0);
 *  - U+0080–U+07FF → graphic; U+2000–U+206E → punctuation (the
 *    reference's strict-< quirk leaves U+206F graphic — mirrored);
 *  - CJK Symbols & Punctuation U+3000–U+303F per its matrix
 *    (ideographic space U+3000 and U+303F are separators);
 *  - CJK Extension A U+3400–U+4DB5, Unified Ideographs U+4E00–U+9FD5,
 *    Extension B U+20000–U+2A6D6 → Chinese word chars;
 *  - Halfwidth/Fullwidth forms U+FF00–U+FFEF per their matrix
 *    (fullwidth digits/letters classify as digits/letters);
 *  - everything else → graphic symbol.
 *
 * Tokenization (ngramParser/cacheToken/packageTokenMulti): accepted
 * chars — zh word, digit, letter, radix point, plus punctuation /
 * graphic symbols unless ignored — accumulate into runs; blanks,
 * control chars and ignored classes close a run. A run of length ≥ n
 * emits its length−n+1 SLIDING n-grams (no shorter tail); a run
 * shorter than n emits once, whole. Every token is the reference's
 * MULTISYMBOL category. Defaults mirror the GUCs (guc_sql.cpp:1318,
 * guc.cpp:2730): n = 2 (1..4), punctuation ignored, graphic symbols
 * kept.
 */
object ZhNgram {

  // ascii_matrix (ts_zh_ngram.cpp:68) — 0 invisible, 2 digit,
  // 3 letter, 4 blank, 6 punctuation, 7 graphic
  private val asciiType: Array[Byte] = {
    val rows = Array(
      Array(0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0),
      Array(0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0),
      Array(4, 6, 6, 7, 7, 7, 7, 6, 6, 6, 7, 7, 6, 7, 6, 7),
      Array(2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 6, 6, 7, 7, 7, 6),
      Array(7, 3, 3, 3, 3, 3, 3, 3, 3, 3, 3, 3, 3, 3, 3, 3),
      Array(3, 3, 3, 3, 3, 3, 3, 3, 3, 3, 3, 6, 7, 6, 7, 6),
      Array(6, 3, 3, 3, 3, 3, 3, 3, 3, 3, 3, 3, 3, 3, 3, 3),
      Array(3, 3, 3, 3, 3, 3, 3, 3, 3, 3, 3, 6, 7, 6, 7, 0))
    rows.flatten.map(_.toByte)
  }

  // utf8_symbols_punctuation_matrix (U+3000–U+303F)
  private val cjkPunctType: Array[Byte] = Array(
    0, 6, 6, 6, 7, 7, 7, 7, 6, 6, 6, 6, 6, 6, 6, 6,
    6, 6, 7, 7, 6, 6, 6, 6, 6, 6, 6, 6, 6, 6, 6, 6,
    7, 7, 7, 7, 7, 7, 7, 7, 7, 7, 7, 7, 7, 7, 7, 7,
    7, 7, 7, 7, 7, 7, 7, 7, 7, 7, 7, 7, 7, 7, 7, 0).map(_.toByte)

  // fullwidth_ascii_variants_matrix (U+FF00–U+FFEF), flattened k = cp-0xFF00
  private val fullwidthType: Array[Byte] = Array(
    0, 6, 6, 7, 7, 7, 7, 6, 6, 6, 7, 7, 6, 7, 6, 7,
    2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 6, 6, 7, 7, 7, 6,
    7, 3, 3, 3, 3, 3, 3, 3, 3, 3, 3, 3, 3, 3, 3, 3,
    3, 3, 3, 3, 3, 3, 3, 3, 3, 3, 3, 6, 7, 6, 7, 7,
    7, 3, 3, 3, 3, 3, 3, 3, 3, 3, 3, 3, 3, 3, 3, 3,
    3, 3, 3, 3, 3, 3, 3, 3, 3, 3, 3, 6, 7, 6, 7, 7,
    7, 6, 6, 6, 6, 6, 7, 7, 7, 7, 7, 7, 7, 7, 7, 7,
    7, 7, 7, 7, 7, 7, 7, 7, 7, 7, 7, 7, 7, 7, 7, 7,
    7, 7, 7, 7, 7, 7, 7, 7, 7, 7, 7, 7, 7, 7, 7, 7,
    7, 7, 7, 7, 7, 7, 7, 7, 7, 7, 7, 7, 7, 7, 7, 7,
    0, 7, 7, 7, 7, 7, 7, 7, 7, 7, 7, 7, 7, 7, 7, 7,
    7, 7, 7, 7, 7, 7, 7, 7, 7, 7, 7, 7, 7, 7, 7, 0,
    0, 0, 7, 7, 7, 7, 7, 7, 0, 0, 7, 7, 7, 7, 7, 7,
    0, 0, 7, 7, 7, 7, 7, 7, 0, 0, 7, 7, 7, 0, 0, 0,
    7, 7, 7, 7, 7, 7, 7, 0, 7, 7, 7, 7, 7, 7, 7, 0,
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0).map(_.toByte)

  /** Code point → char class (utf8_parser + gbk_ascii_parser). */
  def charType(cp: Int): Int =
    if (cp < 0x80) asciiType(cp)
    else if (cp < 0x800) 7
    else if (cp <= 0xFFFF) {
      if (cp < 0x2000) 7
      else if (cp < 0x206F) 6 // strict < — U+206F itself is graphic
      else if (cp < 0x3000) 7
      else if (cp <= 0x303F) cjkPunctType(cp - 0x3000)
      else if (cp < 0x3400) 7
      else if (cp <= 0x4DB5) 1
      else if (cp < 0x4E00) 7
      else if (cp <= 0x9FD5) 1
      else if (cp < 0xFF00) 7
      else if (cp <= 0xFFEF) fullwidthType(cp - 0xFF00)
      else 7
    }
    else if (cp >= 0x20000 && cp <= 0x2A6D6) 1
    else 7

  /** Tokenize per the reference's run + sliding-gram procedure. */
  def tokens(text: String, gramSize: Int, punctuationIgnore: Boolean,
      grapsymbolIgnore: Boolean): Seq[String] = {
    require(gramSize >= 1 && gramSize <= 4,
      "graft: ngram_gram_size must be between 1 and 4")
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val run = scala.collection.mutable.ArrayBuffer.empty[Int]
    def flush(): Unit = {
      if (run.nonEmpty) {
        if (run.length < gramSize) {
          val sb = new java.lang.StringBuilder()
          run.foreach(sb.appendCodePoint)
          out += sb.toString
        } else {
          var i = 0
          while (i + gramSize <= run.length) {
            val sb = new java.lang.StringBuilder()
            var j = 0
            while (j < gramSize) { sb.appendCodePoint(run(i + j)); j += 1 }
            out += sb.toString
            i += 1
          }
        }
        run.clear()
      }
    }
    var i = 0
    while (i < text.length) {
      val cp = text.codePointAt(i)
      val t = charType(cp)
      val accepted = t match {
        case 1 | 2 | 3 | 5 => true
        case 6 => !punctuationIgnore
        case 7 => !grapsymbolIgnore
        case _ => false // blank / control / invisible
      }
      if (accepted) run += cp else flush()
      i += Character.charCount(cp)
    }
    flush()
    out.toSeq
  }

  /** Column form with the reference's GUC defaults. */
  def tokensCol(text: Column, gramSize: Int = 2,
      punctuationIgnore: Boolean = true,
      grapsymbolIgnore: Boolean = false): Column =
    Bridge.column(ZhNgramTokens(Bridge.expression(text), gramSize,
      punctuationIgnore, grapsymbolIgnore))

  /** The pound parser (ts_zh_pound.cpp; `PARSER = pound`): fields
    * split on a single delimiter character (reloption split_flag,
    * default '#'); each non-empty field is ONE whole token — no
    * grams, no char-class filtering (spaces and punctuation stay
    * inside fields). The reference compares the delimiter's first
    * byte only, so the delimiter is one ASCII char. */
  def poundTokens(text: String, splitFlag: Char = '#'): Seq[String] = {
    require(splitFlag < 0x80, "graft: pound split_flag must be one ASCII char")
    text.split(java.util.regex.Pattern.quote(splitFlag.toString), -1)
      .filter(_.nonEmpty).toSeq
  }

  /** Column form of the pound parser. */
  def poundTokensCol(text: Column, splitFlag: Char = '#'): Column = {
    require(splitFlag < 0x80, "graft: pound split_flag must be one ASCII char")
    org.apache.spark.sql.functions.filter(
      org.apache.spark.sql.functions.split(text,
        java.util.regex.Pattern.quote(splitFlag.toString), -1),
      x => org.apache.spark.sql.functions.length(x) > 0)
  }
}

/** to_tsvector('ngram', …)'s token stream as array<string>. */
case class ZhNgramTokens(child: Expression, gramSize: Int,
    punctuationIgnore: Boolean, grapsymbolIgnore: Boolean)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "zh_ngram_tokens"
  override def nullSafeEval(a: Any): Any =
    new GenericArrayData(ZhNgram.tokens(a.asInstanceOf[UTF8String].toString,
      gramSize, punctuationIgnore, grapsymbolIgnore)
      .map(UTF8String.fromString).toArray[Any])
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
