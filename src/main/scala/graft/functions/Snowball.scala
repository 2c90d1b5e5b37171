package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.DataType
import org.apache.spark.unsafe.types.UTF8String

/**
 * Snowball stemmer registry — the reference's text-search dictionaries
 * are language-keyed Snowball modules (src/common/backend/tsearch/
 * dict_snowball.c; `CREATE TEXT SEARCH DICTIONARY … TEMPLATE
 * snowball, language = swedish`). English is [[Porter]]; this adds
 * the published Snowball SWEDISH algorithm (snowballstem.org —
 * public specification) and makes the lexize chain language-keyed so
 * further languages are one registry entry.
 *
 * Swedish algorithm (three steps over R1, where R1 = region after the
 * first non-vowel following a vowel, adjusted to start no earlier
 * than position 3; vowels a e i o u y ä å ö):
 *  1. longest suffix among the ending list → delete; or 's' after a
 *     valid s-ending (b c d f g h j k l m n o p r t v y) → delete.
 *  2. suffix dd/gd/nn/dt/gt/kt/tt wholly in R1 → delete last letter.
 *  3. lig/ig/els in R1 → delete; löst → lös; fullt → full.
 */
object Snowball {

  trait Stemmer extends Serializable { def stem(word: String): String }

  object SwedishStemmer extends Stemmer {
    private val vowels = "aeiouyäåö"
    @inline private def isV(c: Char): Boolean = vowels.indexOf(c) >= 0

    // step 1 endings, checked longest-first
    private val step1 = Seq(
      "heterna", "hetens", "heter", "heten", "anden", "andet", "andes",
      "arnas", "ernas", "ornas", "arens", "arna", "erna", "orna", "ande",
      "arne", "aste", "aren", "ades", "erns", "ade", "are", "ern", "ens",
      "het", "ast", "ad", "en", "ar", "er", "or", "as", "es", "at", "a", "e")
    private val sEndings = "bcdfghjklmnoprtvy"

    private def r1Start(w: String): Int = {
      var i = 0
      while (i < w.length && !isV(w.charAt(i))) i += 1 // to first vowel
      while (i < w.length && isV(w.charAt(i))) i += 1  // to first non-vowel after
      val r = if (i >= w.length) w.length else i + 1
      math.max(r, math.min(3, w.length))
    }

    def stem(word: String): String = {
      if (word == null) return null
      var w = word.toLowerCase(java.util.Locale.ROOT)
      if (w.length <= 3) return w
      // step 1: longest among (ending list ∪ s-rule) inside R1
      val r1 = r1Start(w)
      val hit = step1.find(suf => w.endsWith(suf) && w.length - suf.length >= r1)
      hit match {
        case Some(suf) => w = w.substring(0, w.length - suf.length)
        case None =>
          if (w.endsWith("s") && w.length - 1 >= r1 && w.length >= 2 &&
              sEndings.indexOf(w.charAt(w.length - 2)) >= 0)
            w = w.substring(0, w.length - 1)
      }
      // step 2: double-consonant endings wholly in R1 → drop last letter
      val r2 = r1Start(w)
      if (w.length - 2 >= r2 &&
          Seq("dd", "gd", "nn", "dt", "gt", "kt", "tt").exists(w.endsWith))
        w = w.substring(0, w.length - 1)
      // step 3 (suffix wholly in R1)
      val r3 = r1Start(w)
      if (w.endsWith("fullt") && w.length - 5 >= r3)
        w = w.substring(0, w.length - 1) // fullt → full
      else if (w.endsWith("löst") && w.length - 4 >= r3)
        w = w.substring(0, w.length - 1) // löst → lös
      else {
        val del = Seq("lig", "els", "ig").find(suf =>
          w.endsWith(suf) && w.length - suf.length >= r3)
        del.foreach(suf => w = w.substring(0, w.length - suf.length))
      }
      w
    }
  }

  private object EnglishStemmer extends Stemmer {
    def stem(word: String): String = Porter.stem(word)
  }

  /** Language registry (dict_snowball.c's language parameter). */
  def stemmer(lang: String): Stemmer = lang.toLowerCase(java.util.Locale.ROOT) match {
    case "english" => EnglishStemmer
    case "swedish" => SwedishStemmer
    case l => throw new IllegalArgumentException(
      s"graft: no snowball stemmer for language '$l'")
  }

  /**
   * dict_simple (src/common/backend/tsearch/dict_simple.cpp
   * dsimple_lexize): lowercase the token; a stopword (or empty) maps
   * to the EMPTY lexeme list — recognized, contributes nothing; a
   * non-stopword is accepted as-is when `accept` (the default), else
   * reported unrecognized (None — the token falls through to the next
   * dictionary in a chain).
   */
  def simpleLexize(token: String, stop: Set[String],
      accept: Boolean = true): Option[Seq[String]] = {
    val t = token.toLowerCase(java.util.Locale.ROOT)
    if (t.isEmpty || stop.contains(t)) Some(Seq.empty)
    else if (accept) Some(Seq(t))
    else None
  }
}

/** Language-keyed to_tsvector analogue: tokenize → stop-filter (the
  * caller supplies the language's stop list — PG ships them as config
  * files) → Snowball-stem, one compiled call per row; positions keep
  * stopword gaps exactly like [[StemLexemes]]. */
case class StemLexemesLang(child: Expression, lang: String,
    stop: Seq[String]) extends UnaryExpression {
  override def dataType: DataType = StemLexemes.lexType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = s"stem_lexemes_$lang"

  @transient private lazy val stemmer = Snowball.stemmer(lang)
  @transient private lazy val stopSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    stop.foreach(w => s.add(w.toLowerCase(java.util.Locale.ROOT)))
    s
  }

  def lexemes(text: UTF8String): GenericArrayData = {
    val toks = text.toLowerCase.toString.split(" ", -1)
    val out = new scala.collection.mutable.ArrayBuffer[InternalRow](toks.length)
    var p = 0
    while (p < toks.length) {
      val t = toks(p)
      if (t.nonEmpty && !stopSet.contains(t))
        out += InternalRow(UTF8String.fromString(stemmer.stem(t)), p + 1)
      p += 1
    }
    new GenericArrayData(out.toArray[Any])
  }

  override def nullSafeEval(a: Any): Any = lexemes(a.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("stemLexLang", this, classOf[StemLexemesLang].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.lexemes($a);")
  }
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
