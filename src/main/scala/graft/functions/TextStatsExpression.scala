package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Single-pass text statistics for the D7–D9 text-analysis operators
 * (language-ID, quality scoring, token counting). One compiled scan of
 * the document replaces four interpreted higher-order `filter` passes
 * (language stopword hits), an `array_distinct`, a `regexp_replace`
 * (punctuation count) and a `regexp_extract_all` (BPE-ish count) — the
 * 25–95× HOF penalty documented in SURVEY §3.
 *
 * Field semantics exactly match the declarative formulation (and thus
 * the DuckDB oracles):
 *  - tokens: split(lower(text), ' ') with empty tokens kept
 *  - n_tokens / n_distinct: size and distinct-size of that array
 *  - sw_en/es/de/fr: stopword occurrences (duplicates counted)
 *  - n_chars: code-point count of the ORIGINAL text (builtin length)
 *  - punct: code points not matching [A-Za-z0-9 ]
 *  - bpe: tokens of [A-Za-z]+ | [0-9]+ | single non-alnum-non-space,
 *    i.e. letter runs, digit runs, one per other symbol
 */
case class TextStats(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("n_distinct", LongType, nullable = false),
    StructField("sw_en", IntegerType, nullable = false),
    StructField("sw_es", IntegerType, nullable = false),
    StructField("sw_de", IntegerType, nullable = false),
    StructField("sw_fr", IntegerType, nullable = false),
    StructField("n_chars", LongType, nullable = false),
    StructField("punct", LongType, nullable = false),
    StructField("bpe", LongType, nullable = false)))

  override def nullIntolerant: Boolean = true
  override def prettyName: String = "text_stats"

  override def nullSafeEval(a: Any): Any = {
    val raw = a.asInstanceOf[UTF8String]
    val s = raw.toString
    val toks = raw.toLowerCase.toString.split(" ", -1)

    val distinct = new java.util.HashSet[String](toks.length * 2)
    var swEn = 0; var swEs = 0; var swDe = 0; var swFr = 0
    var i = 0
    while (i < toks.length) {
      val t = toks(i)
      distinct.add(t)
      if (TextStats.en.contains(t)) swEn += 1
      if (TextStats.es.contains(t)) swEs += 1
      if (TextStats.de.contains(t)) swDe += 1
      if (TextStats.fr.contains(t)) swFr += 1
      i += 1
    }

    var nChars = 0L; var punct = 0L; var bpe = 0L
    // 0 = none/space, 1 = in letter run, 2 = in digit run
    var run = 0
    var p = 0
    while (p < s.length) {
      val cp = s.codePointAt(p)
      nChars += 1
      val letter = (cp >= 'A' && cp <= 'Z') || (cp >= 'a' && cp <= 'z')
      val digit = cp >= '0' && cp <= '9'
      if (letter) { if (run != 1) bpe += 1; run = 1 }
      else if (digit) { if (run != 2) bpe += 1; run = 2 }
      else if (cp == ' ') { run = 0 }
      else { punct += 1; bpe += 1; run = 0 }
      p += Character.charCount(cp)
    }

    InternalRow(toks.length.toLong, distinct.size.toLong,
      swEn, swEs, swDe, swFr, nChars, punct, bpe)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object TextStats {
  // Shared verbatim with graft.operators.TextAnalysis.stopwords and the
  // DuckDB oracle lists — keep all three in sync.
  private val en = java.util.Set.of("the", "a", "of", "and", "to", "in", "is", "that")
  private val es = java.util.Set.of("el", "la", "de", "los", "las", "y", "que", "en")
  private val de = java.util.Set.of("der", "die", "das", "und", "nicht", "ist", "von", "ein")
  private val fr = java.util.Set.of("le", "la", "les", "et", "de", "un", "une", "est")
}
