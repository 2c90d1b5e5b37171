package graft.operators

/**
 * Thesaurus text-search dictionary (reference: src/common/backend/
 * tsearch/dict_thesaurus.cpp; sample file tsearch/dicts/
 * thesaurus_sample.ths): multi-word sample phrases rewrite to
 * substitute phrases during lexizing, with every word — sample side
 * at build time, substitute side at emit time — normalized by a
 * SUBDICTIONARY (the regress config uses english_stem → [[
 * graft.functions.Porter]]), `*`-marked substitutes bypassing it and
 * `?` matching any stopword.
 *
 * Matching is the reference's: at each token the LONGEST sample
 * phrase wins (LexizeExec's thesaurus lookahead); matched phrases
 * collapse to their substitutes, which occupy consecutive OUTPUT
 * positions; stopwords outside phrases emit nothing but still consume
 * an output position — exactly the to_tsvector('thesaurus_tst', …)
 * position arithmetic pinned in ThesaurusSpec.
 *
 * Scale shape: the dictionary is driver-built config data; lexize is
 * one pure pass per document (map-only at 100 TB, like every lexize
 * stage).
 */
object Thesaurus {

  /** One rule: normalized sample tokens ('?' = any stopword) →
    * substitute lexemes (already normalized / '*'-passthrough). */
  final case class Rule(sample: Vector[String], subst: Vector[String])

  final case class Dict(rules: Seq[Rule], stop: Set[String],
      stem: String => String, synonyms: Map[String, String])
      extends Serializable {

    private val maxLen = if (rules.isEmpty) 0 else rules.map(_.sample.length).max
    // group rules by first sample token for O(1) candidate lookup
    private val byFirst: Map[String, Seq[Rule]] = rules.groupBy(_.sample.head)

    private def norm(tok: String): String = {
      val syn = synonyms.getOrElse(tok, tok)
      if (stop.contains(syn)) "?" else stem(syn)
    }

    /** Lexize a whitespace-tokenized text into (lexeme, pos) with the
      * reference's output-position semantics. */
    def lexize(text: String): Seq[(String, Int)] = {
      val toks = text.toLowerCase(java.util.Locale.ROOT).split("\\s+").filter(_.nonEmpty).toVector
      val normed = toks.map(norm)
      val out = scala.collection.mutable.ArrayBuffer.empty[(String, Int)]
      var pos = 0
      var i = 0
      while (i < toks.length) {
        // longest sample phrase starting here (exact-token '?'-aware)
        val cands = byFirst.getOrElse(normed(i), Nil) ++
          (if (normed(i) == "?") Nil else byFirst.getOrElse("?", Nil))
        val hit = cands
          .filter(r => r.sample.length <= toks.length - i &&
            r.sample.indices.forall(j => r.sample(j) == normed(i + j) ||
              (r.sample(j) == "?" && normed(i + j) == "?")))
          .sortBy(-_.sample.length)
          .headOption
        hit match {
          case Some(r) =>
            for (s <- r.subst) { pos += 1; out += ((s, pos)) }
            i += r.sample.length
          case None =>
            pos += 1 // stopwords consume a position, emit nothing
            if (normed(i) != "?") out += ((normed(i), pos))
            i += 1
        }
      }
      out.toSeq
    }

    /** ts_lexize('thesaurus', w): single-token probe (the regress
      * note: ts_lexize cannot pass more than one word). */
    def lexizeWord(w: String): Option[Seq[String]] = {
      val n = norm(w.toLowerCase(java.util.Locale.ROOT))
      byFirst.getOrElse(n, Nil).find(_.sample.length == 1).map(_.subst)
    }
  }

  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graft.Bridge

  /** Column form: text → array<struct<lex,pos>> through the thesaurus
    * chain (one compiled call per row — the StemLexemes idiom). */
  def lexizeCol(text: Column, dict: Dict): Column =
    Bridge.column(ThesaurusLexizeExpr(Bridge.expression(text), dict))

  /** Parse a .ths file: `sample words : substitute words`, '#'
    * comments, '*word' = don't lexize that substitute. Sample and
    * unstarred substitute words normalize through the subdictionary
    * at load (dict_thesaurus.cpp compileTheLexeme/compileTheSubstitute). */
  def load(thsText: String, stop: Set[String], stem: String => String,
      synonyms: Map[String, String] = Map.empty): Dict = {
    def norm(tok: String): String = {
      val syn = synonyms.getOrElse(tok, tok)
      if (tok == "?") "?" else if (stop.contains(syn)) "?" else stem(syn)
    }
    val rules = thsText.split("\n", -1).toSeq
      .map(_.replaceAll("#.*$", "").trim.toLowerCase(java.util.Locale.ROOT))
      .filter(l => l.nonEmpty && l.contains(":"))
      .map { l =>
        val Array(lhs, rhs) = l.split(":", 2)
        val sample = lhs.trim.split("\\s+").filter(_.nonEmpty)
          .map(norm).toVector
        val subst = rhs.trim.split("\\s+").filter(_.nonEmpty).toVector
          .map(w => if (w.startsWith("*")) w.substring(1) else stem(w))
        Rule(sample, subst)
      }
    Dict(rules, stop, stem, synonyms)
  }
}

/** Compiled thesaurus lexize: array<struct<lex,pos>> per document. */
case class ThesaurusLexizeExpr(child: org.apache.spark.sql.catalyst.expressions.Expression,
    dict: Thesaurus.Dict)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  import org.apache.spark.sql.catalyst.InternalRow
  import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
  import org.apache.spark.sql.catalyst.util.GenericArrayData
  import org.apache.spark.unsafe.types.UTF8String

  override def dataType: org.apache.spark.sql.types.DataType =
    graft.functions.StemLexemes.lexType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "thesaurus_lexize"

  def lex(t: UTF8String): GenericArrayData =
    new GenericArrayData(dict.lexize(t.toString).map { case (l, p) =>
      InternalRow(UTF8String.fromString(l), p) }.toArray[Any])

  override def nullSafeEval(a: Any): Any = lex(a.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("thsLex", this, classOf[ThesaurusLexizeExpr].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.lex($a);")
  }
  override protected def withNewChildInternal(
      c: org.apache.spark.sql.catalyst.expressions.Expression)
      : org.apache.spark.sql.catalyst.expressions.Expression = copy(child = c)
}
