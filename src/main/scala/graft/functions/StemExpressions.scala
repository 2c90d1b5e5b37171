package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Compiled lexeme pipeline for the linguistic-normalization surface
 * (openGauss `to_tsvector('english', …)`; reference:
 * src/common/backend/tsearch/ts_parse.cpp LexizeExec — parser token →
 * stopword check → Snowball stem). Each expression runs the whole
 * tokenize → stop-filter → [[Porter]]-stem chain in ONE compiled
 * method per row (invoked from generated code, so whole-stage codegen
 * stays intact), never materializing intermediate arrays per stage.
 *
 * Position semantics match PG exactly: the parser numbers ALL tokens
 * 1-based; a stopword produces no lexeme but still consumes its
 * position, so lexeme positions keep gaps where stopwords sat.
 */
object StemLexemes {
  val lexType: DataType = ArrayType(StructType(Seq(
    StructField("lex", StringType, nullable = false),
    StructField("pos", IntegerType, nullable = false))), containsNull = false)
}

/** to_tsvector analogue: array<struct<lex,pos>> of stemmed non-stop
  * tokens with parser (raw, 1-based) positions. */
case class StemLexemes(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StemLexemes.lexType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "stem_lexemes"

  def lexemes(text: UTF8String): GenericArrayData = {
    val toks = text.toLowerCase.toString.split(" ", -1)
    val out = new scala.collection.mutable.ArrayBuffer[InternalRow](toks.length)
    var p = 0
    while (p < toks.length) {
      val t = toks(p)
      if (t.nonEmpty && !graft.operators.Lexize.stopJava.contains(t)) {
        out += InternalRow(UTF8String.fromString(Porter.stem(t)), p + 1)
      }
      p += 1
    }
    new GenericArrayData(out.toArray[Any])
  }

  override def nullSafeEval(a: Any): Any = lexemes(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("stemLexemes", this, classOf[StemLexemes].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.lexemes($a);")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/**
 * Per-document lexeme statistics against a fixed term list, in one
 * compiled scan: document length in lexemes, distinct lexeme count,
 * and the term frequency of each requested (already-stemmed) term —
 * the inputs ts_rank's contribution-table lookup and its
 * normalization bitmask need (tsrank.cpp calc_rank_or over a
 * stemmed tsvector).
 */
case class StemStats(child: Expression, terms: Seq[String]) extends UnaryExpression {
  require(terms.nonEmpty && terms.distinct == terms, "terms must be non-empty and distinct")

  override def dataType: DataType = StructType(Seq(
    StructField("n_lex", IntegerType, nullable = false),
    StructField("n_uniq", IntegerType, nullable = false),
    StructField("tfs", ArrayType(IntegerType, containsNull = false), nullable = false)))
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "stem_stats"

  @transient private lazy val idx: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer]()
    terms.zipWithIndex.foreach { case (t, i) => m.put(t, i) }
    m
  }

  def stats(text: UTF8String): InternalRow = {
    val toks = text.toLowerCase.toString.split(" ", -1)
    val seen = new java.util.HashSet[String](toks.length * 2)
    val tfs = new Array[Int](terms.length)
    var nLex = 0
    var p = 0
    while (p < toks.length) {
      val t = toks(p)
      if (t.nonEmpty && !graft.operators.Lexize.stopJava.contains(t)) {
        val s = Porter.stem(t)
        nLex += 1
        seen.add(s)
        val i = idx.get(s)
        if (i != null) tfs(i.intValue) += 1
      }
      p += 1
    }
    InternalRow(nLex, seen.size,
      new GenericArrayData(tfs.map(Integer.valueOf).toArray[Any]))
  }

  override def nullSafeEval(a: Any): Any = stats(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("stemStats", this, classOf[StemStats].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.stats($a);")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/**
 * to_tsvector proper: lexemes GROUPED by lexeme with sorted position
 * lists, entries sorted by lexeme — PG's tsvector value layout
 * (tsvector.c; entries are kept sorted for binary search). One
 * compiled pass; the tsvector manipulation surface (length, strip/
 * tsvector_to_array, ts_delete — tsvector_op.cpp) composes on top as
 * plain array functions.
 */
case class TsVector(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("lex", StringType, nullable = false),
    StructField("positions", ArrayType(IntegerType, containsNull = false),
      nullable = false))), containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "to_tsvector"

  def vector(text: UTF8String): GenericArrayData = {
    val toks = text.toLowerCase.toString.split(" ", -1)
    val m = new java.util.TreeMap[String, scala.collection.mutable.ArrayBuffer[Int]]()
    var p = 0
    while (p < toks.length) {
      val t = toks(p)
      if (t.nonEmpty && !graft.operators.Lexize.stopJava.contains(t)) {
        val s = Porter.stem(t)
        var b = m.get(s)
        if (b == null) { b = scala.collection.mutable.ArrayBuffer.empty[Int]; m.put(s, b) }
        b += p + 1
      }
      p += 1
    }
    val out = new Array[Any](m.size)
    val it = m.entrySet().iterator()
    var i = 0
    while (it.hasNext) {
      val e = it.next()
      out(i) = InternalRow(UTF8String.fromString(e.getKey),
        new GenericArrayData(e.getValue.toArray[Int].map(Integer.valueOf)
          .toArray[Any]))
      i += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(a: Any): Any = vector(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("toTsVector", this, classOf[TsVector].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.vector($a);")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/**
 * Stemmed tsquery FOLLOWED-BY — `lexA <N> lexB` evaluated against the
 * stemmed view of the document (the [[PhraseGapMatch]] device lifted
 * to lexemes): true iff raw token positions p_0 < p_1 < … exist with
 * p_j − p_{j−1} = gap_j and stem(token at p_j) = term_j. Distances
 * count PARSER positions, so a phrase compiled from free text with
 * stopwords ("value the table" → `valu <2> tabl`) matches across the
 * dropped stopword exactly as PG's phraseto_tsquery output does.
 * Terms must already be stemmed, non-stop lexemes.
 */
case class StemPhraseGapMatch(child: Expression, terms: Seq[String], gaps: Seq[Int])
    extends UnaryExpression {
  require(terms.nonEmpty, "phrase needs at least one term")
  require(gaps.length == terms.length - 1, "need one gap per adjacent term pair")
  require(gaps.forall(_ >= 1), "gaps must be >= 1")

  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "stem_phrase_gap_match"

  private val offsets: Array[Int] = gaps.scanLeft(0)(_ + _).toArray
  private val lowered: Array[String] = terms.map(_.toLowerCase).toArray

  def matches(text: UTF8String): Boolean = {
    val toks = text.toLowerCase.toString.split(" ", -1)
    val span = offsets(offsets.length - 1)
    val last = toks.length - 1 - span
    val stop = graft.operators.Lexize.stopJava
    var i = 0
    while (i <= last) {
      var j = 0
      var ok = true
      while (ok && j < lowered.length) {
        val t = toks(i + offsets(j))
        ok = t.nonEmpty && !stop.contains(t) && Porter.stem(t) == lowered(j)
        j += 1
      }
      if (ok) return true
      i += 1
    }
    false
  }

  override def nullSafeEval(a: Any): Any = matches(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("stemPhraseGapMatch", this,
      classOf[StemPhraseGapMatch].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.matches($a);")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
