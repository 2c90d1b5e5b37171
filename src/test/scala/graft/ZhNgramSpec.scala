package graft

import graft.functions.ZhNgram
import org.scalatest.funsuite.AnyFunSuite

/**
 * N-gram Chinese FTS parser (ts_zh_ngram.cpp): run segmentation,
 * sliding grams, short-run whole emission, the char-class matrices,
 * and the GUC-default ignore flags — all hand-derived from the
 * reference's tables and emission procedure.
 */
class ZhNgramSpec extends AnyFunSuite {

  private def tok(s: String, n: Int = 2, punct: Boolean = true,
      grap: Boolean = false): Seq[String] =
    ZhNgram.tokens(s, n, punctuationIgnore = punct, grapsymbolIgnore = grap)

  test("CJK runs emit sliding bigrams; short runs emit whole") {
    assert(tok("数据库系统") == Seq("数据", "据库", "库系", "系统"))
    assert(tok("中") == Seq("中"))
    assert(tok("数据库系统", n = 3) == Seq("数据库", "据库系", "库系统"))
    // run of exactly gram size → one token, no shorter tail
    assert(tok("数据") == Seq("数据"))
    assert(tok("数据库", n = 4) == Seq("数据库")) // shorter than n → whole
  }

  test("punctuation splits by default, joins when kept") {
    // U+FF0C fullwidth comma = class 6 via the fullwidth matrix
    assert(tok("数据库，系统") == Seq("数据", "据库", "系统"))
    assert(tok("数据库，系统", punct = false) ==
      Seq("数据", "据库", "库，", "，系", "系统"))
    // ASCII '.' is class 6 too (ascii_matrix row 0x2X) — '3.14' splits
    assert(tok("3.14") == Seq("3", "14"))
    // U+3000 ideographic space is class 0 — always a separator
    assert(tok("数据　系统") == Seq("数据", "系统"))
  }

  test("ASCII letters/digits gram like any other accepted chars") {
    assert(tok("abc 123") == Seq("ab", "bc", "12", "23"))
    assert(tok("a") == Seq("a"))
    assert(tok("spark") == Seq("sp", "pa", "ar", "rk"))
    // graphic symbols kept by default, dropped when ignored
    assert(tok("a+b") == Seq("a+", "+b"))
    assert(tok("a+b", grap = true) == Seq("a", "b"))
  }

  test("fullwidth forms and astral CJK classify per the matrices") {
    // fullwidth digits are digits (matrix row 0xFF1X)
    assert(tok("１２３") == Seq("１２", "２３"))
    // CJK Extension B (U+20000..) are zh chars — surrogate-pair safe
    val extB = new String(Character.toChars(0x20000)) +
      new String(Character.toChars(0x20001))
    assert(tok(extB) == Seq(extB))
    // U+206F: the reference's strict-< quirk leaves it graphic (kept
    // by default), while U+2060 area is punctuation (ignored)
    assert(tok("中…中") == Seq("中", "中")) // … U+2026 punctuation
    assert(tok("中⁯中") == Seq("中⁯", "⁯中"))
  }

  test("pound parser: whole fields on the split char, empties dropped") {
    // ts_zh_pound.cpp: one MULTISYMBOL token per non-empty field; no
    // grams, no class filtering — spaces stay inside fields
    assert(ZhNgram.poundTokens("a b#c#数据 库") == Seq("a b", "c", "数据 库"))
    assert(ZhNgram.poundTokens("##x##") == Seq("x"))
    assert(ZhNgram.poundTokens("") == Seq.empty)
    assert(ZhNgram.poundTokens("a@b@c", splitFlag = '@') == Seq("a", "b", "c"))
    intercept[IllegalArgumentException](ZhNgram.poundTokens("x", '文'))
  }

  test("mixed CJK + ASCII text, the to_tsvector('ngram', …) shape") {
    assert(tok("spark数据库 x") ==
      Seq("sp", "pa", "ar", "rk", "k数", "数据", "据库", "x"))
    assert(tok("") == Seq.empty)
    assert(tok("  ") == Seq.empty)
  }
}
