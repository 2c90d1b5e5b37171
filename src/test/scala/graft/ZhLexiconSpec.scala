package graft

import graft.functions.ZhLexicon
import org.scalatest.funsuite.AnyFunSuite

/**
 * Lexicon-based CJK segmentation (the zhparser-style engine the
 * reference stubs out for lack of shipped dictionary data): forward
 * maximum matching over a caller-supplied lexicon, the classic
 * greedy-ambiguity cases, and the n-gram fallback composition.
 */
class ZhLexiconSpec extends AnyFunSuite {

  private def seg(text: String, words: String*): Seq[String] =
    ZhLexicon.tokens(text, ZhLexicon.build(words))

  test("forward maximum matching picks the longest word at each point") {
    assert(seg("数据库系统", "数据库", "数据", "系统") == Seq("数据库", "系统"))
    // without the longer entry, the stranded '库' is a short OOV run
    assert(seg("数据库系统", "数据", "系统") == Seq("数据", "库", "系统"))
    // full-phrase entry wins over its parts
    assert(seg("中华人民共和国", "中华", "人民", "共和国", "中华人民共和国") ==
      Seq("中华人民共和国"))
    assert(seg("中华人民共和国", "中华", "人民", "共和国") ==
      Seq("中华", "人民", "共和国"))
  }

  test("classic greedy ambiguity: FMM takes 和尚 over 和 + 尚未") {
    assert(seg("和尚未", "和尚", "尚未", "未", "和") == Seq("和尚", "未"))
  }

  test("out-of-lexicon stretches fall back to sliding n-grams") {
    assert(seg("数据库用户系统", "数据库", "系统") ==
      Seq("数据库", "用户", "系统"))
    assert(seg("数据库用户表系统", "数据库", "系统") ==
      Seq("数据库", "用户", "户表", "系统"))
    // trailing OOV shorter than the gram size emits whole
    assert(seg("数据库中", "数据库") == Seq("数据库", "中"))
    // gram size 1 degrades OOV to single characters
    assert(ZhLexicon.tokens("数据库用户", ZhLexicon.build(Seq("数据库")),
      gramSize = 1) == Seq("数据库", "用", "户"))
  }

  test("runs split on the same char classes as the ngram parser") {
    // the fullwidth comma breaks the run, so the cross-comma word
    // cannot match
    assert(seg("数据库，系统", "数据库系统", "数据库", "系统") ==
      Seq("数据库", "系统"))
    // ideographic space splits too
    assert(seg("数据　系统", "数据系统", "数据", "系统") ==
      Seq("数据", "系统"))
  }

  test("ascii runs segment through the same engine") {
    assert(seg("database", "data", "base") == Seq("data", "base"))
    assert(seg("databases", "data", "base") == Seq("data", "base", "s"))
    assert(seg("data base", "data", "base") == Seq("data", "base"))
  }

  test("live-prefix cutoff does not change results on near-miss probes") {
    assert(seg("abcdx", "abcde") == Seq("ab", "bc", "cd", "dx"))
    assert(seg("abcde", "abcde") == Seq("abcde"))
  }
}
