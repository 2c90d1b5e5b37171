package graft

import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

/** Within-doc word-entropy quality stage: closed-form cases + the
  * shared-log-table discipline. */
class TextEntropySpec extends SparkSpec with Matchers {
  import spark.implicits._

  private def entropyOf(text: String): (Long, Long, Long, Double, Double) = {
    val r = TextAnalysis.entropyStats(
      Seq((1L, text)).toDF("doc_id", "text"), "doc_id", "text").collect()(0)
    (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5))
  }

  test("uniform doc: H = log2(k) exactly (quantization cancels)") {
    // 4 distinct words once each: H = log2 4 = 2; c=1 → c·log2c = 0
    val (n, nt, mx, ttr, h) = entropyOf("a b c d")
    assert((n, nt, mx) === (4L, 4L, 1L))
    assert(ttr === 1.0)
    h shouldBe 2.0 +- 1e-9
  }

  test("constant doc: zero entropy, ttr collapses") {
    val (n, nt, mx, ttr, h) = entropyOf("spam spam spam spam spam spam spam spam")
    assert((n, nt, mx) === (8L, 1L, 8L))
    assert(ttr === 1.0 / 8.0)
    // H = log2 8 - (8·log2 8)/8 = 0, up to the 1e-6 quantization
    assert(math.abs(h) < 1e-5)
  }

  test("mixed doc matches the closed form") {
    // counts: a×4, b×2, c×1, d×1 (n=8)
    val (n, nt, mx, _, h) = entropyOf("a a a a b b c d")
    assert((n, nt, mx) === (8L, 4L, 4L))
    val expect = 3.0 - (4 * 2.0 + 2 * 1.0) / 8.0 // log2 8 − Σc·log2c / n
    h shouldBe expect +- 1e-5
  }

  test("readability: closed-form case") {
    // 16 words -> 2 pseudo-sentences; syllables: vowel runs, min 1
    val text = ("data " * 8 + "analytical " * 8).trim // data=2 syl, analytical=5
    val r = TextAnalysis.readabilityStats(
      Seq((1L, text)).toDF("doc_id", "text"), "doc_id", "text").collect()(0)
    assert(r.getLong(1) === 16L) // words
    assert(r.getLong(2) === 8 * 2 + 8 * 5) // syllables: da-ta / a-na-ly-ti-cal runs
    assert(r.getLong(3) === 8L) // hard words (>= 3 vowel runs)
    assert(r.getLong(4) === 2L) // sentences
    val w = 16.0; val s = 2.0; val syl = 56.0
    val fre = 206.835 - 1.015 * (w / s) - 84.6 * (syl / w)
    r.getDouble(5) shouldBe fre +- 1e-9
  }

  test("log table covers the corpus and the oracle text is aligned") {
    assert(TextAnalysis.Log2Table.length === 128)
    assert(TextAnalysis.Log2Table.head === 0.0)
    val sql = TextAnalysis.log2ValuesSql
    assert(sql.startsWith("(1, 0.0e0)"))
    assert(sql.contains(s"(128, ${TextAnalysis.Log2Table(127)}e0)"))
    // entropy is scale-free in doc order: shuffling rows changes nothing
    val docs = Seq((1L, "x y z x"), (2L, "p p q r"), (3L, "m"))
    val a = TextAnalysis.entropyStats(docs.toDF("doc_id", "text"), "doc_id", "text")
      .orderBy("doc_id").collect().map(_.toSeq)
    val b = TextAnalysis.entropyStats(
        docs.reverse.toDF("doc_id", "text").repartition(3), "doc_id", "text")
      .orderBy("doc_id").collect().map(_.toSeq)
    assert(a.toSeq === b.toSeq)
  }
}
