package graft

import graft.functions.Porter
import graft.operators.{Lexize, Thesaurus}
import org.scalatest.funsuite.AnyFunSuite

/**
 * Thesaurus dictionary pinned to the reference's own regress battery
 * (src/test/regress/expected/tsdicts.out: the thesaurus_tst
 * to_tsvector cases over tsearch/dicts/thesaurus_sample.ths, with
 * english_stem as the subdictionary and the synonym_tst
 * postgres→pgsql mapping in front).
 */
class ThesaurusSpec extends AnyFunSuite {

  private val ths =
    """one two three : *123
      |one two : *12
      |one : *1
      |two : *2
      |
      |supernovae stars : *sn
      |supernovae : *sn
      |booking tickets : order invitation cards
      |booking ? tickets : order invitation Cards
      |""".stripMargin

  private val stop: Set[String] = {
    import scala.jdk.CollectionConverters._
    Lexize.stopJava.asScala.toSet
  }

  private val dict = Thesaurus.load(ths, stop, Porter.stem,
    synonyms = Map("postgres" -> "pgsql", "postgresql" -> "pgsql"))

  private def tsv(text: String): Map[String, Seq[Int]] =
    dict.lexize(text).groupBy(_._1).map { case (l, ps) => l -> ps.map(_._2) }

  test("ts_lexize('thesaurus', 'one') = {1}") {
    assert(dict.lexizeWord("one") == Some(Seq("1")))
    assert(dict.lexizeWord("two") == Some(Seq("2")))
    assert(dict.lexizeWord("zebra").isEmpty)
  }

  test("to_tsvector: longest-match phrase collapse with output positions") {
    // tsdicts.out: '1':1,5 '12':3 '123':4 'pgsql':2
    assert(tsv("one postgres one two one two three one") ==
      Map("1" -> Seq(1, 5), "pgsql" -> Seq(2), "12" -> Seq(3), "123" -> Seq(4)))
  }

  test("to_tsvector: subdictionary-normalized samples match inflections") {
    // tsdicts.out: 'abbrev':10 'call':8 'new':4 'sn':1,9,11 'star':5 'usual':7
    assert(tsv("supernovae star is very new star and usually called " +
      "supernovae abbrevation sn") ==
      Map("sn" -> Seq(1, 9, 11), "new" -> Seq(4), "star" -> Seq(5),
        "usual" -> Seq(7), "call" -> Seq(8), "abbrev" -> Seq(10)))
  }

  test("to_tsvector: '?' matches any stopword inside a phrase") {
    // tsdicts.out: 'card':3,10 'invit':2,9 'like':6 'look':5 'order':1,8
    assert(tsv("Booking tickets is looking like a booking a tickets") ==
      Map("order" -> Seq(1, 8), "invit" -> Seq(2, 9), "card" -> Seq(3, 10),
        "look" -> Seq(5), "like" -> Seq(6)))
  }
}
