package graft

import graft.operators.Ispell
import org.scalatest.funsuite.AnyFunSuite

/**
 * Ispell dictionary lexize pinned to the reference's own regress
 * battery (src/test/regress/expected/tsdicts.out — the 15 ts_lexize
 * cases) over its shipped sample dictionary
 * (src/common/backend/tsearch/dicts/ispell_sample.{affix,dict},
 * reproduced below as fixture data).
 */
class IspellSpec extends AnyFunSuite {

  private val affix =
    """prefixes
      |
      |flag *B:
      |	.       >   RE      # As in enter > reenter
      |
      |flag U:
      |    .       >   UN      # As in natural > unnatural
      |
      |suffixes
      |
      |flag *J:
      |	[^E]    >   INGS        # As in cross > crossings
      |
      |flag *G:
      |	[^E]    >   ING     # As in cross > crossing
      |
      |flag *S:
      |	[^SXZHY]    >   S       # As in bat > bats
      |
      |flag *A:
      |	[^AEIOU]Y   >   -Y,IES      # As in imply > implies
      |
      |flag ~\\:
      |	[^Y]        >   Y              #~ advarsel > advarsely-
      |
      |compoundwords controlled Z
      |""".stripMargin

  private val dict =
    """book/GJUS
      |booking/SB
      |footballklubber
      |foot/ZS
      |football/Z
      |ball/SZ\
      |klubber/Z
      |sky/A
      |""".stripMargin

  private val d = Ispell.load(affix, dict)

  private def lex(w: String): Option[Seq[String]] = d.lexize(w)

  test("the tsdicts.out ts_lexize battery") {
    val want: Seq[(String, Option[Seq[String]])] = Seq(
      "skies" -> Some(Seq("sky")),
      "bookings" -> Some(Seq("booking", "book")),
      "booking" -> Some(Seq("booking", "book")),
      "foot" -> Some(Seq("foot")),
      "foots" -> Some(Seq("foot")),
      "rebookings" -> Some(Seq("booking", "book")),
      "rebooking" -> Some(Seq("booking", "book")),
      "rebook" -> None,
      "unbookings" -> Some(Seq("book")),
      "unbooking" -> Some(Seq("book")),
      "unbook" -> Some(Seq("book")),
      "footklubber" -> Some(Seq("foot", "klubber")),
      "footballklubber" -> Some(Seq("footballklubber", "foot", "ball",
        "klubber", "football", "klubber")),
      "ballyklubber" -> Some(Seq("ball", "klubber")),
      "footballyklubber" -> Some(Seq("foot", "ball", "klubber")))
    for ((w, exp) <- want)
      assert(lex(w) == exp, s"ts_lexize('ispell', '$w'): got ${lex(w)}, want $exp")
  }

  test("Column-level chain: ispell lexemes + simple fallback per token") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val r = Seq("Bookings footballklubber zebra").toDF("text")
      .select(Ispell.lexizeCol(col("text"), d).as("lex"))
      .selectExpr("transform(lex, x -> x.lex) AS l",
        "transform(lex, x -> x.pos) AS p").head()
    assert(r.getSeq[String](0) == Seq("booking", "book",
      "footballklubber", "foot", "ball", "klubber", "football", "klubber",
      "zebra"))
    // every lexeme of a token carries the TOKEN's position
    assert(r.getSeq[Int](1) == Seq(1, 1, 2, 2, 2, 2, 2, 2, 3))
  }

  test("unknown words are unknown, not empty") {
    assert(lex("zebra").isEmpty)
    assert(lex("rebook").isEmpty)
    // case folds like lowerstr
    assert(lex("SKIES") == Some(Seq("sky")))
  }
}
