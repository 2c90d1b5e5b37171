package graft

import graft.functions.Unaccent
import org.apache.spark.sql.functions._

/** Pins unaccent to the PG docs example and the rules-file expansions. */
class UnaccentSpec extends SparkSpec {
  import spark.implicits._

  private def un(s: String): String =
    Seq(s).toDF("t").select(Unaccent.unaccent(col("t"))).collect()(0).getString(0)

  test("PG docs example and common accents") {
    assert(un("Hôtel") === "Hotel")
    assert(un("café crème brûlée") === "cafe creme brulee")
    assert(un("ÀÉÎÕÜ àéîõü") === "AEIOU aeiou")
  }

  test("rules-file expansions ICU/NFD alone would miss") {
    assert(un("Æsir æther") === "AEsir aether")
    assert(un("œuvre Œuvre") === "oeuvre OEuvre")
    assert(un("größe ß") === "grosse ss")
    assert(un("øre Ørsted") === "ore Orsted")
    assert(un("łódź Łukasz") === "lodz Lukasz")
    assert(un("þorn Þing ðelta Ð") === "thorn THing delta D")
    assert(un("đavo Đavo") === "davo Davo")
  }

  test("translate table is aligned and idempotent") {
    assert(Unaccent.From.length === Unaccent.To.length)
    val all = Unaccent.From + Unaccent.Multi.map(_._1).mkString
    val once = un(all)
    assert(un(once) === once, "unaccent must be idempotent")
    assert(once.matches("[A-Za-z]+"), s"residual non-ASCII in: $once")
  }
}
