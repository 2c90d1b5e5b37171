package graft

import graft.functions.Isn
import org.apache.spark.sql.functions._

/**
 * contrib/isn product family: check-digit laws, conversions, and
 * range-table hyphenation pinned to the reference's own worked
 * example (ISBN.h header: 0-393-04002-X <=> 978-0-393-04002-9) plus
 * the standard published ISSN/UPC examples.
 */
class IsnSpec extends SparkSpec {
  import spark.implicits._

  private def one(c: org.apache.spark.sql.Column): String =
    Seq(1).toDF("x").select(c.cast("string")).head().getString(0)

  test("ISBN-10 mod-11 check including the X case (ISBN.h worked example)") {
    assert(one(Isn.isbn10CheckChar(lit("039304002"))) == "X")
    assert(one(Isn.isbn10(lit("039304002"))) == "039304002X")
    assert(one(Isn.isbn10Valid(lit("039304002X"))) == "true")
    assert(one(Isn.isbn10Valid(lit("0393040021"))) == "false")
    // lowercase x accepted like the reference's case-folding input
    assert(one(Isn.isbn10Valid(lit("039304002x"))) == "true")
  }

  test("ISBN-10 <-> EAN-13 bookland conversion (978 expansion)") {
    assert(one(Isn.isbn10ToEan13(lit("039304002X"))) == "9780393040029")
    assert(one(Isn.ean13ToIsbn10(lit("9780393040029"))) == "039304002X")
    assert(one(Isn.ean13Valid(lit("9780393040029"))) == "true")
    // non-bookland EANs have no ISBN-10 form
    assert(one(isnull(Isn.ean13ToIsbn10(lit("9771436452006")))) == "true")
  }

  test("hyphenation via the embedded 978 group-0/1 publisher ranges") {
    assert(one(Isn.hyphenateIsbn13(lit("9780393040029"))) == "978-0-393-04002-9")
    assert(one(Isn.hyphenateIsbn10(lit("039304002X"))) == "0-393-04002-X")
    // 2-digit publisher (00-19) and 7-digit publisher (9500000-)
    assert(one(Isn.hyphenateIsbn13(lit("9780070000000"))) == "978-0-07-000000-0")
    assert(one(Isn.hyphenateIsbn13(lit("9780960000000"))) == "978-0-9600000-0-0")
    // group 1, 5-digit publisher range 55000-86979
    assert(one(Isn.hyphenateIsbn13(lit("9781550000000"))) == "978-1-55000-000-0")
    // outside the embedded groups: the reference's fall-through (plain)
    assert(one(Isn.hyphenateIsbn13(lit("9784000000000"))) == "9784000000000")
  }

  test("ISSN check + display + EAN expansion (977 payload + '00')") {
    assert(one(Isn.issnCheckChar(lit("1436452"))) == "2")
    assert(one(Isn.issn(lit("1436452"))) == "1436-4522")
    assert(one(Isn.issnValid(lit("14364522"))) == "true")
    assert(one(Isn.issnValid(lit("14364523"))) == "false")
    val ean = one(Isn.issnToEan13(lit("14364522")))
    assert(ean.startsWith("977143645200") && ean.length == 13)
    assert(one(Isn.ean13Valid(Isn.issnToEan13(lit("14364522")))) == "true")
    assert(one(Isn.ean13ToIssn(Isn.issnToEan13(lit("14364522")))) == "1436-4522")
  }

  test("ISMN check + the M-counts-as-3 EAN identity (ISMN.h worked example)") {
    // ISMN.h: M-3452-4680-5 <=> 9790345246805 <=> 979-0-3452-4680-5
    assert(one(Isn.ismnCheckDigit(lit("34524680"))) == "5")
    assert(one(Isn.ismn10(lit("34524680"))) == "M345246805")
    assert(one(Isn.ismn10Valid(lit("M345246805"))) == "true")
    assert(one(Isn.ismn10Valid(lit("M345246806"))) == "false")
    assert(one(Isn.ismn10Valid(lit("0345246805"))) == "false") // no M
    // check digit carries over unchanged into the 9790 expansion
    assert(one(Isn.ismn10ToEan13(lit("M345246805"))) == "9790345246805")
    assert(one(Isn.ean13Valid(lit("9790345246805"))) == "true")
    assert(one(Isn.ean13ToIsmn10(lit("9790345246805"))) == "M345246805")
    assert(one(isnull(Isn.ean13ToIsmn10(lit("9780393040029")))) == "true")
  }

  test("UPC check + the 0-prefix EAN relabel law") {
    // the classic published UPC example
    assert(one(Isn.upcCheckDigit(lit("03600029145"))) == "2")
    assert(one(Isn.upcValid(lit("036000291452"))) == "true")
    assert(one(Isn.upcValid(lit("036000291453"))) == "false")
    // UPC -> EAN-13 is a pure relabel: same check digit stays valid
    assert(one(Isn.upcToEan13(lit("036000291452"))) == "0036000291452")
    assert(one(Isn.ean13Valid(Isn.upcToEan13(lit("036000291452")))) == "true")
    assert(one(Isn.ean13ToUpc(lit("0036000291452"))) == "036000291452")
    assert(one(isnull(Isn.ean13ToUpc(lit("9780393040029")))) == "true")
  }
}
