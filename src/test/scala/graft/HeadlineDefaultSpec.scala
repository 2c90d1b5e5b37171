package graft

import graft.operators.HeadlineDefault
import org.scalatest.funsuite.AnyFunSuite

/**
 * ts_headline over the default parser — the reference's own regress
 * battery (tsearch.sql/.out ts_headline cases) pinned verbatim:
 * single-fragment covers with stemming-driven matches, HighlightAll
 * over markup, MaxFragments fragment selection + stretching, the
 * no-match MinWords fallbacks and FragmentDelimiter.
 */
class HeadlineDefaultSpec extends AnyFunSuite {

  private val poem = "\nDay after day, day after day,\n  We stuck, nor breath nor motion,\nAs idle as a painted Ship\n  Upon a painted Ocean.\nWater, water, every where\n  And all the boards did shrink;\nWater, water, every where,\n  Nor any drop to drink.\nS. T. Coleridge (1772-1834)\n"

  private val html = "\n<html>\n<!-- some comment -->\n<body>\nSea view wow <u>foo bar</u> <i>qq</i>\n<a href=\"http://www.google.com/foo.bar.html\" target=\"_blank\">YES &nbsp;</a>\nff-bg\n<script>\n       document.write(15);\n</script>\n</body>\n</html>"

  test("single-fragment cover: paint&water") {
    assert(HeadlineDefault.headline(poem, "paint&water") ==
      "<b>painted</b> Ocean.\n<b>Water</b>, <b>water</b>, every where\n  And all the boards did shrink;\n<b>Water</b>, <b>water</b>, every")
  }

  test("single-fragment cover: breath&motion&water") {
    assert(HeadlineDefault.headline(poem, "breath&motion&water") ==
      "<b>breath</b> nor <b>motion</b>,\nAs idle as a painted Ship\n  Upon a painted Ocean.\n<b>Water</b>, <b>water</b>")
  }

  test("single-fragment cover: ocean") {
    assert(HeadlineDefault.headline(poem, "ocean") ==
      "<b>Ocean</b>.\nWater, water, every where\n  And all the boards did shrink;\nWater, water, every where")
  }

  test("HighlightAll over markup: sea&foo") {
    assert(HeadlineDefault.headline(html, "sea&foo", highlightAll = true) ==
      "\n<html>\n<!-- some comment -->\n<body>\n<b>Sea</b> view wow <u><b>foo</b> bar</u> <i>qq</i>\n<a href=\"http://www.google.com/foo.bar.html\" target=\"_blank\">YES &nbsp;</a>\nff-bg\n<script>\n       document.write(15);\n</script>\n</body>\n</html>")
  }

  test("MaxFragments=1: ocean") {
    assert(HeadlineDefault.headline(poem, "ocean", maxFragments = 1) ==
      "after day,\n  We stuck, nor breath nor motion,\nAs idle as a painted Ship\n  Upon a painted <b>Ocean</b>.\nWater, water, every where\n  And all the boards did shrink;\nWater, water, every where,\n  Nor any drop")
  }

  test("MaxFragments=2: Coleridge & stuck") {
    assert(HeadlineDefault.headline(poem, "Coleridge & stuck", maxFragments = 2) ==
      "after day, day after day,\n  We <b>stuck</b>, nor breath nor motion,\nAs idle as a painted Ship\n  Upon a painted Ocean.\nWater, water, every where\n  And all the boards did shrink;\nWater, water, every where ... drop to drink.\nS. T. <b>Coleridge</b>")
  }

  test("MaxFragments=1 with unmatched query falls back to MinWords") {
    assert(HeadlineDefault.headline(poem, "ocean & seahorse", maxFragments = 1) ==
      "\nDay after day, day after day,\n  We stuck, nor breath nor motion,\nAs idle as")
  }

  test("FragmentDelimiter option") {
    assert(HeadlineDefault.headline(poem, "Coleridge & stuck", maxFragments = 2, fragDelim = "***") ==
      "after day, day after day,\n  We <b>stuck</b>, nor breath nor motion,\nAs idle as a painted Ship\n  Upon a painted Ocean.\nWater, water, every where\n  And all the boards did shrink;\nWater, water, every where***drop to drink.\nS. T. <b>Coleridge</b>")
  }

  test("options validate like prsd_headline") {
    assertThrows[IllegalArgumentException](
      HeadlineDefault.headline("x", "x", minWords = 40))
    assertThrows[IllegalArgumentException](
      HeadlineDefault.headline("x", "x", minWords = 0))
    assertThrows[IllegalArgumentException](
      HeadlineDefault.headline("x", "x", shortWord = -1))
    assertThrows[IllegalArgumentException](
      HeadlineDefault.headline("x", "x", maxFragments = -1))
  }
}
