package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * unaccent — the PG/openGauss diacritic-removal dictionary
 * (reference: contrib/unaccent/unaccent.rules — a flat map from
 * accented code points to base letters, applied by the unaccent text
 * search dictionary before matching).
 *
 * The rules file is exactly a substitution table, so the faithful
 * Spark shape is a compiled substitution expression, not a UDF:
 * multi-char expansions (æ→ae, ß→ss, þ→th ...) as a replace() chain
 * (they can't ride in translate's 1→1 map), then one translate() for
 * every 1→1 mapping. All built-ins → whole-stage codegen'd; a 100 TB
 * normalization pass is a pure scan.
 *
 * The table below is the Latin-script subset of the public rules
 * file (the full file also covers Greek/Cyrillic lookalikes the
 * synthetic corpus never contains).
 */
object Unaccent {

  // 1→1 mappings (unaccent.rules Latin block)
  private[graft] val From =
    "àáâãäåāăąçćĉċčďđèéêëēĕėęěĝğġģĥħìíîïĩīĭįıĵķĺļľŀłñńņňòóôõöøōŏőŕŗřśŝşšţťŧùúûüũūŭůűųŵýÿŷźżž" +
    "ÀÁÂÃÄÅĀĂĄÇĆĈĊČĎĐÈÉÊËĒĔĖĘĚĜĞĠĢĤĦÌÍÎÏĨĪĬĮİĴĶĹĻĽĿŁÑŃŅŇÒÓÔÕÖØŌŎŐŔŖŘŚŜŞŠŢŤŦÙÚÛÜŨŪŬŮŰŲŴÝŸŶŹŻŽ"
  private[graft] val To =
    "aaaaaaaaacccccddeeeeeeeeegggghhiiiiiiiiijklllllnnnnooooooooorrrsssstttuuuuuuuuuuwyyyzzz" +
    "AAAAAAAAACCCCCDDEEEEEEEEEGGGGHHIIIIIIIIIJKLLLLLNNNNOOOOOOOOORRRSSSSTTTUUUUUUUUUUWYYYZZZ"
  require(From.length == To.length)

  // 1→many expansions (can't ride in translate)
  private[graft] val Multi: Seq[(String, String)] = Seq(
    "Æ" -> "AE", "æ" -> "ae", "Œ" -> "OE", "œ" -> "oe",
    "ß" -> "ss", "Þ" -> "TH", "þ" -> "th", "Ð" -> "D", "ð" -> "d")

  /** Strip diacritics per the unaccent.rules table. */
  def unaccent(c: Column): Column = {
    val expanded = Multi.foldLeft(c) { case (acc, (a, b)) =>
      replace(acc, lit(a), lit(b))
    }
    translate(expanded, From, To)
  }
}
