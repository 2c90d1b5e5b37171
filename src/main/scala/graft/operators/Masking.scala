package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Dynamic data masking — the openGauss security_plugin masking
 * function surface (reference: contrib/security_plugin/
 * security_plugin--1.0.sql, masking.cpp; the policy engine rewrites
 * SELECTed columns through these functions for non-privileged roles).
 *
 * Faithful pure-column re-expressions (every one codegen'd, map-only —
 * a 100 TB masking pass is a pure scan, exactly like the reference's
 * per-row function call):
 *
 *  - creditcardmasking: mask digits of all but the last 4 chars. The
 *    reference regex is `[\d+]` — a CHARACTER CLASS of digit-or-plus,
 *    not "one or more digits"; reproduced verbatim as [0-9+].
 *  - basicemailmasking: mask everything before the first '@'.
 *  - fullemailmasking: mask local part AND domain up to the last '.'.
 *  - alldigitsmasking: every digit (or '+', same class quirk) → letter.
 *  - maskall: the policy fallback (masking.cpp maskall_function) —
 *    repeat 'x' to the column's length.
 *  - regexpmasking: apply a regex replace to the [pos, pos+len) slice
 *    only, pass the rest through (masking.cpp regexp window form).
 *
 * The random ones (shufflemasking / randommasking) are nondeterministic
 * BY CONTRACT in the reference (pg random()); they have no place in a
 * hash-gated surface and callers wanting them should key on xxhash64.
 */
object Masking {

  /** Digit-or-plus class — the reference's literal `[\d+]`. */
  private val DigitClass = "[0-9+]"

  /** Mask digits of all but the last `keep` chars (default 4). */
  def creditcardmasking(col: Column, letter: String = "x",
      keep: Int = 4): Column =
    when(length(col) >= keep,
      concat(
        regexp_replace(col.substr(lit(1), length(col) - keep),
          DigitClass, letter),
        substring(col, -keep, keep)))
      .otherwise(col)

  /** Mask everything before the first '@' (kept if no '@' / at pos 1). */
  def basicemailmasking(col: Column, letter: String = "x"): Column = {
    val pos = instr(col, "@")
    when(pos > 1,
      concat(repeat(lit(letter), (pos - 1).cast("int")),
        col.substr(pos, length(col) - pos + 1)))
      .otherwise(col)
  }

  /** Mask local part and domain up to the LAST '.' — 'xxx@xxxx.org'. */
  def fullemailmasking(col: Column, letter: String = "x"): Column = {
    val pos = instr(col, "@")
    val dotPos = length(col) - instr(reverse(col), ".") + 1
    when(pos > 2 && dotPos > pos,
      concat(repeat(lit(letter), (pos - 1).cast("int")), lit("@"),
        repeat(lit(letter), (dotPos - pos - 1).cast("int")),
        col.substr(dotPos, length(col) - dotPos + 1)))
      .otherwise(col)
  }

  /** Replace every digit (and '+', the reference class) with `letter`. */
  def alldigitsmasking(col: Column, letter: String = "0"): Column =
    regexp_replace(col, DigitClass, letter)

  /** Replace the whole value with 'x' × length (policy fallback). */
  def maskall(col: Column, letter: String = "x"): Column =
    repeat(lit(letter), length(col).cast("int"))

  /**
   * Regex replace applied only to the [pos, pos+regLen) slice
   * (0-based pos, regLen < 0 = to end) — the reference's positional
   * window form, clamping exactly as the plpgsql body does.
   */
  def regexpmasking(col: Column, reg: String, replaceText: String,
      pos: Int = 0, regLen: Int = -1): Column = {
    val size = length(col)
    val startpos = least(greatest(lit(pos), lit(0)), size)
    val endpos0 = if (regLen < 0) size - 1 else startpos + regLen - 1
    val endpos = least(endpos0, size - 1)
    val lstr = col.substr(lit(1), startpos)
    val rstr = col.substr(endpos + 2, size - endpos - 1)
    val target = col.substr(startpos + 1, endpos - startpos + 1)
    concat(lstr, regexp_replace(target, reg, replaceText), rstr)
  }
}
