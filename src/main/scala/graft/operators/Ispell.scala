package graft.operators

/**
 * Ispell dictionary lexizer (reference: src/common/backend/tsearch/
 * spell.cpp — NIImportAffixes/NIImportDictionary parse,
 * NormalizeSubWord/SplitToVariants/NINormalizeWord lexize;
 * dict_ispell.cpp wires it as a text-search dictionary). Re-expressed
 * as a pure in-memory engine over the same old-format ispell files
 * the reference ships (tsearch/dicts/ispell_sample.{affix,dict});
 * the full tsdicts regress battery is pinned in IspellSpec.
 *
 * Semantics mirrored exactly:
 *  - affix flags: `*` = cross-product permitted, `~` = affix usable
 *    in compounds (and ONLY there — spell.cpp NIAddAffix widens
 *    COMPOUNDONLY to carry the begin/middle/last bits);
 *  - analysis order: the word itself, prefix-only strips, then per
 *    suffix (shortest first) the bare strip and prefix+suffix
 *    combinations, where a combination needs EITHER both affixes
 *    cross-product (then the base needs no affix flag at all —
 *    spell.cpp:2047's VoidString) or the base carrying the prefix's
 *    flag;
 *  - `compoundwords controlled <F>`: dictionary entries flagged <F>
 *    can form compounds; SplitToVariants enumerates decompositions
 *    (longest-alternative branches appended after the current
 *    variant), compound-only affixes bind pieces ('bally' = ball+y),
 *    and each variant's last stem must lexize in COMPOUNDLAST
 *    position for the variant to emit.
 *
 * The engine is a driver-built, broadcast-friendly immutable value:
 * lexize is a pure String → Option[Seq[String]] usable from any
 * executor-side kernel (the dictionary files are small config data;
 * 100 TB scaling is per-row map work, like every lexize stage).
 */
object Ispell {

  private val FfCompoundOnly = 0x01
  private val FfCompoundBegin = 0x02
  private val FfCompoundMiddle = 0x04
  private val FfCompoundLast = 0x08
  private val FfCompoundFlag = FfCompoundBegin | FfCompoundMiddle | FfCompoundLast
  private val FfCrossProduct = 0x40

  final case class Affix(flag: Char, flagflags: Int, isSuffix: Boolean,
      find: String, repl: String, mask: String) {
    val simple: Boolean = mask.isEmpty || mask == "."
    @transient lazy val maskRe: java.util.regex.Pattern =
      java.util.regex.Pattern.compile(
        if (isSuffix) s"^.*${mask.toLowerCase(java.util.Locale.ROOT)}$$" else s"^${mask.toLowerCase(java.util.Locale.ROOT)}.*$$")
    def crossProduct: Boolean = (flagflags & FfCrossProduct) != 0
  }

  final case class Entry(flags: Set[Char], compoundflag: Int)

  final case class Dict(words: Map[String, Entry], prefixes: Seq[Affix],
      suffixes: Seq[Affix], useCompound: Boolean,
      compoundAffixes: Seq[Affix]) extends Serializable {

    // every proper prefix of every dictionary word (the SPNode trie's
    // reachability); bounded by Σ word lengths — a per-level linear
    // scan of the word map would make lexize O(|dict|) per character
    @transient private lazy val livePrefixes: java.util.HashSet[String] = {
      val s = new java.util.HashSet[String]()
      for (w <- words.keysIterator; i <- 1 to w.length)
        s.add(w.substring(0, i))
      s
    }

    // ---- FindWord (spell.cpp:1915): affix-flag + compound-position check
    private def findWord(w: String, affixFlag: Option[Char], ctx: Int): Boolean =
      words.get(w).exists { e =>
        val compoundOk =
          if (ctx == 0) (e.compoundflag & FfCompoundOnly) == 0
          else (ctx & e.compoundflag) != 0
        compoundOk && affixFlag.forall(e.flags.contains)
      }

    // ---- CheckAffix (spell.cpp:1863): compound gating + strip + mask
    private def checkAffix(word: String, aff: Affix, ctx: Int,
        baselen: Int = -1): Option[String] = {
      if (ctx == 0) {
        if ((aff.flagflags & FfCompoundOnly) != 0) return None
      } else if ((ctx & FfCompoundBegin) != 0) {
        if ((aff.flagflags & FfCompoundBegin) == 0 && aff.isSuffix) return None
      } else if ((ctx & FfCompoundMiddle) != 0) {
        if ((aff.flagflags & FfCompoundMiddle) == 0) return None
      } else if ((ctx & FfCompoundLast) != 0) {
        if ((aff.flagflags & FfCompoundLast) == 0 && !aff.isSuffix) return None
      }
      val base =
        if (aff.isSuffix) {
          if (!word.endsWith(aff.repl)) return None
          word.dropRight(aff.repl.length) + aff.find
        } else {
          if (!word.startsWith(aff.repl)) return None
          // a word that is ONLY prefix+suffix is not a form (spell.cpp:1919)
          if (baselen >= 0 && baselen + aff.find.length <= aff.repl.length)
            return None
          aff.find + word.substring(aff.repl.length)
        }
      if (base.isEmpty) None
      else if (aff.simple || aff.maskRe.matcher(base).matches()) Some(base)
      else None
    }

    private def addTo(buf: scala.collection.mutable.ArrayBuffer[String],
        w: String): Unit =
      if (buf.isEmpty || buf.last != w) buf += w

    // ---- NormalizeSubWord (spell.cpp:1967)
    private[operators] def normalizeSub(word: String, ctx: Int): Seq[String] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      if (findWord(word, None, ctx)) addTo(out, word)
      // prefix-only forms
      for (p <- prefixes; base <- checkAffix(word, p, ctx))
        if (findWord(base, Some(p.flag), ctx)) addTo(out, base)
      // suffix forms, then prefix over the suffix-stripped base
      for (sfx <- suffixes; base <- checkAffix(word, sfx, ctx)) {
        if (findWord(base, Some(sfx.flag), ctx)) addTo(out, base)
        val baselen = word.length - sfx.repl.length
        for (p <- prefixes; base2 <- checkAffix(base, p, ctx, baselen)) {
          val needFlag =
            if (p.crossProduct && sfx.crossProduct) None else Some(p.flag)
          if (findWord(base2, needFlag, ctx)) addTo(out, base2)
        }
      }
      out.toSeq
    }

    // ---- SplitToVariants (spell.cpp:2145): all compound
    // decompositions, in the reference's CHAIN order — each call's
    // primary variant (the greedy shortest-stem continuation) comes
    // first, branch chains follow in the order they were linked;
    // branch recursion runs eagerly at link time so the shared
    // `notprobed` gating mutates in the reference's sequence
    private def splitVariants(word: String): Seq[Seq[String]] = {
      val notProbed = Array.fill(word.length)(true)

      def ctxAt(level: Int, startpos: Int): Int =
        if (level == 0) FfCompoundBegin
        else if (level == word.length - 1) FfCompoundLast
        else FfCompoundMiddle

      def walk(stems: Vector[String], startpos: Int, minpos: Int,
          fromTrie: Boolean): List[Vector[String]] = {
        val branches = scala.collection.mutable.ListBuffer.empty[List[Vector[String]]]
        var level = if (fromTrie) minpos else startpos
        var stemsV = stems
        var start = startpos
        var trieDead = false // PG: node == NULL — one MORE compound-affix
        //                      probe still runs at the next level before
        //                      the loop breaks (spell.cpp:2226's ordering)
        var done = false
        while (level < word.length && !done) {
          // compound-affix-bound piece (spell.cpp:2168): a compound
          // affix string sitting at `level` closes a piece that
          // includes it; the piece must lexize at its position
          if (level > start) {
            for (ca <- compoundAffixes
                 if word.length - level > ca.repl.length &&
                   word.startsWith(ca.repl, level)) {
              val lenaff = level - start + (if (ca.isSuffix) ca.repl.length else 0)
              if (notProbed(start + lenaff - 1) && level + lenaff - 1 > minpos) {
                val piece = word.substring(start, start + lenaff)
                val sub = normalizeSub(piece, ctxAt(level, start))
                if (sub.nonEmpty) {
                  notProbed(start + lenaff - 1) = false
                  // PG appends ALL normalizations of the piece as stems
                  branches += walk(stemsV ++ sub, start + lenaff,
                    start + lenaff, fromTrie = false)
                }
              }
            }
          }
          // dictionary-word piece via the trie walk
          val prefix = word.substring(start, level + 1)
          if (trieDead) {
            done = true
          } else if (!livePrefixes.contains(prefix)) {
            trieDead = true
          } else {
            val e = words.get(prefix)
            val ctx = ctxAt(level, start)
            if (e.exists(en => (en.compoundflag & ctx) != 0) && notProbed(level)) {
              if (level > minpos) {
                if (word.length == level + 1) {
                  return (stemsV :+ prefix) :: branches.toList.flatten
                } else {
                  // branch: keep searching a longer word from `start`
                  branches += walk(stemsV, start, level, fromTrie = true)
                  // ...and take this word as a stem
                  stemsV = stemsV :+ prefix
                  start = level + 1
                }
              }
            }
          }
          level += 1
        }
        (stemsV :+ word.substring(start)) :: branches.toList.flatten
      }

      walk(Vector.empty, 0, -1, fromTrie = false)
    }

    /** ts_lexize: None = word unknown to this dictionary. */
    def lexize(raw: String): Option[Seq[String]] = {
      val word = raw.toLowerCase(java.util.Locale.ROOT)
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      out ++= normalizeSub(word, 0)
      if (useCompound) {
        for (variant <- splitVariants(word) if variant.length > 1) {
          val lastForms = normalizeSub(variant.last, FfCompoundLast)
          for (lf <- lastForms) {
            out ++= variant.dropRight(1)
            out += lf
          }
        }
      }
      if (out.isEmpty) None else Some(out.toSeq)
    }
  }

  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graft.Bridge

  /** Column form: text → array<struct<lex,pos>> through the ispell +
    * simple-fallback chain (one compiled call per row). */
  def lexizeCol(text: Column, dict: Dict): Column =
    Bridge.column(IspellLexizeExpr(Bridge.expression(text), dict))

  /** Parse the old-format ispell affix + dict file CONTENTS (the
    * caller reads the files — config data, like PG's $SHAREDIR). */
  def load(affixText: String, dictText: String): Dict = {
    var suffixMode = false
    var prefixMode = false
    var useCompound = false
    var compoundFlags = Set.empty[Char]
    val prefixes = scala.collection.mutable.ArrayBuffer.empty[Affix]
    val suffixes = scala.collection.mutable.ArrayBuffer.empty[Affix]
    var curFlag = ' '
    var curFlagFlags = 0

    for (rawLine <- affixText.split("\n", -1)) {
      val line = rawLine.replaceAll("#.*$", "").trim
      val lower = line.toLowerCase(java.util.Locale.ROOT)
      if (line.isEmpty) ()
      else if (lower.startsWith("compoundwords")) {
        // `compoundwords controlled Z` (case-insensitive keyword scan)
        val s = line.split("\\s+")
        if (s.length >= 3 && s(1).equalsIgnoreCase("controlled")) {
          compoundFlags += s(2).head
          useCompound = true
        }
      }
      else if (lower.startsWith("suffixes")) { suffixMode = true; prefixMode = false }
      else if (lower.startsWith("prefixes")) { suffixMode = false; prefixMode = true }
      else if (lower.startsWith("flag")) {
        var s = line.substring(4).trim
        curFlagFlags = 0
        if (s.startsWith("*")) { curFlagFlags |= FfCrossProduct; s = s.substring(1) }
        else if (s.startsWith("~")) { curFlagFlags |= FfCompoundOnly; s = s.substring(1) }
        if (s.startsWith("\\")) s = s.substring(1)
        curFlag = s.head
        // NIAddAffix: compound-only affixes carry the position bits too
        if ((curFlagFlags & FfCompoundOnly) != 0 &&
            (curFlagFlags & FfCompoundFlag) == 0)
          curFlagFlags |= FfCompoundFlag
      }
      else if ((suffixMode || prefixMode) && line.contains(">")) {
        // `mask > repl` or `mask > -strip,add` (parse_affentry)
        val Array(maskPart, replPart) = line.split(">", 2).map(_.trim)
        val (find, repl) =
          if (replPart.startsWith("-")) {
            val body = replPart.substring(1)
            val comma = body.indexOf(',')
            if (comma >= 0) (body.substring(0, comma).trim.toLowerCase(java.util.Locale.ROOT),
              body.substring(comma + 1).trim.toLowerCase(java.util.Locale.ROOT))
            else (body.trim.toLowerCase(java.util.Locale.ROOT), "")
          } else ("", replPart.toLowerCase(java.util.Locale.ROOT))
        val aff = Affix(curFlag, curFlagFlags, suffixMode, find, repl,
          if (maskPart == ".") "" else maskPart)
        if (suffixMode) suffixes += aff else prefixes += aff
      }
    }

    val words = scala.collection.mutable.HashMap.empty[String, Entry]
    for (rawLine <- dictText.split("\n", -1)) {
      val line = rawLine.trim
      if (line.nonEmpty && !line.startsWith("#")) {
        val slash = line.indexOf('/')
        val (w, fl) =
          if (slash >= 0) (line.substring(0, slash).toLowerCase(java.util.Locale.ROOT),
            line.substring(slash + 1).toSet)
          else (line.toLowerCase(java.util.Locale.ROOT), Set.empty[Char])
        val cf = if (fl.exists(compoundFlags.contains)) FfCompoundFlag else 0
        words(w) = Entry(fl, cf)
      }
    }

    // analysis order = affix-trie level order: shortest repl first
    // (ties keep file order — Scala sortBy is stable)
    val sfx = suffixes.sortBy(_.repl.length).toSeq
    val pfx = prefixes.sortBy(_.repl.length).toSeq
    // CompoundAffix (NISortAffixes): compound-capable, non-empty repl
    val cmpAff = (pfx ++ sfx).filter(a =>
      (a.flagflags & FfCompoundFlag) != 0 && a.repl.nonEmpty)
    Dict(words.toMap, pfx, sfx, useCompound, cmpAff)
  }
}

/** Compiled ispell lexize over a document: whitespace tokens run
  * through the dictionary; recognized tokens emit ALL their lexemes
  * at the token's position (PG keeps every normalization — the
  * {booking,book} shape), unrecognized tokens fall through as their
  * lowercased selves (the `ispell, simple` two-dictionary
  * configuration tsdicts.out exercises). */
case class IspellLexizeExpr(
    child: org.apache.spark.sql.catalyst.expressions.Expression,
    dict: Ispell.Dict)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  import org.apache.spark.sql.catalyst.InternalRow
  import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
  import org.apache.spark.sql.catalyst.util.GenericArrayData
  import org.apache.spark.unsafe.types.UTF8String

  override def dataType: org.apache.spark.sql.types.DataType =
    graft.functions.StemLexemes.lexType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "ispell_lexize"

  def lex(t: UTF8String): GenericArrayData = {
    val toks = t.toLowerCase.toString.split("\\s+").filter(_.nonEmpty)
    val out = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
    var p = 0
    while (p < toks.length) {
      dict.lexize(toks(p)) match {
        case Some(ls) =>
          ls.foreach(l => out += InternalRow(UTF8String.fromString(l), p + 1))
        case None =>
          out += InternalRow(UTF8String.fromString(toks(p)), p + 1)
      }
      p += 1
    }
    new GenericArrayData(out.toArray[Any])
  }

  override def nullSafeEval(a: Any): Any = lex(a.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("ispellLex", this, classOf[IspellLexizeExpr].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.lex($a);")
  }
  override protected def withNewChildInternal(
      c: org.apache.spark.sql.catalyst.expressions.Expression)
      : org.apache.spark.sql.catalyst.expressions.Expression = copy(child = c)
}
