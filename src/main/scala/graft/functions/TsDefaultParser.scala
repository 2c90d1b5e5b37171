package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * The DEFAULT text-search parser (reference: src/common/backend/tsearch/
 * wparser_def.cpp — `ts_parse('default', …)` / every `to_tsvector` call):
 * a table-driven pushdown automaton over 23 token types (asciiword, word,
 * numword, email, url, host, sfloat, version, hword_numpart, hword_part,
 * hword_asciipart, blank, tag, protocol, numhword, asciihword, hword,
 * url_path, file, float, int, uint, entity).
 *
 * The state/action tables (wparser_def.cpp:1015-1496) are pure data —
 * translated row-for-row, with the flag algebra (A_BINGO/A_POP/A_PUSH/
 * A_RERUN/A_CLEAR/A_MERGE/A_CLRALL, :438-446) and the TParserGet drive
 * loop (:1602-1757) re-expressed as an iterative Scala engine over
 * code points. The recursive char tests p_ishost/p_isURLPath (:917-958)
 * spawn bounded sub-parsers exactly like the reference's TParserCopyInit.
 *
 * Character classes mirror the reference's C-locale + UTF8 build (the
 * configuration its own regress outputs were produced under): for the
 * isalpha/isalnum tests any code point > 0x7F is a letter
 * (wparser_def.cpp:684-736 — "any non-ascii symbol with multibyte
 * encoding with C-locale is an alpha character"), while digit/space/
 * xdigit classes accept ASCII only (the p_iswhat macro masks to one
 * byte, :667-682). p_isspecial (:966-1010) = zero-display-width
 * (combining marks) or membership in the strange_letter table
 * (:105-338), ported verbatim.
 */
object TsDefaultParser {

  // token types (wparser_def.cpp:29-53)
  final val ASCIIWORD = 1
  final val WORD = 2
  final val NUMWORD = 3
  final val EMAIL = 4
  final val URL = 5
  final val HOST = 6
  final val SCIENTIFIC = 7
  final val VERSIONNUMBER = 8
  final val NUMPARTHWORD = 9
  final val PARTHWORD = 10
  final val ASCIIPARTHWORD = 11
  final val SPACE = 12
  final val TAG = 13
  final val PROTOCOL = 14
  final val NUMHWORD = 15
  final val ASCIIHWORD = 16
  final val HWORD = 17
  final val URLPATH = 18
  final val FILEPATH = 19
  final val DECIMAL = 20
  final val SIGNEDINT = 21
  final val UNSIGNEDINT = 22
  final val XMLENTITY = 23

  /** tok_alias (wparser_def.cpp:55-78); index 0 unused. */
  val alias: Array[String] = Array("", "asciiword", "word", "numword",
    "email", "url", "host", "sfloat", "version", "hword_numpart",
    "hword_part", "hword_asciipart", "blank", "tag", "protocol",
    "numhword", "asciihword", "hword", "url_path", "file", "float",
    "int", "uint", "entity")

  /** lex_descr (wparser_def.cpp:80-103); index 0 unused. */
  val description: Array[String] = Array("", "Word, all ASCII",
    "Word, all letters", "Word, letters and digits", "Email address",
    "URL", "Host", "Scientific notation", "Version number",
    "Hyphenated word part, letters and digits",
    "Hyphenated word part, all letters",
    "Hyphenated word part, all ASCII", "Space symbols", "XML tag",
    "Protocol head", "Hyphenated word, letters and digits",
    "Hyphenated word, all ASCII", "Hyphenated word, all letters",
    "URL path", "File or path name", "Decimal notation",
    "Signed integer", "Unsigned integer", "XML entity")

  /** ts_token_type('default') (prsd_lextype, wparser_def.cpp:1759):
    * (tokid, alias, description). */
  def tokenTypes: Seq[(Int, String, String)] =
    (1 to 23).map(i => (i, alias(i), description(i)))

  /** Token types the default ('english'-style) config maps to
    * dictionaries — everything except blank/tag/protocol/entity.
    * parsetext (ts_parse.cpp:314) bumps the lexeme position only for
    * mapped tokens, so these are the position-consuming types. */
  val positionalTypes: Set[Int] =
    (1 to 23).toSet -- Set(SPACE, TAG, PROTOCOL, XMLENTITY)

  private final val MAXENTRYPOS = 16383 // LIMITPOS, ts_type.h

  // action flags (wparser_def.cpp:438-446)
  private final val BINGO = 0x01
  private final val POPF = 0x02
  private final val PUSHF = 0x04
  private final val RERUN = 0x08
  private final val CLEARF = 0x10
  private final val MERGEF = 0x20
  private final val CLRALL = 0x40

  // char-class test ids (the p_is* functions, wparser_def.cpp:684-1010)
  private final val C_DEF = 0 // NULL isclass — always matches
  private final val C_EOF = 1
  private final val C_ASCLET = 2
  private final val C_ALPHA = 3
  private final val C_DIGIT = 4
  private final val C_ALNUM = 5
  private final val C_NOTALNUM = 6
  private final val C_SPACE = 7
  private final val C_XDIGIT = 8
  private final val C_EQ = 9
  private final val C_URLCHAR = 10
  private final val C_STOPHOST = 11
  private final val C_IGNORE = 12
  private final val C_HOST = 13
  private final val C_URLPATH = 14
  private final val C_SPECIAL = 15

  // special-handler ids (wparser_def.cpp:857-901)
  private final val S_NONE = 0
  private final val S_TAGS = 1 // SpecialTags
  private final val S_FURL = 2 // SpecialFURL
  private final val S_HYPH = 3 // SpecialHyphen
  private final val S_VERV = 4 // SpecialVerVersion

  // states, same order as the TParserState enum (wparser_def.cpp:340-419)
  private final val Base = 0
  private final val InNumWord = 1
  private final val InAsciiWord = 2
  private final val InWord = 3
  private final val InUnsignedInt = 4
  private final val InSignedIntFirst = 5
  private final val InSignedInt = 6
  private final val InSpace = 7
  private final val InUDecimalFirst = 8
  private final val InUDecimal = 9
  private final val InDecimalFirst = 10
  private final val InDecimal = 11
  private final val InVerVersion = 12
  private final val InSVerVersion = 13
  private final val InVersionFirst = 14
  private final val InVersion = 15
  private final val InMantissaFirst = 16
  private final val InMantissaSign = 17
  private final val InMantissa = 18
  private final val InXMLEntityFirst = 19
  private final val InXMLEntity = 20
  private final val InXMLEntityNumFirst = 21
  private final val InXMLEntityNum = 22
  private final val InXMLEntityHexNumFirst = 23
  private final val InXMLEntityHexNum = 24
  private final val InXMLEntityEnd = 25
  private final val InTagFirst = 26
  private final val InXMLBegin = 27
  private final val InTagCloseFirst = 28
  private final val InTagName = 29
  private final val InTagBeginEnd = 30
  private final val InTag = 31
  private final val InTagEscapeK = 32
  private final val InTagEscapeKK = 33
  private final val InTagBackSleshed = 34
  private final val InTagEnd = 35
  private final val InCommentFirst = 36
  private final val InCommentLast = 37
  private final val InComment = 38
  private final val InCloseCommentFirst = 39
  private final val InCloseCommentLast = 40
  private final val InCommentEnd = 41
  private final val InHostFirstDomain = 42
  private final val InHostDomainSecond = 43
  private final val InHostDomain = 44
  private final val InPortFirst = 45
  private final val InPort = 46
  private final val InHostFirstAN = 47
  private final val InHost = 48
  private final val InEmail = 49
  private final val InFileFirst = 50
  private final val InFileTwiddle = 51
  private final val InPathFirst = 52
  private final val InPathFirstFirst = 53
  private final val InPathSecond = 54
  private final val InFile = 55
  private final val InFileNext = 56
  private final val InURLPathFirst = 57
  private final val InURLPathStart = 58
  private final val InURLPath = 59
  private final val InFURL = 60
  private final val InProtocolFirst = 61
  private final val InProtocolSecond = 62
  private final val InProtocolEnd = 63
  private final val InHyphenAsciiWordFirst = 64
  private final val InHyphenAsciiWord = 65
  private final val InHyphenWordFirst = 66
  private final val InHyphenWord = 67
  private final val InHyphenNumWordFirst = 68
  private final val InHyphenNumWord = 69
  private final val InHyphenDigitLookahead = 70
  private final val InParseHyphen = 71
  private final val InParseHyphenHyphen = 72
  private final val InHyphenWordPart = 73
  private final val InHyphenAsciiWordPart = 74
  private final val InHyphenNumWordPart = 75
  private final val InHyphenUnsignedInt = 76
  private final val NULLSTATE = 77 // TPS_Null: "keep current state"

  /** One TParserStateActionItem. */
  private final case class It(cls: Int, c: Char, flags: Int, to: Int,
    tpe: Int, sp: Int)
  private def it(cls: Int, flags: Int, to: Int, tpe: Int = 0,
      sp: Int = S_NONE): It = It(cls, '\u0000', flags, to, tpe, sp)
  private def eq(c: Char, flags: Int, to: Int, tpe: Int = 0,
      sp: Int = S_NONE): It = It(C_EQ, c, flags, to, tpe, sp)
  private final val NEXT = 0 // A_NEXT

  /** The per-state action tables, row-for-row from
    * wparser_def.cpp:1015-1496 (order and duplicates preserved — the
    * POP-resume backtracking depends on item order). */
  private val actions: Array[Array[It]] = Array(
    /* Base */ Array(
      it(C_EOF, NEXT, NULLSTATE),
      eq('<', PUSHF, InTagFirst),
      it(C_IGNORE, NEXT, InSpace),
      it(C_ASCLET, NEXT, InAsciiWord),
      it(C_ALPHA, NEXT, InWord),
      it(C_DIGIT, NEXT, InUnsignedInt),
      eq('-', PUSHF, InSignedIntFirst),
      eq('+', PUSHF, InSignedIntFirst),
      eq('&', PUSHF, InXMLEntityFirst),
      eq('~', PUSHF, InFileTwiddle),
      eq('/', PUSHF, InFileFirst),
      eq('.', PUSHF, InPathFirstFirst),
      it(C_DEF, NEXT, InSpace)),
    /* InNumWord */ Array(
      it(C_EOF, BINGO, Base, NUMWORD),
      it(C_ALNUM, NEXT, InNumWord),
      it(C_SPECIAL, NEXT, InNumWord),
      eq('@', PUSHF, InEmail),
      eq('/', PUSHF, InFileFirst),
      eq('.', PUSHF, InFileNext),
      eq('-', PUSHF, InHyphenNumWordFirst),
      it(C_DEF, BINGO, Base, NUMWORD)),
    /* InAsciiWord */ Array(
      it(C_EOF, BINGO, Base, ASCIIWORD),
      it(C_ASCLET, NEXT, NULLSTATE),
      eq('.', PUSHF, InHostFirstDomain),
      eq('.', PUSHF, InFileNext),
      eq('-', PUSHF, InHostFirstAN),
      eq('-', PUSHF, InHyphenAsciiWordFirst),
      eq('_', PUSHF, InHostFirstAN),
      eq('@', PUSHF, InEmail),
      eq(':', PUSHF, InProtocolFirst),
      eq('/', PUSHF, InFileFirst),
      it(C_DIGIT, PUSHF, InHost),
      it(C_DIGIT, NEXT, InNumWord),
      it(C_ALPHA, NEXT, InWord),
      it(C_SPECIAL, NEXT, InWord),
      it(C_DEF, BINGO, Base, ASCIIWORD)),
    /* InWord */ Array(
      it(C_EOF, BINGO, Base, WORD),
      it(C_ALPHA, NEXT, NULLSTATE),
      it(C_SPECIAL, NEXT, NULLSTATE),
      it(C_DIGIT, NEXT, InNumWord),
      eq('-', PUSHF, InHyphenWordFirst),
      it(C_DEF, BINGO, Base, WORD)),
    /* InUnsignedInt */ Array(
      it(C_EOF, BINGO, Base, UNSIGNEDINT),
      it(C_DIGIT, NEXT, NULLSTATE),
      eq('.', PUSHF, InHostFirstDomain),
      eq('.', PUSHF, InUDecimalFirst),
      eq('e', PUSHF, InMantissaFirst),
      eq('E', PUSHF, InMantissaFirst),
      it(C_ASCLET, PUSHF, InHost),
      it(C_ALPHA, NEXT, InNumWord),
      it(C_SPECIAL, NEXT, InNumWord),
      eq('/', PUSHF, InFileFirst),
      it(C_DEF, BINGO, Base, UNSIGNEDINT)),
    /* InSignedIntFirst */ Array(
      it(C_EOF, POPF, NULLSTATE),
      it(C_DIGIT, NEXT | CLEARF, InSignedInt),
      it(C_DEF, POPF, NULLSTATE)),
    /* InSignedInt */ Array(
      it(C_EOF, BINGO, Base, SIGNEDINT),
      it(C_DIGIT, NEXT, NULLSTATE),
      eq('.', PUSHF, InDecimalFirst),
      eq('e', PUSHF, InMantissaFirst),
      eq('E', PUSHF, InMantissaFirst),
      it(C_DEF, BINGO, Base, SIGNEDINT)),
    /* InSpace */ Array(
      it(C_EOF, BINGO, Base, SPACE),
      eq('<', BINGO, Base, SPACE),
      it(C_IGNORE, NEXT, NULLSTATE),
      eq('-', BINGO, Base, SPACE),
      eq('+', BINGO, Base, SPACE),
      eq('&', BINGO, Base, SPACE),
      eq('/', BINGO, Base, SPACE),
      it(C_NOTALNUM, NEXT, InSpace),
      it(C_DEF, BINGO, Base, SPACE)),
    /* InUDecimalFirst */ Array(
      it(C_EOF, POPF, NULLSTATE),
      it(C_DIGIT, CLEARF, InUDecimal),
      it(C_DEF, POPF, NULLSTATE)),
    /* InUDecimal */ Array(
      it(C_EOF, BINGO, Base, DECIMAL),
      it(C_DIGIT, NEXT, InUDecimal),
      eq('.', PUSHF, InVersionFirst),
      eq('e', PUSHF, InMantissaFirst),
      eq('E', PUSHF, InMantissaFirst),
      it(C_DEF, BINGO, Base, DECIMAL)),
    /* InDecimalFirst */ Array(
      it(C_EOF, POPF, NULLSTATE),
      it(C_DIGIT, CLEARF, InDecimal),
      it(C_DEF, POPF, NULLSTATE)),
    /* InDecimal */ Array(
      it(C_EOF, BINGO, Base, DECIMAL),
      it(C_DIGIT, NEXT, InDecimal),
      eq('.', PUSHF, InVerVersion),
      eq('e', PUSHF, InMantissaFirst),
      eq('E', PUSHF, InMantissaFirst),
      it(C_DEF, BINGO, Base, DECIMAL)),
    /* InVerVersion */ Array(
      it(C_EOF, POPF, NULLSTATE),
      it(C_DIGIT, RERUN, InSVerVersion, 0, S_VERV),
      it(C_DEF, POPF, NULLSTATE)),
    /* InSVerVersion */ Array(
      it(C_EOF, POPF, NULLSTATE),
      it(C_DIGIT, BINGO | CLRALL, InUnsignedInt, SPACE),
      it(C_DEF, NEXT, NULLSTATE)),
    /* InVersionFirst */ Array(
      it(C_EOF, POPF, NULLSTATE),
      it(C_DIGIT, CLEARF, InVersion),
      it(C_DEF, POPF, NULLSTATE)),
    /* InVersion */ Array(
      it(C_EOF, BINGO, Base, VERSIONNUMBER),
      it(C_DIGIT, NEXT, InVersion),
      eq('.', PUSHF, InVersionFirst),
      it(C_DEF, BINGO, Base, VERSIONNUMBER)),
    /* InMantissaFirst */ Array(
      it(C_EOF, POPF, NULLSTATE),
      it(C_DIGIT, CLEARF, InMantissa),
      eq('+', NEXT, InMantissaSign),
      eq('-', NEXT, InMantissaSign),
      it(C_DEF, POPF, NULLSTATE)),
    /* InMantissaSign */ Array(
      it(C_EOF, POPF, NULLSTATE),
      it(C_DIGIT, CLEARF, InMantissa),
      it(C_DEF, POPF, NULLSTATE)),
    /* InMantissa */ Array(
      it(C_EOF, BINGO, Base, SCIENTIFIC),
      it(C_DIGIT, NEXT, InMantissa),
      it(C_DEF, BINGO, Base, SCIENTIFIC)),
    /* InXMLEntityFirst */ Array(
      it(C_EOF, POPF, NULLSTATE),
      eq('#', NEXT, InXMLEntityNumFirst),
      it(C_ASCLET, NEXT, InXMLEntity),
      eq(':', NEXT, InXMLEntity),
      eq('_', NEXT, InXMLEntity),
      it(C_DEF, POPF, NULLSTATE)),
    /* InXMLEntity */ Array(
      it(C_EOF, POPF, NULLSTATE),
      it(C_ALNUM, NEXT, InXMLEntity),
      eq(':', NEXT, InXMLEntity),
      eq('_', NEXT, InXMLEntity),
      eq('.', NEXT, InXMLEntity),
      eq('-', NEXT, InXMLEntity),
      eq(';', NEXT, InXMLEntityEnd),
      it(C_DEF, POPF, NULLSTATE)),
    /* InXMLEntityNumFirst */ Array(
      it(C_EOF, POPF, NULLSTATE),
      eq('x', NEXT, InXMLEntityHexNumFirst),
      eq('X', NEXT, InXMLEntityHexNumFirst),
      it(C_DIGIT, NEXT, InXMLEntityNum),
      it(C_DEF, POPF, NULLSTATE)),
    /* InXMLEntityNum */ Array(
      it(C_EOF, POPF, NULLSTATE),
      it(C_DIGIT, NEXT, InXMLEntityNum),
      eq(';', NEXT, InXMLEntityEnd),
      it(C_DEF, POPF, NULLSTATE)),
    /* InXMLEntityHexNumFirst */ Array(
      it(C_EOF, POPF, NULLSTATE),
      it(C_XDIGIT, NEXT, InXMLEntityHexNum),
      it(C_DEF, POPF, NULLSTATE)),
    /* InXMLEntityHexNum */ Array(
      it(C_EOF, POPF, NULLSTATE),
      it(C_XDIGIT, NEXT, InXMLEntityHexNum),
      eq(';', NEXT, InXMLEntityEnd),
      it(C_DEF, POPF, NULLSTATE)),
    /* InXMLEntityEnd */ Array(
      it(C_DEF, BINGO | CLEARF, Base, XMLENTITY)),
    /* InTagFirst */ Array(
      it(C_EOF, POPF, NULLSTATE),
      eq('/', PUSHF, InTagCloseFirst),
      eq('!', PUSHF, InCommentFirst),
      eq('?', PUSHF, InXMLBegin),
      it(C_ASCLET, PUSHF, InTagName),
      eq(':', PUSHF, InTagName),
      eq('_', PUSHF, InTagName),
      it(C_DEF, POPF, NULLSTATE)),
    /* InXMLBegin */ Array(
      it(C_EOF, POPF, NULLSTATE),
      eq('x', NEXT, InTag),
      it(C_DEF, POPF, NULLSTATE)),
    /* InTagCloseFirst */ Array(
      it(C_EOF, POPF, NULLSTATE),
      it(C_ASCLET, NEXT, InTagName),
      it(C_DEF, POPF, NULLSTATE)),
    /* InTagName */ Array(
      it(C_EOF, POPF, NULLSTATE),
      eq('/', NEXT, InTagBeginEnd),
      eq('>', NEXT, InTagEnd, 0, S_TAGS),
      it(C_SPACE, NEXT, InTag, 0, S_TAGS),
      it(C_ALNUM, NEXT, NULLSTATE),
      eq(':', NEXT, NULLSTATE),
      eq('_', NEXT, NULLSTATE),
      eq('.', NEXT, NULLSTATE),
      eq('-', NEXT, NULLSTATE),
      it(C_DEF, POPF, NULLSTATE)),
    /* InTagBeginEnd */ Array(
      it(C_EOF, POPF, NULLSTATE),
      eq('>', NEXT, InTagEnd),
      it(C_DEF, POPF, NULLSTATE)),
    /* InTag */ Array(
      it(C_EOF, POPF, NULLSTATE),
      eq('>', NEXT, InTagEnd, 0, S_TAGS),
      eq('\'', NEXT, InTagEscapeK),
      eq('"', NEXT, InTagEscapeKK),
      it(C_ASCLET, NEXT, NULLSTATE),
      it(C_DIGIT, NEXT, NULLSTATE),
      eq('=', NEXT, NULLSTATE),
      eq('-', NEXT, NULLSTATE),
      eq('_', NEXT, NULLSTATE),
      eq('#', NEXT, NULLSTATE),
      eq('/', NEXT, NULLSTATE),
      eq(':', NEXT, NULLSTATE),
      eq('.', NEXT, NULLSTATE),
      eq('&', NEXT, NULLSTATE),
      eq('?', NEXT, NULLSTATE),
      eq('%', NEXT, NULLSTATE),
      eq('~', NEXT, NULLSTATE),
      it(C_SPACE, NEXT, NULLSTATE, 0, S_TAGS),
      it(C_DEF, POPF, NULLSTATE)),
    /* InTagEscapeK */ Array(
      it(C_EOF, POPF, NULLSTATE),
      eq('\\', PUSHF, InTagBackSleshed),
      eq('\'', NEXT, InTag),
      it(C_DEF, NEXT, InTagEscapeK)),
    /* InTagEscapeKK */ Array(
      it(C_EOF, POPF, NULLSTATE),
      eq('\\', PUSHF, InTagBackSleshed),
      eq('"', NEXT, InTag),
      it(C_DEF, NEXT, InTagEscapeKK)),
    /* InTagBackSleshed */ Array(
      it(C_EOF, POPF, NULLSTATE),
      it(C_DEF, MERGEF, NULLSTATE)),
    /* InTagEnd */ Array(
      it(C_DEF, BINGO | CLRALL, Base, TAG)),
    /* InCommentFirst */ Array(
      it(C_EOF, POPF, NULLSTATE),
      eq('-', NEXT, InCommentLast),
      eq('D', NEXT, InTag),
      eq('d', NEXT, InTag),
      it(C_DEF, POPF, NULLSTATE)),
    /* InCommentLast */ Array(
      it(C_EOF, POPF, NULLSTATE),
      eq('-', NEXT, InComment),
      it(C_DEF, POPF, NULLSTATE)),
    /* InComment */ Array(
      it(C_EOF, POPF, NULLSTATE),
      eq('-', NEXT, InCloseCommentFirst),
      it(C_DEF, NEXT, NULLSTATE)),
    /* InCloseCommentFirst */ Array(
      it(C_EOF, POPF, NULLSTATE),
      eq('-', NEXT, InCloseCommentLast),
      it(C_DEF, NEXT, InComment)),
    /* InCloseCommentLast */ Array(
      it(C_EOF, POPF, NULLSTATE),
      eq('-', NEXT, NULLSTATE),
      eq('>', NEXT, InCommentEnd),
      it(C_DEF, NEXT, InComment)),
    /* InCommentEnd */ Array(
      it(C_DEF, BINGO | CLRALL, Base, TAG)),
    /* InHostFirstDomain */ Array(
      it(C_EOF, POPF, NULLSTATE),
      it(C_ASCLET, NEXT, InHostDomainSecond),
      it(C_DIGIT, NEXT, InHost),
      it(C_DEF, POPF, NULLSTATE)),
    /* InHostDomainSecond */ Array(
      it(C_EOF, POPF, NULLSTATE),
      it(C_ASCLET, NEXT, InHostDomain),
      it(C_DIGIT, PUSHF, InHost),
      eq('-', PUSHF, InHostFirstAN),
      eq('_', PUSHF, InHostFirstAN),
      eq('.', PUSHF, InHostFirstDomain),
      eq('@', PUSHF, InEmail),
      it(C_DEF, POPF, NULLSTATE)),
    /* InHostDomain */ Array(
      it(C_EOF, BINGO | CLRALL, Base, HOST),
      it(C_ASCLET, NEXT, InHostDomain),
      it(C_DIGIT, PUSHF, InHost),
      eq(':', PUSHF, InPortFirst),
      eq('-', PUSHF, InHostFirstAN),
      eq('_', PUSHF, InHostFirstAN),
      eq('.', PUSHF, InHostFirstDomain),
      eq('@', PUSHF, InEmail),
      it(C_DIGIT, POPF, NULLSTATE),
      it(C_STOPHOST, BINGO | CLRALL, InURLPathStart, HOST),
      eq('/', PUSHF, InFURL),
      it(C_DEF, BINGO | CLRALL, Base, HOST)),
    /* InPortFirst */ Array(
      it(C_EOF, POPF, NULLSTATE),
      it(C_DIGIT, NEXT, InPort),
      it(C_DEF, POPF, NULLSTATE)),
    /* InPort */ Array(
      it(C_EOF, BINGO | CLRALL, Base, HOST),
      it(C_DIGIT, NEXT, InPort),
      it(C_STOPHOST, BINGO | CLRALL, InURLPathStart, HOST),
      eq('/', PUSHF, InFURL),
      it(C_DEF, BINGO | CLRALL, Base, HOST)),
    /* InHostFirstAN */ Array(
      it(C_EOF, POPF, NULLSTATE),
      it(C_DIGIT, NEXT, InHost),
      it(C_ASCLET, NEXT, InHost),
      it(C_DEF, POPF, NULLSTATE)),
    /* InHost */ Array(
      it(C_EOF, POPF, NULLSTATE),
      it(C_DIGIT, NEXT, InHost),
      it(C_ASCLET, NEXT, InHost),
      eq('@', PUSHF, InEmail),
      eq('.', PUSHF, InHostFirstDomain),
      eq('-', PUSHF, InHostFirstAN),
      eq('_', PUSHF, InHostFirstAN),
      it(C_DEF, POPF, NULLSTATE)),
    /* InEmail */ Array(
      it(C_STOPHOST, POPF, NULLSTATE),
      it(C_HOST, BINGO | CLRALL, Base, EMAIL),
      it(C_DEF, POPF, NULLSTATE)),
    /* InFileFirst */ Array(
      it(C_EOF, POPF, NULLSTATE),
      it(C_ASCLET, NEXT, InFile),
      it(C_DIGIT, NEXT, InFile),
      eq('.', NEXT, InPathFirst),
      eq('_', NEXT, InFile),
      eq('~', PUSHF, InFileTwiddle),
      it(C_DEF, POPF, NULLSTATE)),
    /* InFileTwiddle */ Array(
      it(C_EOF, POPF, NULLSTATE),
      it(C_ASCLET, NEXT, InFile),
      it(C_DIGIT, NEXT, InFile),
      eq('_', NEXT, InFile),
      eq('/', NEXT, InFileFirst),
      it(C_DEF, POPF, NULLSTATE)),
    /* InPathFirst */ Array(
      it(C_EOF, POPF, NULLSTATE),
      it(C_ASCLET, NEXT, InFile),
      it(C_DIGIT, NEXT, InFile),
      eq('_', NEXT, InFile),
      eq('.', NEXT, InPathSecond),
      eq('/', NEXT, InFileFirst),
      it(C_DEF, POPF, NULLSTATE)),
    /* InPathFirstFirst */ Array(
      it(C_EOF, POPF, NULLSTATE),
      eq('.', NEXT, InPathSecond),
      eq('/', NEXT, InFileFirst),
      it(C_DEF, POPF, NULLSTATE)),
    /* InPathSecond */ Array(
      it(C_EOF, BINGO | CLEARF, Base, FILEPATH),
      eq('/', NEXT | PUSHF, InFileFirst),
      eq('/', BINGO | CLEARF, Base, FILEPATH),
      it(C_SPACE, BINGO | CLEARF, Base, FILEPATH),
      it(C_DEF, POPF, NULLSTATE)),
    /* InFile */ Array(
      it(C_EOF, BINGO, Base, FILEPATH),
      it(C_ASCLET, NEXT, InFile),
      it(C_DIGIT, NEXT, InFile),
      eq('.', PUSHF, InFileNext),
      eq('_', NEXT, InFile),
      eq('-', NEXT, InFile),
      eq('/', PUSHF, InFileFirst),
      it(C_DEF, BINGO, Base, FILEPATH)),
    /* InFileNext */ Array(
      it(C_EOF, POPF, NULLSTATE),
      it(C_ASCLET, CLEARF, InFile),
      it(C_DIGIT, CLEARF, InFile),
      eq('_', CLEARF, InFile),
      it(C_DEF, POPF, NULLSTATE)),
    /* InURLPathFirst */ Array(
      it(C_EOF, POPF, NULLSTATE),
      it(C_URLCHAR, NEXT, InURLPath),
      it(C_DEF, POPF, NULLSTATE)),
    /* InURLPathStart */ Array(
      it(C_DEF, NEXT, InURLPath)),
    /* InURLPath */ Array(
      it(C_EOF, BINGO, Base, URLPATH),
      it(C_URLCHAR, NEXT, InURLPath),
      it(C_DEF, BINGO, Base, URLPATH)),
    /* InFURL */ Array(
      it(C_EOF, POPF, NULLSTATE),
      it(C_URLPATH, BINGO | CLRALL, Base, URL, S_FURL),
      it(C_DEF, POPF, NULLSTATE)),
    /* InProtocolFirst */ Array(
      it(C_EOF, POPF, NULLSTATE),
      eq('/', NEXT, InProtocolSecond),
      it(C_DEF, POPF, NULLSTATE)),
    /* InProtocolSecond */ Array(
      it(C_EOF, POPF, NULLSTATE),
      eq('/', NEXT, InProtocolEnd),
      it(C_DEF, POPF, NULLSTATE)),
    /* InProtocolEnd */ Array(
      it(C_DEF, BINGO | CLRALL, Base, PROTOCOL)),
    /* InHyphenAsciiWordFirst */ Array(
      it(C_EOF, POPF, NULLSTATE),
      it(C_ASCLET, NEXT, InHyphenAsciiWord),
      it(C_ALPHA, NEXT, InHyphenWord),
      it(C_DIGIT, NEXT, InHyphenDigitLookahead),
      it(C_DEF, POPF, NULLSTATE)),
    /* InHyphenAsciiWord */ Array(
      it(C_EOF, BINGO | CLRALL, InParseHyphen, ASCIIHWORD, S_HYPH),
      it(C_ASCLET, NEXT, InHyphenAsciiWord),
      it(C_ALPHA, NEXT, InHyphenWord),
      it(C_SPECIAL, NEXT, InHyphenWord),
      it(C_DIGIT, NEXT, InHyphenNumWord),
      eq('-', PUSHF, InHyphenAsciiWordFirst),
      it(C_DEF, BINGO | CLRALL, InParseHyphen, ASCIIHWORD, S_HYPH)),
    /* InHyphenWordFirst */ Array(
      it(C_EOF, POPF, NULLSTATE),
      it(C_ALPHA, NEXT, InHyphenWord),
      it(C_DIGIT, NEXT, InHyphenDigitLookahead),
      it(C_DEF, POPF, NULLSTATE)),
    /* InHyphenWord */ Array(
      it(C_EOF, BINGO | CLRALL, InParseHyphen, HWORD, S_HYPH),
      it(C_ALPHA, NEXT, InHyphenWord),
      it(C_SPECIAL, NEXT, InHyphenWord),
      it(C_DIGIT, NEXT, InHyphenNumWord),
      eq('-', PUSHF, InHyphenWordFirst),
      it(C_DEF, BINGO | CLRALL, InParseHyphen, HWORD, S_HYPH)),
    /* InHyphenNumWordFirst */ Array(
      it(C_EOF, POPF, NULLSTATE),
      it(C_ALPHA, NEXT, InHyphenNumWord),
      it(C_DIGIT, NEXT, InHyphenDigitLookahead),
      it(C_DEF, POPF, NULLSTATE)),
    /* InHyphenNumWord */ Array(
      it(C_EOF, BINGO | CLRALL, InParseHyphen, NUMHWORD, S_HYPH),
      it(C_ALNUM, NEXT, InHyphenNumWord),
      it(C_SPECIAL, NEXT, InHyphenNumWord),
      eq('-', PUSHF, InHyphenNumWordFirst),
      it(C_DEF, BINGO | CLRALL, InParseHyphen, NUMHWORD, S_HYPH)),
    /* InHyphenDigitLookahead */ Array(
      it(C_EOF, POPF, NULLSTATE),
      it(C_DIGIT, NEXT, InHyphenDigitLookahead),
      it(C_ALPHA, NEXT, InHyphenNumWord),
      it(C_SPECIAL, NEXT, InHyphenNumWord),
      it(C_DEF, POPF, NULLSTATE)),
    /* InParseHyphen */ Array(
      it(C_EOF, RERUN, Base),
      it(C_ASCLET, NEXT, InHyphenAsciiWordPart),
      it(C_ALPHA, NEXT, InHyphenWordPart),
      it(C_DIGIT, PUSHF, InHyphenUnsignedInt),
      eq('-', PUSHF, InParseHyphenHyphen),
      it(C_DEF, RERUN, Base)),
    /* InParseHyphenHyphen */ Array(
      it(C_EOF, POPF, NULLSTATE),
      it(C_ALNUM, BINGO | CLEARF, InParseHyphen, SPACE),
      it(C_SPECIAL, BINGO | CLEARF, InParseHyphen, SPACE),
      it(C_DEF, POPF, NULLSTATE)),
    /* InHyphenWordPart */ Array(
      it(C_EOF, BINGO, Base, PARTHWORD),
      it(C_ALPHA, NEXT, InHyphenWordPart),
      it(C_SPECIAL, NEXT, InHyphenWordPart),
      it(C_DIGIT, NEXT, InHyphenNumWordPart),
      it(C_DEF, BINGO, InParseHyphen, PARTHWORD)),
    /* InHyphenAsciiWordPart */ Array(
      it(C_EOF, BINGO, Base, ASCIIPARTHWORD),
      it(C_ASCLET, NEXT, InHyphenAsciiWordPart),
      it(C_ALPHA, NEXT, InHyphenWordPart),
      it(C_SPECIAL, NEXT, InHyphenWordPart),
      it(C_DIGIT, NEXT, InHyphenNumWordPart),
      it(C_DEF, BINGO, InParseHyphen, ASCIIPARTHWORD)),
    /* InHyphenNumWordPart */ Array(
      it(C_EOF, BINGO, Base, NUMPARTHWORD),
      it(C_ALNUM, NEXT, InHyphenNumWordPart),
      it(C_SPECIAL, NEXT, InHyphenNumWordPart),
      it(C_DEF, BINGO, InParseHyphen, NUMPARTHWORD)),
    /* InHyphenUnsignedInt */ Array(
      it(C_EOF, POPF, NULLSTATE),
      it(C_DIGIT, NEXT, NULLSTATE),
      it(C_ALPHA, CLEARF, InHyphenNumWordPart),
      it(C_SPECIAL, CLEARF, InHyphenNumWordPart),
      it(C_DEF, POPF, NULLSTATE)))

  /** strange_letter (wparser_def.cpp:105-338): Unicode Mc-category
    * vowel signs / length marks that are not word breakers. Sorted —
    * probed with binary search exactly like the reference. */
  private val strangeLetter: Array[Int] = Array(
    0x0903, 0x093E, 0x093F, 0x0940, 0x0949, 0x094A, 0x094B, 0x094C, 0x0982, 0x0983,
    0x09BE, 0x09BF, 0x09C0, 0x09C7, 0x09C8, 0x09CB, 0x09CC, 0x09D7, 0x0A03, 0x0A3E,
    0x0A3F, 0x0A40, 0x0A83, 0x0ABE, 0x0ABF, 0x0AC0, 0x0AC9, 0x0ACB, 0x0ACC, 0x0B02,
    0x0B03, 0x0B3E, 0x0B40, 0x0B47, 0x0B48, 0x0B4B, 0x0B4C, 0x0B57, 0x0BBE, 0x0BBF,
    0x0BC1, 0x0BC2, 0x0BC6, 0x0BC7, 0x0BC8, 0x0BCA, 0x0BCB, 0x0BCC, 0x0BD7, 0x0C01,
    0x0C02, 0x0C03, 0x0C41, 0x0C42, 0x0C43, 0x0C44, 0x0C82, 0x0C83, 0x0CBE, 0x0CC0,
    0x0CC1, 0x0CC2, 0x0CC3, 0x0CC4, 0x0CC7, 0x0CC8, 0x0CCA, 0x0CCB, 0x0CD5, 0x0CD6,
    0x0D02, 0x0D03, 0x0D3E, 0x0D3F, 0x0D40, 0x0D46, 0x0D47, 0x0D48, 0x0D4A, 0x0D4B,
    0x0D4C, 0x0D57, 0x0D82, 0x0D83, 0x0DCF, 0x0DD0, 0x0DD1, 0x0DD8, 0x0DD9, 0x0DDA,
    0x0DDB, 0x0DDC, 0x0DDD, 0x0DDE, 0x0DDF, 0x0DF2, 0x0DF3, 0x0F3E, 0x0F3F, 0x0F7F,
    0x102B, 0x102C, 0x1031, 0x1038, 0x103B, 0x103C, 0x1056, 0x1057, 0x1062, 0x1063,
    0x1064, 0x1067, 0x1068, 0x1069, 0x106A, 0x106B, 0x106C, 0x106D, 0x1083, 0x1084,
    0x1087, 0x1088, 0x1089, 0x108A, 0x108B, 0x108C, 0x108F, 0x109A, 0x109B, 0x109C,
    0x17B6, 0x17BE, 0x17BF, 0x17C0, 0x17C1, 0x17C2, 0x17C3, 0x17C4, 0x17C5, 0x17C7,
    0x17C8, 0x1923, 0x1924, 0x1925, 0x1926, 0x1929, 0x192A, 0x192B, 0x1930, 0x1931,
    0x1933, 0x1934, 0x1935, 0x1936, 0x1937, 0x1938, 0x19B0, 0x19B1, 0x19B2, 0x19B3,
    0x19B4, 0x19B5, 0x19B6, 0x19B7, 0x19B8, 0x19B9, 0x19BA, 0x19BB, 0x19BC, 0x19BD,
    0x19BE, 0x19BF, 0x19C0, 0x19C8, 0x19C9, 0x1A19, 0x1A1A, 0x1A1B, 0x1B04, 0x1B35,
    0x1B3B, 0x1B3D, 0x1B3E, 0x1B3F, 0x1B40, 0x1B41, 0x1B43, 0x1B44, 0x1B82, 0x1BA1,
    0x1BA6, 0x1BA7, 0x1BAA, 0x1C24, 0x1C25, 0x1C26, 0x1C27, 0x1C28, 0x1C29, 0x1C2A,
    0x1C2B, 0x1C34, 0x1C35, 0xA823, 0xA824, 0xA827, 0xA880, 0xA881, 0xA8B4, 0xA8B5,
    0xA8B6, 0xA8B7, 0xA8B8, 0xA8B9, 0xA8BA, 0xA8BB, 0xA8BC, 0xA8BD, 0xA8BE, 0xA8BF,
    0xA8C0, 0xA8C1, 0xA8C2, 0xA8C3, 0xA952, 0xA953, 0xAA2F, 0xAA30, 0xAA33, 0xAA34,
    0xAA4D, 0x1D165, 0x1D166, 0x1D16D, 0x1D16E, 0x1D16F, 0x1D170, 0x1D171, 0x1D172)

  /** One emitted token. */
  final case class Tok(tpe: Int, start: Int, len: Int)

  /** The TParser (wparser_def.cpp:459-483 + TParserGet :1602). `base`
    * is the absolute start offset (TParserCopyInit shares the string). */
  private final class Parser(val s: String, base: Int, val depth: Int) {
    private val len = s.length

    // TParserPosition as a linked stack (posbyte/poschar become
    // UTF-16-unit / code-point counters; token lengths likewise)
    final class Pos(var posJ: Int, var posC: Int, var charlen: Int,
      var lenJ: Int, var lenC: Int, var state: Int, var prev: Pos,
      var pushedIdx: Int)

    var st = new Pos(base, 0, 0, 0, 0, Base, null, -1)
    var ignore = false
    var wanthost = false
    // out
    var tokenStart = 0
    var tpe = 0
    var lenJToken = 0
    var lenCToken = 0

    private def isAscLetter(cp: Int): Boolean =
      (cp >= 'A' && cp <= 'Z') || (cp >= 'a' && cp <= 'z')
    private def isAlpha(cp: Int): Boolean = isAscLetter(cp) || cp > 0x7F
    private def isDigit(cp: Int): Boolean = cp >= '0' && cp <= '9'
    private def isCSpace(cp: Int): Boolean = cp == ' ' || cp == '\t' ||
      cp == '\n' || cp == 0x0B || cp == '\f' || cp == '\r'
    private def isXDigit(cp: Int): Boolean = isDigit(cp) ||
      (cp >= 'a' && cp <= 'f') || (cp >= 'A' && cp <= 'F')
    private def isUrlChar(cp: Int): Boolean =
      cp > 0x20 && cp < 0x7F && (cp match {
        case '"' | '<' | '>' | '\\' | '^' | '`' | '{' | '|' | '}' => false
        case _ => true
      })
    private def isSpecialChar(cp: Int): Boolean = {
      // zero display length (pg_dsplen == 0: combining marks) ...
      val t = Character.getType(cp)
      if (t == Character.NON_SPACING_MARK || t == Character.ENCLOSING_MARK)
        true
      // ... or a 'Mark, Spacing Combining' sign from strange_letter
      else java.util.Arrays.binarySearch(strangeLetter, cp) >= 0
    }

    private def subHost(): Boolean = { // p_ishost (wparser_def.cpp:917)
      if (depth > 256)
        throw new IllegalArgumentException("graft: ts parser stack too deep")
      val sub = new Parser(s, st.posJ, depth + 1)
      sub.wanthost = true
      if (sub.next() && sub.tpe == HOST) {
        st.posJ += sub.lenJToken; st.posC += sub.lenCToken
        st.lenJ += sub.lenJToken; st.lenC += sub.lenCToken
        st.charlen = sub.st.charlen
        true
      } else false
    }

    private def subUrlPath(): Boolean = { // p_isURLPath (:939)
      if (depth > 256)
        throw new IllegalArgumentException("graft: ts parser stack too deep")
      val sub = new Parser(s, st.posJ, depth + 1)
      sub.st = new sub.Pos(st.posJ, 0, 0, 0, 0, InURLPathFirst, sub.st, -1)
      if (sub.next() && sub.tpe == URLPATH) {
        st.posJ += sub.lenJToken; st.posC += sub.lenCToken
        st.lenJ += sub.lenJToken; st.lenC += sub.lenCToken
        st.charlen = sub.st.charlen
        true
      } else false
    }

    private def test(item: It, cp: Int): Boolean = item.cls match {
      case C_EOF => st.charlen == 0
      case C_EQ => cp == item.c.toInt
      case C_ASCLET => cp >= 0 && isAscLetter(cp)
      case C_ALPHA => cp >= 0 && isAlpha(cp)
      case C_DIGIT => cp >= 0 && isDigit(cp)
      case C_ALNUM => cp >= 0 && (isAlpha(cp) || isDigit(cp))
      case C_NOTALNUM => cp >= 0 && !(isAlpha(cp) || isDigit(cp))
      case C_SPACE => cp >= 0 && isCSpace(cp)
      case C_XDIGIT => cp >= 0 && isXDigit(cp)
      case C_URLCHAR => cp >= 0 && isUrlChar(cp)
      case C_STOPHOST => if (wanthost) { wanthost = false; true } else false
      case C_IGNORE => ignore
      case C_HOST => subHost()
      case C_URLPATH => subUrlPath()
      case C_SPECIAL => cp >= 0 && isSpecialChar(cp)
      case _ => true // C_DEF
    }

    private def specialTags(): Unit = { // SpecialTags (:857)
      st.lenC match {
        case 8 => if (s.regionMatches(true, tokenStart, "</script", 0, 8))
          ignore = false
        case 7 =>
          if (s.regionMatches(true, tokenStart, "</style", 0, 7)) ignore = false
          else if (s.regionMatches(true, tokenStart, "<script", 0, 7))
            ignore = true
        case 6 => if (s.regionMatches(true, tokenStart, "<style", 0, 6))
          ignore = true
        case _ => ()
      }
    }

    /** TParserGet (:1602): emit the next token, or false at end /
      * unfinished tail. */
    def next(): Boolean = {
      if (st.posJ >= len) return false
      tokenStart = st.posJ
      st.pushedIdx = -1
      var bingo = false
      var done = false
      while (!done && st.posJ <= len) {
        st.charlen =
          if (st.posJ == len) 0 else Character.charCount(s.codePointAt(st.posJ))
        val cp = if (st.charlen == 0) -1 else s.codePointAt(st.posJ)
        val items = actions(st.state)
        var idx =
          if (st.pushedIdx >= 0) { val i = st.pushedIdx + 1; st.pushedIdx = -1; i }
          else 0
        while (items(idx).cls != C_DEF && !test(items(idx), cp)) idx += 1
        val item = items(idx)

        item.sp match {
          case S_TAGS => specialTags()
          case S_FURL => // SpecialFURL (:882)
            wanthost = true
            st.posJ -= st.lenJ; st.posC -= st.lenC
          case S_HYPH => // SpecialHyphen (:889)
            st.posJ -= st.lenJ; st.posC -= st.lenC
          case S_VERV => // SpecialVerVersion (:895)
            st.posJ -= st.lenJ; st.posC -= st.lenC
            st.lenJ = 0; st.lenC = 0
          case _ => ()
        }

        if ((item.flags & BINGO) != 0) {
          lenJToken = st.lenJ; lenCToken = st.lenC
          st.lenJ = 0; st.lenC = 0
          tpe = item.tpe
          bingo = true
        }

        if ((item.flags & POPF) != 0) st = st.prev
        else if ((item.flags & PUSHF) != 0) {
          st.pushedIdx = idx
          st = new Pos(st.posJ, st.posC, st.charlen, st.lenJ, st.lenC,
            st.state, st, -1)
        } else if ((item.flags & CLEARF) != 0) st.prev = st.prev.prev
        else if ((item.flags & CLRALL) != 0) st.prev = null
        else if ((item.flags & MERGEF) != 0) {
          val top = st
          st = st.prev
          st.posJ = top.posJ; st.posC = top.posC; st.charlen = top.charlen
          st.lenJ = top.lenJ; st.lenC = top.lenC
        }

        if (item.to != NULLSTATE) st.state = item.to

        if (bingo || (st.posJ >= len && (item.flags & RERUN) == 0)) done = true
        else if ((item.flags & (RERUN | POPF)) != 0) () // rerun at same pos
        else if (st.charlen > 0) {
          st.posJ += st.charlen; st.lenJ += st.charlen
          st.posC += 1; st.lenC += 1
        }
      }
      bingo
    }
  }

  /** Full token stream of `s`: (type, UTF-16 start, UTF-16 length). */
  def tokenize(s: String): IndexedSeq[Tok] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Tok]
    val p = new Parser(s, 0, 0)
    while (p.next()) out += Tok(p.tpe, p.tokenStart, p.lenJToken)
    out.toIndexedSeq
  }

  /** ts_parse('default', s) as (tokid, token) pairs. */
  def parse(s: String): IndexedSeq[(Int, String)] =
    tokenize(s).map(t => (t.tpe, s.substring(t.start, t.start + t.len)))

  /** Token stream with parsetext's lexeme positions (ts_parse.cpp:314):
    * pos advances once per dictionary-mapped token (all types except
    * blank/tag/protocol/entity under the default config), capped at
    * MAXENTRYPOS; unmapped tokens carry pos 0. */
  def parseWithPos(s: String): IndexedSeq[(Int, String, Int)] = {
    var pos = 0
    tokenize(s).map { t =>
      val p = if (positionalTypes(t.tpe)) {
        pos += 1; math.min(pos, MAXENTRYPOS)
      } else 0
      (t.tpe, s.substring(t.start, t.start + t.len), p)
    }
  }

  /** Column form: array<struct<tokid int, token string, pos int>>. */
  def parseCol(text: Column): Column =
    Bridge.column(TsParseTokens(Bridge.expression(text)))
}

/** ts_parse('default', …)'s token stream with lexeme positions. */
case class TsParseTokens(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("tokid", IntegerType, nullable = false),
    StructField("token", StringType, nullable = false),
    StructField("pos", IntegerType, nullable = false))),
    containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "ts_parse_default"
  override def nullSafeEval(a: Any): Any = {
    val s = a.asInstanceOf[UTF8String].toString
    val toks = TsDefaultParser.parseWithPos(s)
    new GenericArrayData(toks.map { case (tid, tok, pos) =>
      InternalRow(tid, UTF8String.fromString(tok), pos)
    }.toArray[Any])
  }
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
