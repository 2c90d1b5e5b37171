package graft.functions

/**
 * The Porter stemming algorithm (M.F. Porter, "An algorithm for suffix
 * stripping", Program 14(3), 1980) — the normalization openGauss/PG's
 * `english` text-search configuration applies through its Snowball
 * dictionary before any match or rank (reference:
 * src/common/backend/tsearch/dict_snowball.c; the `english_stem`
 * dictionary; src/common/backend/tsearch/ts_parse.cpp drives the
 * parser → dictionary chain).
 *
 * This is the ORIGINAL algorithm in its reference-implementation form
 * (the widely mirrored public-domain porter.c / Snowball "porter"
 * stemmer), including its documented departures from the published
 * paper: step 2 uses `bli→ble` (paper: `abli→able`), step 2 adds
 * `logi→log`, and words of length ≤ 2 are left unchanged.
 *
 * Pure function `String → String` over lowercase words; tokens with
 * any non-`a-z` character pass through unchanged (Snowball
 * dictionaries only see the parser's word tokens). A bounded memo
 * makes the corpus' repeated vocabulary O(1) per token after first
 * sight — safe because the function is pure.
 */
object Porter {

  private val memo = new java.util.concurrent.ConcurrentHashMap[String, String]()
  private val MemoCap = 1 << 16

  /** Stem one token (null-safe, lowercases first). */
  def stem(word: String): String = {
    if (word == null) return null
    val w = word.toLowerCase
    if (w.length <= 2) return w // -DEPARTURE- short words unchanged
    var i = 0
    while (i < w.length) {
      val c = w.charAt(i)
      if (c < 'a' || c > 'z') return w
      i += 1
    }
    val hit = memo.get(w)
    if (hit != null) return hit
    val out = stemAlpha(w)
    if (memo.size < MemoCap) memo.put(w, out)
    out
  }

  /** The algorithm proper, on an all-lowercase a-z word of length ≥ 3. */
  private def stemAlpha(w: String): String = {
    val b = w.toCharArray
    var k = b.length - 1 // index of last letter of the current word
    var j = 0            // index of last letter of the current stem

    // true iff b(i) is a consonant ('y' is a consonant at the start or
    // after a vowel)
    def cons(i: Int): Boolean = b(i) match {
      case 'a' | 'e' | 'i' | 'o' | 'u' => false
      case 'y'                         => if (i == 0) true else !cons(i - 1)
      case _                           => true
    }

    // the measure: number of VC sequences in b(0..j)
    def m(): Int = {
      var n = 0
      var i = 0
      while (i <= j && cons(i)) i += 1 // initial consonant run
      if (i > j) return 0
      i += 1
      while (true) {
        while (i <= j && !cons(i)) i += 1 // vowel run
        if (i > j) return n
        i += 1
        n += 1
        while (i <= j && cons(i)) i += 1 // consonant run
        if (i > j) return n
        i += 1
      }
      n
    }

    def vowelInStem(): Boolean = {
      var i = 0
      while (i <= j) { if (!cons(i)) return true; i += 1 }
      false
    }

    // b(i-1), b(i) a double consonant
    def doublec(i: Int): Boolean =
      i >= 1 && b(i) == b(i - 1) && cons(i)

    // b(i-2..i) is consonant-vowel-consonant with the final consonant
    // not w, x or y (restores an e after words like hop(-ping))
    def cvc(i: Int): Boolean = {
      if (i < 2 || !cons(i) || cons(i - 1) || !cons(i - 2)) false
      else {
        val ch = b(i)
        ch != 'w' && ch != 'x' && ch != 'y'
      }
    }

    // does b(0..k) end with s? sets j on success
    def ends(s: String): Boolean = {
      val l = s.length
      if (l > k + 1) return false
      var i = 0
      while (i < l) {
        if (b(k - l + 1 + i) != s.charAt(i)) return false
        i += 1
      }
      j = k - l
      true
    }

    // overwrite b(j+1 ..) with s, readjust k
    def setto(s: String): Unit = {
      var i = 0
      while (i < s.length) { b(j + 1 + i) = s.charAt(i); i += 1 }
      k = j + s.length
    }

    def r(s: String): Unit = if (m() > 0) setto(s)

    // step 1ab: plurals and -ed / -ing
    def step1ab(): Unit = {
      if (b(k) == 's') {
        if (ends("sses")) k -= 2
        else if (ends("ies")) setto("i")
        else if (b(k - 1) != 's') k -= 1
      }
      if (ends("eed")) { if (m() > 0) k -= 1 }
      else if ((ends("ed") || ends("ing")) && vowelInStem()) {
        k = j
        if (ends("at")) setto("ate")
        else if (ends("bl")) setto("ble")
        else if (ends("iz")) setto("ize")
        else if (doublec(k)) {
          k -= 1
          val ch = b(k)
          if (ch == 'l' || ch == 's' || ch == 'z') k += 1
        }
        else if (m() == 1 && cvc(k)) setto("e")
      }
    }

    // step 1c: terminal y → i when there is another vowel in the stem
    def step1c(): Unit =
      if (ends("y") && vowelInStem()) b(k) = 'i'

    // step 2: double suffixes → single ones (keyed on penultimate char)
    def step2(): Unit = {
      if (k < 1) return
      b(k - 1) match {
        case 'a' =>
          if (ends("ational")) r("ate")
          else if (ends("tional")) r("tion")
        case 'c' =>
          if (ends("enci")) r("ence")
          else if (ends("anci")) r("ance")
        case 'e' =>
          if (ends("izer")) r("ize")
        case 'l' =>
          if (ends("bli")) r("ble") // -DEPARTURE- (paper: abli→able)
          else if (ends("alli")) r("al")
          else if (ends("entli")) r("ent")
          else if (ends("eli")) r("e")
          else if (ends("ousli")) r("ous")
        case 'o' =>
          if (ends("ization")) r("ize")
          else if (ends("ation")) r("ate")
          else if (ends("ator")) r("ate")
        case 's' =>
          if (ends("alism")) r("al")
          else if (ends("iveness")) r("ive")
          else if (ends("fulness")) r("ful")
          else if (ends("ousness")) r("ous")
        case 't' =>
          if (ends("aliti")) r("al")
          else if (ends("iviti")) r("ive")
          else if (ends("biliti")) r("ble")
        case 'g' =>
          if (ends("logi")) r("log") // -DEPARTURE-
        case _ =>
      }
    }

    // step 3: -ic-, -full, -ness etc. (keyed on final char)
    def step3(): Unit = {
      b(k) match {
        case 'e' =>
          if (ends("icate")) r("ic")
          else if (ends("ative")) r("")
          else if (ends("alize")) r("al")
        case 'i' =>
          if (ends("iciti")) r("ic")
        case 'l' =>
          if (ends("ical")) r("ic")
          else if (ends("ful")) r("")
        case 's' =>
          if (ends("ness")) r("")
        case _ =>
      }
    }

    // step 4: -ant, -ence etc. removed when m > 1
    def step4(): Unit = {
      if (k < 1) return
      val found = b(k - 1) match {
        case 'a' => ends("al")
        case 'c' => ends("ance") || ends("ence")
        case 'e' => ends("er")
        case 'i' => ends("ic")
        case 'l' => ends("able") || ends("ible")
        case 'n' => ends("ant") || ends("ement") || ends("ment") || ends("ent")
        case 'o' => (ends("ion") && j >= 0 && (b(j) == 's' || b(j) == 't')) ||
                    ends("ou") // takes care of -ous
        case 's' => ends("ism")
        case 't' => ends("ate") || ends("iti")
        case 'u' => ends("ous")
        case 'v' => ends("ive")
        case 'z' => ends("ize")
        case _   => false
      }
      if (found && m() > 1) k = j
    }

    // step 5: remove a final -e and double -l when m > 1
    def step5(): Unit = {
      j = k
      if (b(k) == 'e') {
        val a = m()
        if (a > 1 || (a == 1 && !cvc(k - 1))) k -= 1
      }
      if (b(k) == 'l' && doublec(k) && m() > 1) k -= 1
    }

    step1ab(); step1c(); step2(); step3(); step4(); step5()
    new String(b, 0, k + 1)
  }
}
