package graft.analysis

/**
 * Porter2 (Snowball English) stemmer, implemented from the published
 * Snowball specification (snowballstem.org "The English (Porter2) stemming
 * algorithm"). This supplies the reference's `snowballporter` token-filter
 * tag (`/root/reference/src/main/java/edu/anadolu/analysis/
 * Analyzers.java:103-109`) without any Lucene dependency.
 *
 * Structure follows the spec exactly: exceptional forms, y-marking, the
 * R1/R2 regions (with the gener/commun/arsen prefix exception), steps
 * 0, 1a (+ post-1a invariants), 1b, 1c, 2, 3, 4, 5, then Y→y. Suffix
 * tables use Snowball `among` semantics — the LONGEST matching suffix is
 * selected first and its condition tested once, with no backtracking to
 * shorter suffixes.
 */
object Porter2 {

  // y is vowel only while unmarked-lowercase; the marker 'Y' is a consonant
  private def isVowel(c: Char): Boolean =
    c == 'a' || c == 'e' || c == 'i' || c == 'o' || c == 'u' || c == 'y'

  private val doubles = Set("bb", "dd", "ff", "gg", "mm", "nn", "pp", "rr", "tt")
  private val liEnding = Set('c', 'd', 'e', 'g', 'h', 'k', 'm', 'n', 'r', 't')

  /** Exceptional forms (spec "exception1"). */
  private val exception1 = Map(
    "skis" -> "ski", "skies" -> "sky", "dying" -> "die", "lying" -> "lie",
    "tying" -> "tie", "idly" -> "idl", "gently" -> "gentl", "ugly" -> "ugli",
    "early" -> "earli", "only" -> "onli", "singly" -> "singl",
    "sky" -> "sky", "news" -> "news", "howe" -> "howe", "atlas" -> "atlas",
    "cosmos" -> "cosmos", "bias" -> "bias", "andes" -> "andes")

  /** Invariants after step 1a (spec "exception2"). */
  private val exception2 = Set(
    "inning", "outing", "canning", "herring", "earring",
    "proceed", "exceed", "succeed")

  /** (r1, r2) start offsets: R1 begins after the first non-vowel following
   * a vowel (special-cased gener/commun/arsen prefixes); R2 is the same
   * rule applied within R1. Offsets only ever index a shrinking word, so
   * "suffix is in R1" ⟺ suffix start ≥ r1. */
  private def regions(w: String): (Int, Int) = {
    def regionAfter(from: Int): Int = {
      var i = from
      while (i < w.length && !isVowel(w.charAt(i))) i += 1 // find vowel
      while (i < w.length && isVowel(w.charAt(i))) i += 1  // find non-vowel
      if (i < w.length) i + 1 else w.length
    }
    val r1 =
      if (w.startsWith("gener") || w.startsWith("arsen")) 5
      else if (w.startsWith("commun")) 6
      else regionAfter(0)
    (r1, regionAfter(r1))
  }

  /** Short syllable at the END of s: vowel + non-vowel(≠ w/x/Y) preceded by
   * a non-vowel, or a word-initial vowel followed by a non-vowel. */
  private def endsWithShortSyllable(s: String): Boolean = {
    val n = s.length
    if (n == 2) isVowel(s.charAt(0)) && !isVowel(s.charAt(1))
    else n >= 3 && {
      val c = s.charAt(n - 1)
      isVowel(s.charAt(n - 2)) && !isVowel(c) && c != 'w' && c != 'x' && c != 'Y' &&
        !isVowel(s.charAt(n - 3))
    }
  }

  def stem(input: String): String = {
    if (input == null || input.length <= 2) return input
    var w = input
    if (w.charAt(0) == '\'') w = w.substring(1)
    exception1.get(w) match {
      case Some(s) => return s
      case None =>
    }
    if (w.length <= 2) return w

    // mark consonant-y: initial y and y after a vowel
    val marked = new java.lang.StringBuilder(w)
    if (marked.charAt(0) == 'y') marked.setCharAt(0, 'Y')
    var mi = 1
    while (mi < marked.length) {
      if (marked.charAt(mi) == 'y' && isVowel(marked.charAt(mi - 1)))
        marked.setCharAt(mi, 'Y')
      mi += 1
    }
    w = marked.toString
    val (r1, r2) = regions(w)
    def inR1(suffixLen: Int): Boolean = w.length - suffixLen >= r1
    def inR2(suffixLen: Int): Boolean = w.length - suffixLen >= r2
    def hasVowel(s: String): Boolean = s.exists(isVowel)

    // -- step 0: longest of 's' / 's / '
    if (w.endsWith("'s'")) w = w.dropRight(3)
    else if (w.endsWith("'s")) w = w.dropRight(2)
    else if (w.endsWith("'")) w = w.dropRight(1)

    // -- step 1a
    if (w.endsWith("sses")) w = w.dropRight(2)
    else if (w.endsWith("ied") || w.endsWith("ies"))
      w = if (w.length - 3 > 1) w.dropRight(2) else w.dropRight(1)
    else if (w.endsWith("ss") || w.endsWith("us")) ()
    else if (w.endsWith("s") && w.length >= 2 &&
             hasVowel(w.substring(0, w.length - 2))) w = w.dropRight(1)

    if (exception2.contains(w)) return w

    // -- step 1b (longest of eedly/ingly/edly/eed/ing/ed)
    val s1b =
      if (w.endsWith("eedly")) "eedly" else if (w.endsWith("ingly")) "ingly"
      else if (w.endsWith("edly")) "edly" else if (w.endsWith("eed")) "eed"
      else if (w.endsWith("ing")) "ing" else if (w.endsWith("ed")) "ed" else ""
    s1b match {
      case "eed" | "eedly" =>
        if (inR1(s1b.length)) w = w.dropRight(s1b.length) + "ee"
      case "" =>
      case _ =>
        if (hasVowel(w.substring(0, w.length - s1b.length))) {
          w = w.dropRight(s1b.length)
          if (w.endsWith("at") || w.endsWith("bl") || w.endsWith("iz")) w = w + "e"
          else if (w.length >= 2 && doubles.contains(w.substring(w.length - 2))) w = w.dropRight(1)
          else if (endsWithShortSyllable(w) && r1 >= w.length) w = w + "e"
        }
    }

    // -- step 1c: y/Y → i after a non-initial consonant
    if (w.length >= 3 && (w.endsWith("y") || w.endsWith("Y")) &&
        !isVowel(w.charAt(w.length - 2)))
      w = w.dropRight(1) + "i"

    // -- step 2 (longest match; condition: suffix in R1)
    val step2: Seq[(String, String => Option[String])] = Seq(
      "ational" -> (b => Some(b + "ate")),
      "fulness" -> (b => Some(b + "ful")),
      "iveness" -> (b => Some(b + "ive")),
      "ization" -> (b => Some(b + "ize")),
      "ousness" -> (b => Some(b + "ous")),
      "biliti"  -> (b => Some(b + "ble")),
      "lessli"  -> (b => Some(b + "less")),
      "tional"  -> (b => Some(b + "tion")),
      "alism"   -> (b => Some(b + "al")),
      "aliti"   -> (b => Some(b + "al")),
      "ation"   -> (b => Some(b + "ate")),
      "entli"   -> (b => Some(b + "ent")),
      "fulli"   -> (b => Some(b + "ful")),
      "iviti"   -> (b => Some(b + "ive")),
      "ousli"   -> (b => Some(b + "ous")),
      "abli"    -> (b => Some(b + "able")),
      "alli"    -> (b => Some(b + "al")),
      "anci"    -> (b => Some(b + "ance")),
      "ator"    -> (b => Some(b + "ate")),
      "enci"    -> (b => Some(b + "ence")),
      "izer"    -> (b => Some(b + "ize")),
      "bli"     -> (b => Some(b + "ble")),
      "ogi"     -> (b => if (b.endsWith("l")) Some(b + "og") else None),
      "li"      -> (b => if (b.nonEmpty && liEnding.contains(b.last)) Some(b) else None))
    step2.find { case (suf, _) => w.endsWith(suf) } match {
      case Some((suf, apply)) if inR1(suf.length) =>
        apply(w.dropRight(suf.length)).foreach(w = _)
      case _ =>
    }

    // -- step 3 (longest match; condition: suffix in R1; ative needs R2)
    val step3: Seq[(String, String => Option[String])] = Seq(
      "ational" -> (b => Some(b + "ate")),
      "tional"  -> (b => Some(b + "tion")),
      "alize"   -> (b => Some(b + "al")),
      "icate"   -> (b => Some(b + "ic")),
      "iciti"   -> (b => Some(b + "ic")),
      "ative"   -> (b => if (w.length - 5 >= r2) Some(b) else None),
      "ical"    -> (b => Some(b + "ic")),
      "ness"    -> (b => Some(b)),
      "ful"     -> (b => Some(b)))
    step3.find { case (suf, _) => w.endsWith(suf) } match {
      case Some((suf, apply)) if inR1(suf.length) =>
        apply(w.dropRight(suf.length)).foreach(w = _)
      case _ =>
    }

    // -- step 4 (longest match; condition: suffix in R2; ion needs s/t)
    val step4: Seq[String] = Seq(
      "ement", "ance", "ence", "able", "ible", "ment",
      "ant", "ate", "ent", "ion", "ism", "iti", "ive", "ize", "ous",
      "al", "er", "ic")
    step4.find(w.endsWith) match {
      case Some("ion") =>
        if (inR2(3) && w.length >= 4 &&
            (w.charAt(w.length - 4) == 's' || w.charAt(w.length - 4) == 't'))
          w = w.dropRight(3)
      case Some(suf) if inR2(suf.length) => w = w.dropRight(suf.length)
      case _ =>
    }

    // -- step 5
    if (w.endsWith("e")) {
      if (inR2(1) || (inR1(1) && !endsWithShortSyllable(w.dropRight(1))))
        w = w.dropRight(1)
    } else if (w.endsWith("l")) {
      if (inR2(1) && w.length >= 2 && w.charAt(w.length - 2) == 'l')
        w = w.dropRight(1)
    }

    w.replace('Y', 'y')
  }
}
