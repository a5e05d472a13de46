package graft.text

/** Classic phonetic codes: American Soundex and (original 1990)
  * Metaphone — the two algorithms the reference's phonetic features rely
  * on (`matching/logic_v1/phonetic.py:40-55`, via the rigour library).
  * Pure Scala implementations of the published algorithms.
  */
object Phonetics {

  private val soundexCode: Map[Char, Char] = Map(
    'B' -> '1', 'F' -> '1', 'P' -> '1', 'V' -> '1',
    'C' -> '2', 'G' -> '2', 'J' -> '2', 'K' -> '2', 'Q' -> '2',
    'S' -> '2', 'X' -> '2', 'Z' -> '2',
    'D' -> '3', 'T' -> '3', 'L' -> '4', 'M' -> '5', 'N' -> '5', 'R' -> '6')

  /** American Soundex (same semantics as Spark/Hive `soundex()`):
    * first letter + 3 digits; H/W transparent for adjacency, vowels
    * break runs.
    */
  def soundex(input: String): String = {
    val s = input.toUpperCase.filter(c => c >= 'A' && c <= 'Z')
    if (s.isEmpty) return ""
    val sb = new StringBuilder
    sb += s.head
    var lastCode = soundexCode.getOrElse(s.head, '0')
    for (c <- s.tail if sb.length < 4) {
      c match {
        case 'H' | 'W' => // transparent: keep lastCode
        case 'A' | 'E' | 'I' | 'O' | 'U' | 'Y' => lastCode = '0'
        case other =>
          val code = soundexCode.getOrElse(other, '0')
          if (code != '0' && code != lastCode) sb += code
          lastCode = code
      }
    }
    sb.append("0" * (4 - sb.length)).toString
  }

  /** Reference `_soundex_token` shape: only alpha tokens longer than 1
    * get encoded, everything else uppercased.
    */
  def soundexToken(token: String): String =
    if (token.length > 1 && token.forall(_.isLetter)) {
      val out = soundex(token)
      if (out.nonEmpty) out else token.toUpperCase
    } else token.toUpperCase

  private def isVowel(c: Char): Boolean = "AEIOU".contains(c)

  /** Original Metaphone (Lawrence Philips, 1990), no length cap. */
  def metaphone(input: String): String = {
    val word = input.toUpperCase.filter(c => c >= 'A' && c <= 'Z')
    if (word.isEmpty) return ""
    val n = word.length
    val out = new StringBuilder
    var i = 0
    // `start` marks the effective first letter after dropped-prefix
    // exceptions: the original algorithm slices the word, so AE- leaves
    // an INITIAL E that must be emitted as a vowel (AEberhard and
    // Eberhard code identically)
    var start = 0

    // initial-letter exceptions
    if (n >= 2) {
      (word(0), word(1)) match {
        case ('A', 'E') => i = 1; start = 1
        case ('G' | 'K' | 'P', 'N') => i = 1; start = 1
        case ('W', 'R') => i = 1; start = 1
        case ('X', _) => out += 'S'; i = 1
        case ('W', 'H') => out += 'W'; i = 2
        case _ =>
      }
    }

    def at(k: Int): Char = if (k >= 0 && k < n) word(k) else '\u0000'

    while (i < n) {
      val c = word(i)
      val prev = at(i - 1)
      val next = at(i + 1)
      // skip duplicate letters except C
      if (c == prev && c != 'C') { i += 1 }
      else {
        c match {
          case 'A' | 'E' | 'I' | 'O' | 'U' =>
            if (i == start) out += c
          case 'B' =>
            if (!(i == n - 1 && prev == 'M')) out += 'B'
          case 'C' =>
            if (next == 'I' && at(i + 2) == 'A') out += 'X'
            else if (next == 'H') {
              if (prev == 'S') out += 'K' else out += 'X'
            } else if (next == 'I' || next == 'E' || next == 'Y') {
              if (prev != 'S') out += 'S'
            } else out += 'K'
          case 'D' =>
            if (next == 'G' && "EIY".contains(at(i + 2))) { out += 'J'; i += 1 }
            else out += 'T'
          case 'F' => out += 'F'
          case 'G' =>
            if (next == 'H') {
              if (!(i + 1 == n - 1) && !isVowel(at(i + 2))) ()
              else if (i == 0 && !isVowel(at(i + 2))) out += 'K'
              else if (i + 1 == n - 1) ()
              else out += 'K'
            } else if (next == 'N') {
              if (i + 1 == n - 1 ||
                (at(i + 2) == 'E' && at(i + 3) == 'D' && i + 3 == n - 1)) ()
              else out += 'K'
            } else if ("EIY".contains(next)) out += 'J'
            else out += 'K'
          case 'H' =>
            if (isVowel(prev) && !isVowel(next)) ()
            else if ("CSPTG".contains(prev)) ()
            else out += 'H'
          case 'J' => out += 'J'
          case 'K' =>
            if (prev != 'C') out += 'K'
          case 'L' => out += 'L'
          case 'M' => out += 'M'
          case 'N' => out += 'N'
          case 'P' =>
            if (next == 'H') { out += 'F'; i += 1 } else out += 'P'
          case 'Q' => out += 'K'
          case 'R' => out += 'R'
          case 'S' =>
            if (next == 'H') { out += 'X'; i += 1 }
            else if (next == 'I' && "OA".contains(at(i + 2))) out += 'X'
            else out += 'S'
          case 'T' =>
            if (next == 'H') { out += '0'; i += 1 }
            else if (next == 'I' && "OA".contains(at(i + 2))) out += 'X'
            else out += 'T'
          case 'V' => out += 'F'
          case 'W' =>
            if (isVowel(next)) out += 'W'
          case 'X' => out ++= "KS"
          case 'Y' =>
            if (isVowel(next)) out += 'Y'
          case 'Z' => out += 'S'
          case _ =>
        }
        i += 1
      }
    }
    out.toString
  }

  /** Reference `metaphone_token` shape: alpha tokens longer than 1 whose
    * phoneme has ≥3 chars; everything else uppercased.
    */
  def metaphoneToken(token: String): String =
    if (token.length > 1 && token.forall(_.isLetter)) {
      val out = metaphone(token)
      if (out.length >= 3) out else token.toUpperCase
    } else token.toUpperCase
}
