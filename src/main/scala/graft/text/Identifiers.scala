package graft.text

/** Public checksum/format validators for strong identifier types — the
  * engine's equivalent of the rigour id formats the reference's
  * identifier features gate on (`matching/logic_v1/identifiers.py:1-9`,
  * `matching/logic_v2/identifiers.py:109-164`). All published
  * algorithms: ISO 17442 (LEI), ISO 6166 (ISIN), Russian tax rules
  * (INN/OGRN), IMO ship numbers, ISO 9362 (BIC).
  */
object Identifiers {

  /** LEI: 20 alphanumeric chars, ISO 7064 mod 97-10 == 1. */
  def validLei(s: String): Boolean =
    s.length == 20 && s.forall(_.isLetterOrDigit) && mod97(s) == 1

  private def mod97(s: String): Int = {
    var acc = 0L
    for (c <- s) {
      val v = if (c.isDigit) c - '0' else c - 'A' + 10
      acc = if (v >= 10) (acc * 100 + v) % 97 else (acc * 10 + v) % 97
    }
    acc.toInt
  }

  /** ISIN: 2 letters + 9 alphanumerics + Luhn check digit over the
    * digit-expanded string.
    */
  def validIsin(s: String): Boolean = {
    if (s.length != 12) return false
    if (!s.take(2).forall(_.isLetter)) return false
    if (!s.last.isDigit) return false
    if (!s.forall(_.isLetterOrDigit)) return false
    val expanded = s.flatMap(c =>
      if (c.isDigit) c.toString else (c - 'A' + 10).toString)
    luhn(expanded)
  }

  private def luhn(digits: String): Boolean = {
    var sum = 0
    var double = false
    for (c <- digits.reverse) {
      var d = c - '0'
      if (double) { d *= 2; if (d > 9) d -= 9 }
      sum += d
      double = !double
    }
    sum % 10 == 0
  }

  /** INN (Russian tax id): 10 digits (orgs) or 12 digits (persons),
    * weighted mod-11 checksum.
    */
  def validInn(s: String): Boolean = {
    if (!s.forall(_.isDigit)) return false
    def check(ds: Seq[Int], weights: Seq[Int]): Int =
      ds.zip(weights).map { case (d, w) => d * w }.sum % 11 % 10
    val ds = s.map(_ - '0')
    s.length match {
      case 10 =>
        check(ds.take(9), Seq(2, 4, 10, 3, 5, 9, 4, 6, 8)) == ds(9)
      case 12 =>
        check(ds.take(10), Seq(7, 2, 4, 10, 3, 5, 9, 4, 6, 8)) == ds(10) &&
          check(ds.take(11), Seq(3, 7, 2, 4, 10, 3, 5, 9, 4, 6, 8)) == ds(11)
      case _ => false
    }
  }

  /** OGRN: 13 digits, first 12 as number mod 11 mod 10 == check digit. */
  def validOgrn(s: String): Boolean =
    s.length == 13 && s.forall(_.isDigit) &&
      (s.take(12).toLong % 11 % 10) == (s.last - '0').toLong

  /** IMO ship number: optional "IMO" prefix + 7 digits, weighted sum
    * (7..2) mod 10 == last digit.
    */
  def validImo(s: String): Boolean = {
    val digits = if (s.startsWith("IMO")) s.drop(3) else s
    digits.length == 7 && digits.forall(_.isDigit) && {
      val ds = digits.map(_ - '0')
      ds.take(6).zip(Seq(7, 6, 5, 4, 3, 2)).map { case (d, w) => d * w }
        .sum % 10 == ds(6)
    }
  }

  /** BIC: 4 letters (bank) + 2 letters (country) + 2 alnum + optional
    * 3 alnum branch.
    */
  def validBic(s: String): Boolean =
    (s.length == 8 || s.length == 11) &&
      s.take(6).forall(_.isLetter) && s.drop(6).forall(_.isLetterOrDigit)

  /** US SAM UEI: 12 alphanumerics, no I/O, non-zero first char. */
  def validUei(s: String): Boolean =
    s.length == 12 && s.forall(c => c.isLetterOrDigit) &&
      !s.exists(c => c == 'I' || c == 'O') && s.head != '0'

  /** US NPI: 10 digits, Luhn over "80840" + first 9 digits. */
  def validNpi(s: String): Boolean =
    s.length == 10 && s.forall(_.isDigit) && luhn("80840" + s)
}
