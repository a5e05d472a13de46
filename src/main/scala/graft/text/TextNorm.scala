package graft.text

/** Pure-Scala name normalization: the engine's stand-in for the
  * fingerprints/rigour cleanup chain the reference wraps in
  * `matching/compat.py:27-59` (lowercase, person-prefix removal, ascii
  * fold, legal-form replacement, space squash). Pure functions — unit
  * testable without Spark, shared by the tokenizer and every comparator.
  */
object TextNorm {

  private val accentMap: Map[Char, String] = Map(
    'à' -> "a", 'á' -> "a", 'â' -> "a", 'ã' -> "a", 'ä' -> "a", 'å' -> "a",
    'æ' -> "ae", 'ç' -> "c", 'è' -> "e", 'é' -> "e", 'ê' -> "e", 'ë' -> "e",
    'ì' -> "i", 'í' -> "i", 'î' -> "i", 'ï' -> "i", 'ñ' -> "n", 'ò' -> "o",
    'ó' -> "o", 'ô' -> "o", 'õ' -> "o", 'ö' -> "o", 'ø' -> "o", 'ù' -> "u",
    'ú' -> "u", 'û' -> "u", 'ü' -> "u", 'ý' -> "y", 'ÿ' -> "y", 'ß' -> "ss",
    'š' -> "s", 'ž' -> "z", 'đ' -> "d", 'ł' -> "l", 'ć' -> "c", 'č' -> "c")

  /** Cyrillic → Latin romanization (BGN/PCGN-style, the common
    * transliteration the reference gets from rigour's script handling).
    */
  private val cyrillicMap: Map[Char, String] = Map(
    'а' -> "a", 'б' -> "b", 'в' -> "v", 'г' -> "g", 'д' -> "d",
    'е' -> "e", 'ё' -> "e", 'ж' -> "zh", 'з' -> "z", 'и' -> "i",
    'й' -> "y", 'к' -> "k", 'л' -> "l", 'м' -> "m", 'н' -> "n",
    'о' -> "o", 'п' -> "p", 'р' -> "r", 'с' -> "s", 'т' -> "t",
    'у' -> "u", 'ф' -> "f", 'х' -> "kh", 'ц' -> "ts", 'ч' -> "ch",
    'ш' -> "sh", 'щ' -> "shch", 'ъ' -> "", 'ы' -> "y", 'ь' -> "",
    'э' -> "e", 'ю' -> "yu", 'я' -> "ya",
    'і' -> "i", 'ї' -> "yi", 'є' -> "ye", 'ґ' -> "g")

  /** Lowercase + latin accent fold + cyrillic romanization. */
  def foldAscii(s: String): String =
    s.toLowerCase.flatMap(c =>
      accentMap.getOrElse(c, cyrillicMap.getOrElse(c, c.toString)))

  /** Light cleanup (`clean_name_light`): lowercase, squash whitespace,
    * keep letters/digits/spaces.
    */
  def cleanNameLight(s: String): Option[String] = {
    val out = s.toLowerCase.map(c =>
      if (c.isLetterOrDigit) c else ' ').replaceAll("\\s+", " ").trim
    if (out.isEmpty) None else Some(out)
  }

  /** Hard cleanup (`clean_name_ascii`): fold accents then light-clean. */
  def cleanNameAscii(s: String): Option[String] =
    cleanNameLight(foldAscii(s))

  /** Person-name prefixes removed before fingerprinting (subset of
    * rigour's `remove_person_prefixes`).
    */
  val PersonPrefixes: Seq[String] = Seq(
    "mr", "mrs", "ms", "miss", "dr", "prof", "sir", "herr", "frau",
    "monsieur", "madame", "mme", "dott", "shri", "smt")

  def removePersonPrefixes(name: String): String = {
    var out = name
    var changed = true
    while (changed) {
      changed = false
      for (p <- PersonPrefixes) {
        if (out.startsWith(p + " ") || out.startsWith(p + ". ")) {
          out = out.stripPrefix(p).stripPrefix(".").trim
          changed = true
        }
      }
    }
    out
  }

  /** Legal-form replacements (subset of the fingerprints `replace_types`
    * table — enough for the fixture corpora; extend as data demands).
    */
  val LegalForms: Map[String, String] = Map(
    "limited" -> "ltd", "incorporated" -> "inc", "corporation" -> "corp",
    "company" -> "co", "aktiengesellschaft" -> "ag",
    "gesellschaft mit beschrankter haftung" -> "gmbh",
    "societe anonyme" -> "sa", "public limited company" -> "plc",
    "limited liability company" -> "llc",
    "kommanditgesellschaft" -> "kg", "offene handelsgesellschaft" -> "ohg",
    "eingetragener verein" -> "ev", "e v" -> "ev",
    "societe a responsabilite limitee" -> "sarl")

  private def replaceLegalForms(s: String): String = {
    var out = s
    for ((long, short) <- LegalForms)
      out = out.replaceAll(s"\\b${java.util.regex.Pattern.quote(long)}\\b", short)
    out
  }

  /** Legal-entity name fingerprint (`fingerprint_name`,
    * `matching/compat.py:27-41`): lowercase → strip person prefixes →
    * ascii clean → legal-form replace → squash.
    */
  def fingerprintName(original: String): Option[String] =
    cleanNameAscii(removePersonPrefixes(original.toLowerCase)) match {
      case None => None
      case Some(cleaned) =>
        val replaced = replaceLegalForms(cleaned).replaceAll("\\s+", " ").trim
        if (replaced.isEmpty) None else Some(replaced)
    }

  /** Words of a (cleaned) name, min length filter. */
  def nameWords(name: Option[String], minLength: Int = 1): List[String] =
    name.toList.flatMap(_.split(' ')).filter(_.length >= minLength)

  /** Tokens over all names via fingerprint (`names_word_list`). */
  def namesWordList(names: Seq[String], minLength: Int = 1): List[String] =
    names.toList.flatMap(n => nameWords(fingerprintName(n), minLength))

  private val NumRe = "\\d+".r

  /** All digit runs across values (`extract_numbers`). */
  def extractNumbers(values: Seq[String]): Set[String] =
    values.flatMap(v => NumRe.findAllIn(v)).toSet

  /** Identifier cleanup: uppercase, strip non-alphanumerics (the
    * generic arm of `StrictFormat.normalize`).
    */
  def cleanIdentifier(s: String): Option[String] = {
    val out = s.toUpperCase.replaceAll("[^A-Z0-9]", "")
    if (out.length < 3) None else Some(out)
  }
}
