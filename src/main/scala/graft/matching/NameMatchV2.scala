package graft.matching

import graft.model.Ftm
import graft.text.{Levenshtein, TextNorm}

/** Partial port of the logic-v2 name matcher
  * (`matching/logic_v2/names/match.py:170-244` + helpers): literal-match
  * short-circuit, symbol pairing for org-class and numeric tokens with
  * the reference's category scores/weights (`names/magic.py:8-45`),
  * greedy residual token alignment with per-part weights (extra query
  * parts 0.8, extra result parts 0.2, stopword damping, family-name
  * boost 1.3), name consolidation, schema type-tag routing (PER/ORG
  * alignment, OBJ whole-string strict levenshtein with the asymmetric
  * number-mismatch penalty, UNK scores 0).
  *
  * NOT ported (SURVEY §7.4 risk 1): rigour's full symbol lexicon
  * (nicknames, initials, domain/location terms) and script-aware
  * transliteration — symbols here cover the org-class table and numeric
  * parts; alignment operates on ascii-folded tokens. Weights/penalties
  * use the reference's published defaults (`logic_v2/model.py CONFIG`).
  */
object NameMatchV2 {

  val ExtraQueryWeight = 0.8
  val ExtraResultWeight = 0.2
  val FamilyNameWeight = 1.3
  val NumberMismatchPenalty = 0.3
  // magic.py category constants for the ported categories
  val OrgClassScore = 0.8
  val OrgClassWeight = 0.7
  val OrgClassExtraBias = 0.7
  val NumericWeight = 1.3
  val InitialScore = 0.9
  val InitialWeight = 0.5

  private def isStopword(t: String): Boolean =
    graft.blocker.EntityTokenizer.Stopwords.contains(t) ||
      ArabicParticles.contains(t)

  /** Arabic name particles, damped like stopwords (rigour's Arabic
    * cleanup): "Abd al-Aziz al-Nuristani" ~ "Abdul Aziz Nooristani".
    */
  private val ArabicParticles: Set[String] =
    Set("al", "el", "bin", "bint", "abu", "ibn")

  /** Generic organization words: when they match, they carry almost no
    * evidence (frozen run: "The Sigma Group" ~ "The Cigna Group" → 0.23
    * — the/group agree but the score collapses because the
    * discriminating token mismatches).
    */
  private val GenericOrgWords: Set[String] = Set(
    "the", "of", "and", "group", "trust", "foundation", "fund",
    "government", "ministry", "state", "holding", "holdings",
    "association", "institute", "society", "committee", "council",
    "organization", "organisation", "agency", "bureau", "office")
  val GenericOrgMatchWeight = 0.15

  /** Org-class symbol table: every surface form → canonical class, so
    * "limited" pairs with "ltd" as a symbol match. Russian org-form
    * transliterations keep their own canonical but share an alias group
    * with the English class (OAO ~ OJSC scores as a symbol pair, not a
    * literal one).
    */
  private val orgClass: Map[String, String] = {
    val m = graft.text.TextNorm.LegalForms
    (m.map { case (long, short) => long.replace(" ", "") -> short } ++
      m.values.map(v => v -> v)).toMap ++
      Map("oao" -> "oao", "zao" -> "zao", "ooo" -> "ooo", "pao" -> "pao",
        "ao" -> "ao", "ojsc" -> "ojsc", "cjsc" -> "cjsc", "pjsc" -> "pjsc",
        "jsc" -> "jsc", "bvba" -> "bvba", "sprl" -> "bvba")
  }

  /** Org-class shorts that appear glued to the name in sloppy data
    * ("ОООБАЗО"); longest-first so "ojsc" wins over "o…". "pao" is
    * deliberately absent — it prefixes ordinary name tokens ("Paolo"),
    * and splitting those destroys the adjacent-part merge.
    */
  private val GluedOrgPrefixes: Seq[String] =
    Seq("gmbh", "ojsc", "cjsc", "pjsc", "ooo", "oao", "zao")

  /** Cross-language equivalence groups over canonical classes. */
  private val classGroup: Map[String, String] = Map(
    "oao" -> "ojsc", "zao" -> "cjsc", "ooo" -> "llc", "pao" -> "pjsc",
    "ao" -> "jsc", "sarl" -> "sarl", "srl" -> "sarl", "bvba" -> "bv")

  private def groupOf(canon: String): String =
    classGroup.getOrElse(canon, canon)

  /** Canonical org class of a token, tolerating ≤2 edits against the
    * LONG surface forms only ("Aktiengeselschaft" still reads as AG).
    * The fuzzy arm requires keys ≥13 chars: at 11 chars ordinary words
    * collide ("cooperation" is 2 edits from "corporation" — fuzzing
    * that would score Shanghai Cooperation ~ Shanghai Corporation 1.0).
    */
  private def orgClassOf(t: String): Option[String] =
    orgClass.get(t).orElse {
      if (t.length < 11) None
      else orgClass.keysIterator
        .filter(k => k.length >= 13 && math.abs(k.length - t.length) <= 2)
        .find(k => Levenshtein.distance(t, k) <= 2)
        .map(orgClass)
    }

  private def isNumeric(t: String): Boolean = t.nonEmpty && t.forall(_.isDigit)

  /** True when a string carries logographic/syllabic CJK content —
    * edit distance is not a meaningful similarity there (one character
    * = one morpheme), and the reference scores such pairs 0 unless
    * equal (frozen run: 高石早苗 vs 高市早苗 → 0.0).
    */
  private def hasCjk(s: String): Boolean = s.exists { c =>
    val sc = Character.UnicodeScript.of(c)
    sc == Character.UnicodeScript.HAN ||
      sc == Character.UnicodeScript.HIRAGANA ||
      sc == Character.UnicodeScript.KATAKANA ||
      sc == Character.UnicodeScript.HANGUL
  }

  /** Fuzzy score for a residue part pair. The reference routes residues
    * through rigour's `compare_parts` DP (strict_levenshtein only
    * scores object names); measured against the frozen run, the closest
    * shape is 1 − d/shorter with an edit budget of shorter/4 capped at
    * 4 (Sukamto~Sukarno → 0 at budget 1, FridrichBuchenberg glued →
    * 0.944 at budget 4), and no fuzzy credit across CJK scripts.
    */
  private def strictSim(a: String, b: String): Double = {
    if (a == b) return 1.0
    if (hasCjk(a) || hasCjk(b)) return 0.0
    val shorter = math.min(a.length, b.length)
    val cap = math.min(4, shorter / 4)
    if (cap < 1) return 0.0
    val d = Levenshtein.distance(a, b)
    if (d > cap) 0.0 else 1.0 - d.toDouble / shorter
  }

  private final case class Aligned(q: Option[String], r: Option[String],
      var score: Double, var weight: Double)

  /** Score one (query name, result name) pair via greedy best-first part
    * alignment with the v2 weight policy.
    */
  def scoreNamePair(qParts0: List[String], rParts0: List[String],
      person: Boolean): Double = {
    if (qParts0.isEmpty || rParts0.isEmpty) return 0.0
    val qFamily = qParts0.lastOption.toSet
    val rFamily = rParts0.lastOption.toSet
    var qRem = qParts0
    var rRem = rParts0
    val matches = scala.collection.mutable.ListBuffer.empty[Aligned]
    // Stage 1 — symbol pairing (magic.py): org-class tokens pair by
    // canonical class (limited~ltd, fuzzy long forms) at 1.0 when the
    // class is identical, 0.8 when only the cross-language alias group
    // agrees (OAO ~ OJSC); weight 0.7 either way.
    for (qp <- qParts0.distinct; qc <- orgClassOf(qp)) {
      rRem.iterator.flatMap(rp => orgClassOf(rp).map(rp -> _))
        .find { case (_, rc) => rc == qc || groupOf(rc) == groupOf(qc) }
        .foreach { case (rp, rc) =>
          if (qRem.contains(qp)) {
            qRem = Features.remove1(qRem, qp)
            rRem = Features.remove1(rRem, rp)
            matches += Aligned(Some(qp), Some(rp),
              if (qc == rc) 1.0 else OrgClassScore, OrgClassWeight)
          }
        }
    }
    // Stage 1b — initials pairing: a single-letter part pairs with a
    // part starting with that letter on the other side, but carries NO
    // positive evidence (frozen run: "V. Putin" ~ "Vladimir Putin" →
    // 0.50 — the initial consumes both parts at score 0, full weight,
    // rather than rewarding or double-penalizing them as extras).
    // An initial only consumes a full part that has no exact twin
    // waiting on the other side, and only when the initial itself can't
    // exact-match ("Frost, William W." ~ "William W Frost" must align
    // w~w and william~william, not w~william).
    def pairInitials(): Unit = {
      for (qp <- qRem.distinct
           if qp.length == 1 && qp.head.isLetter && !rRem.contains(qp)) {
        rRem.find(rp => rp.length > 1 && rp.head == qp.head &&
            !qRem.contains(rp)).foreach { rp =>
          if (qRem.contains(qp)) {
            qRem = Features.remove1(qRem, qp)
            rRem = Features.remove1(rRem, rp)
            matches += Aligned(Some(qp), Some(rp), 0.0, 1.0)
          }
        }
      }
      for (rp <- rRem.distinct
           if rp.length == 1 && rp.head.isLetter && !qRem.contains(rp)) {
        qRem.find(qp => qp.length > 1 && qp.head == rp.head &&
            !rRem.contains(qp)).foreach { qp =>
          if (rRem.contains(rp)) {
            qRem = Features.remove1(qRem, qp)
            rRem = Features.remove1(rRem, rp)
            matches += Aligned(Some(qp), Some(rp), 0.0, 1.0)
          }
        }
      }
    }
    pairInitials()
    // Stage 2 — greedy fuzzy alignment of the residue. (No phonetic
    // credit here: the frozen run scores metaphone-equal-but-distinct
    // names like Tom~Tim at zero; its Husayn~Hussein credit comes from
    // a curated variant lexicon this port does not carry.)
    val cand = (for {
      qp <- qRem.distinct
      rp <- rRem.distinct
      s = strictSim(qp, rp)
      if s > 0.0
    } yield (qp, rp, s)).sortBy(t => (-t._3, t._1, t._2))
    for ((qp, rp, s) <- cand) {
      while (qRem.contains(qp) && rRem.contains(rp)) {
        qRem = Features.remove1(qRem, qp)
        rRem = Features.remove1(rRem, rp)
        val w = if (isNumeric(qp) && isNumeric(rp)) NumericWeight else 1.0
        matches += Aligned(Some(qp), Some(rp), s, w)
      }
    }
    // Stage 3 — extras with per-category bias (weight_extra_match).
    def extraBias(p: String): Double =
      if (isStopword(p)) 0.5
      else if (orgClass.contains(p)) OrgClassExtraBias
      else if (isNumeric(p)) NumericWeight
      else 1.0
    qRem.foreach(p =>
      matches += Aligned(Some(p), None, 0.0, ExtraQueryWeight * extraBias(p)))
    rRem.foreach(p =>
      matches += Aligned(None, Some(p), 0.0, ExtraResultWeight * extraBias(p)))
    // Stage 4 — contextual weight normalisation on matched edges.
    for (m <- matches if m.q.nonEmpty && m.r.nonEmpty) {
      if (!person &&
        (m.q.exists(GenericOrgWords) || m.r.exists(GenericOrgWords)))
        m.weight = GenericOrgMatchWeight
      else if (m.q.exists(isStopword) || m.r.exists(isStopword))
        m.weight *= 0.7
      if (person && (m.q.exists(qFamily) || m.r.exists(rFamily)))
        m.weight *= FamilyNameWeight
    }
    // Two or more matched initials are strong evidence alongside a full
    // exact part (frozen: "J.-C. Juncker" ~ "Jean-Claude Juncker" →
    // 0.95) while a lone initial stays neutral ("V. Putin" ~
    // "Vladimir Putin" → 0.50).
    val initPairs = matches.filter(m => m.score == 0.0 &&
      ((m.q.exists(_.length == 1) && m.r.exists(_.length > 1)) ||
        (m.r.exists(_.length == 1) && m.q.exists(_.length > 1))))
    if (initPairs.size >= 2 &&
      matches.exists(m => m.score == 1.0 && m.q.exists(_.length > 1))) {
      initPairs.foreach { m =>
        m.score = InitialScore
        m.weight = InitialWeight
      }
    }
    val totalWeight = matches.map(_.weight).sum
    if (totalWeight <= 0.0) 0.0
    else matches.map(m => m.score * m.weight).sum / totalWeight
  }

  /** Vessel-style object-name prefixes stripped before comparison
    * (rigour `remove_obj_prefixes`): MV/MT/MS/SS/FV/MY/SY/RV. Names
    * arrive fingerprint-cleaned, where "M/V"/"M.V." have become "m v" —
    * so the pattern matches the cleaned forms, not raw punctuation.
    */
  private val ObjPrefix =
    "^(?:m v|m t|m s|f v|s s|mv|mt|ms|ss|fv|my|sy|rv)\\s+".r

  def removeObjPrefixes(name: String): String =
    ObjPrefix.replaceFirstIn(name, "")

  /** Asymmetric numeral check (`logic_v2/names/util.py numbers_mismatch`):
    * true when the query carries a number the result lacks.
    */
  private def numbersMismatch(qName: String, rName: String): Boolean = {
    val num = "\\d+".r
    val qNums = num.findAllIn(qName).toSet
    val rNums = num.findAllIn(rName).toSet
    qNums.diff(rNums).nonEmpty
  }

  /** Object-name matching (`match.py match_object_names`): whole-string
    * strict levenshtein at max_rate 5 over prefix-stripped normalized
    * names, with the number-mismatch penalty.
    */
  private def matchObjectNames(qn: Seq[String], rn: Seq[String]): Double = {
    var best = 0.0
    for (a0 <- qn; b0 <- rn) {
      val a = removeObjPrefixes(a0)
      val b = removeObjPrefixes(b0)
      var s = Levenshtein.strictLev(a, b, maxRate = 5)
      if (numbersMismatch(a, b)) s *= (1.0 - NumberMismatchPenalty)
      best = math.max(best, s)
    }
    best
  }

  /** Number words → digit tokens (rigour's ordinal/cardinal symbols):
    * "Brigade Forty-Four" aligns with "Brigade 44". Adjacent tens+units
    * combine; common misspellings of the tens included.
    */
  private val NumberWords: Map[String, Int] = Map(
    "zero" -> 0, "one" -> 1, "two" -> 2, "three" -> 3, "four" -> 4,
    "five" -> 5, "six" -> 6, "seven" -> 7, "eight" -> 8, "nine" -> 9,
    "ten" -> 10, "eleven" -> 11, "twelve" -> 12, "thirteen" -> 13,
    "fourteen" -> 14, "fifteen" -> 15, "sixteen" -> 16,
    "seventeen" -> 17, "eighteen" -> 18, "nineteen" -> 19,
    "twenty" -> 20, "thirty" -> 30, "forty" -> 40, "fourty" -> 40,
    "fifty" -> 50, "sixty" -> 60, "seventy" -> 70, "eighty" -> 80,
    "ninety" -> 90)

  private def numberizeParts(parts: List[String]): List[String] = {
    def go(xs: List[String]): List[String] = xs match {
      case a :: b :: rest if NumberWords.contains(a) &&
          NumberWords(a) >= 20 && NumberWords(a) % 10 == 0 &&
          NumberWords.get(b).exists(v => v >= 1 && v <= 9) =>
        (NumberWords(a) + NumberWords(b)).toString :: go(rest)
      case a :: rest if NumberWords.contains(a) =>
        NumberWords(a).toString :: go(rest)
      case a :: rest => a :: go(rest)
      case Nil => Nil
    }
    go(parts)
  }

  /** Collapse runs of ≥2 consecutive single-letter parts into one glued
    * token: initialisms are ordered ("C.B.A." must not multiset-match
    * "A.B.C."), and the glued form matches its spelled-out sibling
    * ("S.A.R.L." ~ "SARL").
    */
  def collapseInitialRuns(parts: List[String]): List[String] = {
    def go(xs: List[String]): List[String] = {
      val (run, rest) = xs.span(p => p.length == 1 && p.head.isLetter)
      if (run.size >= 2) run.mkString :: goTail(rest)
      else if (run.size == 1) run.head :: goTail(rest)
      else goTail(rest)
    }
    def goTail(xs: List[String]): List[String] = xs match {
      case Nil => Nil
      case h :: t if h.length == 1 && h.head.isLetter => go(xs)
      case h :: t => h :: go(t)
    }
    go(parts)
  }

  /** Merge adjacent parts whose glued form appears verbatim on the other
    * side (rigour `compare_parts` cluster merging): "Good Will" aligns
    * with "Goodwill", "Patr ushev" with "Patrushev".
    */
  def mergeAdjacent(parts: List[String], other: Set[String]): List[String] =
    parts match {
      case a :: b :: rest if other.contains(a + b) =>
        (a + b) :: mergeAdjacent(rest, other)
      case h :: t => h :: mergeAdjacent(t, other)
      case Nil => Nil
    }

  /** Drop names whose token multiset is contained in a longer name on
    * the same side (`Name.consolidate_names`): prevents a short variant
    * ("John Smith") from outscoring the discriminating long form
    * ("John K Smith" vs "John R Smith").
    */
  def consolidateNames(names: Seq[List[String]]): Seq[List[String]] = {
    def subMultiset(a: List[String], b: List[String]): Boolean = {
      val bc = scala.collection.mutable.Map.empty[String, Int]
      b.foreach(t => bc(t) = bc.getOrElse(t, 0) + 1)
      a.forall { t =>
        val c = bc.getOrElse(t, 0)
        if (c > 0) { bc(t) = c - 1; true } else false
      }
    }
    val sorted = names.distinct.sortBy(n => (-n.size, n.mkString(" ")))
    sorted.foldLeft(List.empty[List[String]]) { (kept, n) =>
      if (kept.exists(k => subMultiset(n, k))) kept else n :: kept
    }.reverse
  }

  /** The v2 `name_match` feature (`match.py name_match`): UNK schemata
    * score 0; OBJ goes through whole-string object matching; PER/ORG
    * take literal short-circuit → name consolidation → best aligned
    * pair over the name product.
    */
  val nameMatch: Features.Feature = (q, r) => {
    val tag = Ftm.nameTypeTag(Ftm.commonSchema(Seq(q.schema, r.schema)))
    // fingerprint normalization: ascii fold + romanization + person
    // prefixes + legal-form replacement ("Gesellschaft mit beschränkter
    // Haftung" → "gmbh"), per rigour's org-type normalization
    val qn = q.names.flatMap(n => TextNorm.fingerprintName(n)).distinct
    val rn = r.names.flatMap(n => TextNorm.fingerprintName(n)).distinct
    if (qn.isEmpty || rn.isEmpty || tag == Ftm.UNK) 0.0
    else if (tag == Ftm.OBJ) matchObjectNames(qn, rn)
    else if (qn.toSet.intersect(rn.toSet).nonEmpty) 1.0 // literal rescue
    else {
      val person = tag == Ftm.PER
      // glued org-class prefixes split off ("ОООБАЗО" → ooo + bazo)
      def splitOrgPrefix(p: String): List[String] =
        GluedOrgPrefixes.find(k =>
          p.length >= k.length + 2 && p.startsWith(k)) match {
          case Some(k) => List(k, p.drop(k.length))
          case None => List(p)
        }
      // multi-token org phrases collapse to their class short BEFORE
      // alignment: a truncated/misspelled "Joint Stock Compan" still
      // glues to "jointstockcompan", fuzzy-resolves to jsc, and pairs
      // with the other side's replaced "jsc" instead of bleeding three
      // unmatched extra tokens
      def collapseOrgPhrases(parts: List[String]): List[String] =
        parts match {
          case a :: b :: c :: rest
              if orgClassOf(a + b + c).isDefined && (a + b + c).length >= 8 =>
            orgClassOf(a + b + c).get :: collapseOrgPhrases(rest)
          case a :: b :: rest
              if orgClassOf(a + b).isDefined && (a + b).length >= 8 =>
            orgClassOf(a + b).get :: collapseOrgPhrases(rest)
          case h :: t => h :: collapseOrgPhrases(t)
          case Nil => Nil
        }
      def prep(names: Seq[String]): Seq[List[String]] =
        consolidateNames(names.map { n =>
          val parts = numberizeParts(n.split(' ').toList)
          // initialism runs stay ordered for orgs; person initials pair
          // individually in scoreNamePair's INITIAL stage
          if (person) parts
          else collapseOrgPhrases(
            collapseInitialRuns(parts).flatMap(splitOrgPrefix))
        })
      val qParts = prep(qn)
      val rParts = prep(rn)
      var best = 0.0
      for (a0 <- qParts; b0 <- rParts if best < 1.0) {
        // cluster merging: glue adjacent parts that appear glued on the
        // other side ("Good Will" ~ "Goodwill", "Patr ushev" ~
        // "Patrushev")
        val a = mergeAdjacent(a0, b0.toSet)
        val b = mergeAdjacent(b0, a.toSet)
        best = math.max(best, scoreNamePair(a, b, person))
        // clustering: a single-part name vs the other side glued
        // without spaces ("PolPot"~"Pol Pot"; rigour compare_parts
        // merges adjacent parts into clusters)
        if (a.size == 1 || b.size == 1)
          best = math.max(best, strictSim(a.mkString, b.mkString))
        // acronym (INITIAL symbol): any part spelling the other side's
        // first letters ("PLA"~"People's Liberation Army", also with
        // trailing extra parts like "PLA China")
        val aInit = a.filter(_.length > 1).map(_.head).mkString
        val bInit = b.filter(_.length > 1).map(_.head).mkString
        val acro = // ≥3 letters: 2-letter "initials" collide (BD ~ BP)
          (bInit.length >= 3 && a.exists(p => p.length >= 3 && p == bInit)) ||
            (aInit.length >= 3 && b.exists(p => p.length >= 3 && p == aInit))
        if (acro) best = math.max(best, InitialScore)
      }
      best
    }
  }
}
