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
    graft.blocker.EntityTokenizer.Stopwords.contains(t)

  /** Org-class symbol table: every surface form → canonical class, so
    * "limited" pairs with "ltd" as a symbol match.
    */
  private val orgClass: Map[String, String] = {
    val m = graft.text.TextNorm.LegalForms
    (m.map { case (long, short) => long.replace(" ", "") -> short } ++
      m.values.map(v => v -> v)).toMap
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
      score: Double, var weight: Double)

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
    // canonical class (limited~ltd) at score 0.8 / weight 0.7, rescued
    // to 1.0 on literal equality.
    for (qp <- qParts0.distinct; c <- orgClass.get(qp)) {
      rRem.find(rp => orgClass.get(rp).contains(c)).foreach { rp =>
        if (qRem.contains(qp)) {
          qRem = removeOne(qRem, qp)
          rRem = removeOne(rRem, rp)
          matches += Aligned(Some(qp), Some(rp),
            if (qp == rp) 1.0 else OrgClassScore, OrgClassWeight)
        }
      }
    }
    // Stage 1b — initials pairing: a single-letter part matches a part
    // starting with that letter on the other side (INITIAL category).
    def pairInitials(): Unit = {
      for (qp <- qRem.distinct if qp.length == 1 && qp.head.isLetter) {
        rRem.find(rp => rp.length > 1 && rp.head == qp.head).foreach { rp =>
          if (qRem.contains(qp)) {
            qRem = removeOne(qRem, qp)
            rRem = removeOne(rRem, rp)
            matches += Aligned(Some(qp), Some(rp), InitialScore,
              InitialWeight)
          }
        }
      }
      for (rp <- rRem.distinct if rp.length == 1 && rp.head.isLetter) {
        qRem.find(qp => qp.length > 1 && qp.head == rp.head).foreach { qp =>
          if (rRem.contains(rp)) {
            qRem = removeOne(qRem, qp)
            rRem = removeOne(rRem, rp)
            matches += Aligned(Some(qp), Some(rp), InitialScore,
              InitialWeight)
          }
        }
      }
    }
    pairInitials()
    // Stage 2 — greedy fuzzy alignment of the residue.
    val cand = (for {
      qp <- qRem.distinct
      rp <- rRem.distinct
      s = strictSim(qp, rp)
      if s > 0.0
    } yield (qp, rp, s)).sortBy(t => (-t._3, t._1, t._2))
    for ((qp, rp, s) <- cand) {
      while (qRem.contains(qp) && rRem.contains(rp)) {
        qRem = removeOne(qRem, qp)
        rRem = removeOne(rRem, rp)
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
      if (m.q.exists(isStopword) || m.r.exists(isStopword)) m.weight *= 0.7
      if (person && (m.q.exists(qFamily) || m.r.exists(rFamily)))
        m.weight *= FamilyNameWeight
    }
    val totalWeight = matches.map(_.weight).sum
    if (totalWeight <= 0.0) 0.0
    else matches.map(m => m.score * m.weight).sum / totalWeight
  }

  private def removeOne(xs: List[String], x: String): List[String] = {
    val i = xs.indexOf(x)
    if (i < 0) xs else xs.take(i) ++ xs.drop(i + 1)
  }

  /** Vessel-style object-name prefixes stripped before comparison
    * (rigour `remove_obj_prefixes`): MV/MT/MS/SS/FV/MY/SY/RV with
    * optional punctuation.
    */
  private val ObjPrefix =
    "^(?:m/v|m/t|m/s|f/v|s/s|mv|mt|ms|ss|fv|my|sy|rv)[.\\s]+".r

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
    val qn = q.names.flatMap(n => TextNorm.cleanNameAscii(n)).distinct
    val rn = r.names.flatMap(n => TextNorm.cleanNameAscii(n)).distinct
    if (qn.isEmpty || rn.isEmpty || tag == Ftm.UNK) 0.0
    else if (tag == Ftm.OBJ) matchObjectNames(qn, rn)
    else if (qn.toSet.intersect(rn.toSet).nonEmpty) 1.0 // literal rescue
    else {
      val person = tag == Ftm.PER
      val qParts = consolidateNames(qn.map(_.split(' ').toList))
      val rParts = consolidateNames(rn.map(_.split(' ').toList))
      var best = 0.0
      for (a <- qParts; b <- rParts if best < 1.0) {
        best = math.max(best, scoreNamePair(a, b, person))
        // clustering: a single-part name vs the other side glued
        // without spaces ("PolPot"~"Pol Pot"; rigour compare_parts
        // merges adjacent parts into clusters)
        if (a.size == 1 || b.size == 1)
          best = math.max(best, strictSim(a.mkString, b.mkString))
        // acronym (INITIAL symbol): single part spelling the other
        // side's first letters ("PLA"~"People's Liberation Army")
        val acro =
          (a.size == 1 && b.size > 1 && a.head == b.map(_.head).mkString) ||
            (b.size == 1 && a.size > 1 && b.head == a.map(_.head).mkString)
        if (acro) best = math.max(best, InitialScore)
      }
      best
    }
  }
}
