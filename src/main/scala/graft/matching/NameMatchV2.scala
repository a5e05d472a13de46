package graft.matching

import graft.text.{Levenshtein, TextNorm}

/** Partial port of the logic-v2 name matcher
  * (`matching/logic_v2/names/match.py:170-244` + helpers): literal-match
  * short-circuit, symbol pairing for org-class and numeric tokens with
  * the reference's category scores/weights (`names/magic.py:8-45`),
  * greedy residual token alignment with per-part weights (extra query
  * parts 0.8, extra result parts 0.2, stopword damping, family-name
  * boost 1.3), and the number-mismatch penalty for non-person names.
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

  /** Strict fuzzy score for a part pair (`logic_v2/names/distance.py`
    * shape): bounded levenshtein similarity, zero below the cutoff.
    */
  private def strictSim(a: String, b: String): Double =
    Levenshtein.similarity(a, b)

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

  /** The v2 `name_match` feature: literal short-circuit, best pair over
    * the name product, object-number penalty.
    */
  val nameMatch: Features.Feature = (q, r) => {
    val person = q.isA("Person") && r.isA("Person")
    val qn = q.names.flatMap(n => TextNorm.cleanNameAscii(n)).distinct
    val rn = r.names.flatMap(n => TextNorm.cleanNameAscii(n)).distinct
    if (qn.isEmpty || rn.isEmpty) 0.0
    else if (qn.toSet.intersect(rn.toSet).nonEmpty) 1.0 // literal rescue
    else {
      var best = 0.0
      for (a <- qn; b <- rn) {
        best = math.max(best,
          scoreNamePair(a.split(' ').toList, b.split(' ').toList, person))
      }
      // number-mismatch penalty for non-person names
      // (`match_object_names`, nm_number_mismatch default 0.3)
      if (!person) {
        val qNums = TextNorm.extractNumbers(q.names)
        val rNums = TextNorm.extractNumbers(r.names)
        if (qNums.nonEmpty && rNums.nonEmpty &&
          qNums.intersect(rNums).isEmpty)
          best *= (1.0 - NumberMismatchPenalty)
      }
      best
    }
  }
}
