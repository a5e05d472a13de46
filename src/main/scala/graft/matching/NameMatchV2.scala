package graft.matching

import graft.text.{Levenshtein, TextNorm}

/** Partial port of the logic-v2 name matcher
  * (`matching/logic_v2/names/match.py:170-244` + helpers): literal-match
  * short-circuit, greedy token alignment with per-part weights (extra
  * query parts 0.8, extra result parts 0.2, stopword damping 0.7,
  * family-name boost 1.3), and the number-mismatch penalty for
  * non-person names.
  *
  * NOT ported (SURVEY §7.4 risk 1): rigour's symbol lexicon pairing
  * (`sy:` org-type/initials symbols, `names/magic.py`) and script-aware
  * transliteration — alignment here operates on ascii-folded tokens
  * only. The weights/penalties use the reference's published defaults
  * (`logic_v2/model.py CONFIG`).
  */
object NameMatchV2 {

  val ExtraQueryWeight = 0.8
  val ExtraResultWeight = 0.2
  val FamilyNameWeight = 1.3
  val NumberMismatchPenalty = 0.3

  private def isStopword(t: String): Boolean =
    graft.blocker.EntityTokenizer.Stopwords.contains(t)

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
    val cand = (for {
      qp <- qParts0.distinct
      rp <- rParts0.distinct
      s = strictSim(qp, rp)
      if s > 0.0
    } yield (qp, rp, s)).sortBy(t => (-t._3, t._1, t._2))
    var qRem = qParts0
    var rRem = rParts0
    val matches = scala.collection.mutable.ListBuffer.empty[Aligned]
    for ((qp, rp, s) <- cand) {
      while (qRem.contains(qp) && rRem.contains(rp)) {
        qRem = removeOne(qRem, qp)
        rRem = removeOne(rRem, rp)
        matches += Aligned(Some(qp), Some(rp), s, 1.0)
      }
    }
    qRem.foreach(p => matches += Aligned(Some(p), None, 0.0, ExtraQueryWeight))
    rRem.foreach(p => matches += Aligned(None, Some(p), 0.0, ExtraResultWeight))
    for (m <- matches) {
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
