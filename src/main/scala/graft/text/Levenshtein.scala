package graft.text

/** Damerau-Levenshtein distance plus the rigour-style bounded similarity
  * and plausibility gate the reference's name comparators use
  * (`matching/compare/names.py:26-27,83` via rigour.text.distance).
  */
object Levenshtein {

  /** Damerau-Levenshtein (optimal string alignment variant). */
  def distance(a: String, b: String): Int = {
    val la = a.length
    val lb = b.length
    if (la == 0) return lb
    if (lb == 0) return la
    val d = Array.ofDim[Int](la + 1, lb + 1)
    for (i <- 0 to la) d(i)(0) = i
    for (j <- 0 to lb) d(0)(j) = j
    for (i <- 1 to la; j <- 1 to lb) {
      val cost = if (a(i - 1) == b(j - 1)) 0 else 1
      var v = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + cost)
      if (i > 1 && j > 1 && a(i - 1) == b(j - 2) && a(i - 2) == b(j - 1))
        v = math.min(v, d(i - 2)(j - 2) + cost)
      d(i)(j) = v
    }
    d(la)(lb)
  }

  /** Bounded similarity: 0 unless the distance fits within
    * min(maxEdits, ceil(maxPercent · shorter-length)); else
    * 1 − dist/shorter-length (rigour `levenshtein_similarity` shape).
    */
  def similarity(a: String, b: String, maxEdits: Int = 4,
      maxPercent: Double = 0.2): Double = {
    if (a.isEmpty || b.isEmpty) return 0.0
    val dist = distance(a, b)
    if (dist == 0) return 1.0
    val shorter = math.min(a.length, b.length)
    val cap = math.min(maxEdits, math.ceil(shorter * maxPercent).toInt)
    if (dist > cap) 0.0
    else 1.0 - dist.toDouble / shorter
  }

  /** Plain Levenshtein (no transpositions) — the metric under the
    * logic-v2 strict distance (`logic_v2/names/distance.py`).
    */
  def plainDistance(a: String, b: String): Int = {
    val la = a.length
    val lb = b.length
    if (la == 0) return lb
    if (lb == 0) return la
    var prev = Array.tabulate(lb + 1)(identity)
    var cur = new Array[Int](lb + 1)
    for (i <- 1 to la) {
      cur(0) = i
      for (j <- 1 to lb) {
        val cost = if (a(i - 1) == b(j - 1)) 0 else 1
        cur(j) = math.min(math.min(prev(j) + 1, cur(j - 1) + 1),
          prev(j - 1) + cost)
      }
      val t = prev; prev = cur; cur = t
    }
    prev(lb)
  }

  /** The logic-v2 strict similarity (`logic_v2/names/distance.py:8-20`):
    * equality → 1; the edit budget is `max_len / maxRate` (integer
    * division, so short strings get none); within budget the score is
    * `(1 − d/max_len)^budget`, else 0.
    */
  def strictLev(a: String, b: String, maxRate: Int = 4): Double = {
    if (a == b) return 1.0
    val maxLen = math.max(a.length, b.length)
    val maxEdits = maxLen / maxRate
    if (maxEdits < 1) return 0.0
    val d = plainDistance(a, b)
    if (d > maxEdits) 0.0
    else math.pow(1.0 - d.toDouble / maxLen, maxEdits.toDouble)
  }

  /** Unbounded similarity over the longer length (used by orgid
    * tolerance, `matching/name_based/misc.py:82-88`).
    */
  def ratio(a: String, b: String): Double = {
    val maxLen = math.max(a.length, b.length)
    if (maxLen == 0) return 1.0
    1.0 - distance(a, b).toDouble / maxLen
  }

  /** Plausibility gate for name-part alignment (rigour
    * `is_levenshtein_plausible` shape): the distance must fit within
    * min(maxEdits, ceil(maxPercent · shorter-length)).
    */
  def plausible(a: String, b: String, maxEdits: Int = 4,
      maxPercent: Double = 0.2): Boolean = {
    val shorter = math.min(a.length, b.length)
    val cap = math.min(maxEdits, math.ceil(shorter * maxPercent).toInt)
    distance(a, b) <= cap
  }
}
