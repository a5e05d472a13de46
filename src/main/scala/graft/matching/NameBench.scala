package graft.matching

/** The name-comparator scoreboard harness (reference
  * `contrib/name_bench/perf.py:1-16` + `run.py` loader): accuracy
  * (precision / recall / F1 at a decision threshold) combined with
  * timing (mean / p50 / p95 / total μs per call) for each registered
  * comparator over the published `cases.csv`, plus a leaderboard of the
  * slowest cases (typically long ORG names — the alignment matrix
  * grows with parts²). Driver-side and single-threaded like the
  * matcher micro-bench: this measures the per-call comparator, not a
  * cluster job.
  */
object NameBench {

  final case class NameCase(schema: String, name1: String, name2: String,
      isMatch: Boolean, quality: String)

  /** Minimal RFC-ish CSV field splitter (quoted fields, no embedded
    * newlines — matches the fixture files).
    */
  def parseCsvLine(line: String): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    val sb = new StringBuilder
    var inQ = false
    while (i < line.length) {
      val c = line(i)
      if (inQ) {
        if (c == '"') inQ = false else sb += c
      } else c match {
        case '"' => inQ = true
        case ',' => out += sb.toString; sb.clear()
        case _ => sb += c
      }
      i += 1
    }
    out += sb.toString
    out.toArray
  }

  /** Header-indexed CSV rows, decoded tolerantly (the fixtures carry
    * multi-script names; malformed bytes are replaced, not fatal).
    */
  def readCsv(path: String): Seq[Map[String, String]] = {
    val bytes = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path))
    val dec = java.nio.charset.StandardCharsets.UTF_8.newDecoder()
      .onMalformedInput(java.nio.charset.CodingErrorAction.REPLACE)
      .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPLACE)
    val text = dec.decode(java.nio.ByteBuffer.wrap(bytes)).toString
    val lines = text.linesIterator.toList
    val header = parseCsvLine(lines.head)
    lines.tail.filter(_.nonEmpty).map { l =>
      header.zip(parseCsvLine(l)).toMap
    }
  }

  def loadCases(path: String): Seq[NameCase] =
    readCsv(path).flatMap { r =>
      try Some(NameCase(r("schema"), r("name1"), r("name2"),
        r("is_match").toBoolean, r.getOrElse("quality", "")))
      catch { case _: Exception => None }
    }

  /** A comparator: (schema, name1, name2) → score in [0, 1]. */
  type Comparator = (String, String, String) => Double

  private def nameView(schema: String, name: String): EntityView =
    EntityView("x", schema, Seq(name), Nil, Nil, Nil, Nil, Nil, Nil, Nil,
      Nil)

  private def algoComparator(a: Algorithms.Algo): Comparator =
    (schema, n1, n2) => a.score(nameView(schema, n1), nameView(schema, n2))

  /** The registered comparators: the scoring algorithms that work from
    * names alone, plus the raw string comparators as floors.
    */
  val comparators: Seq[(String, Comparator)] = Seq(
    "logic-v2" -> algoComparator(Algorithms.LogicV2),
    "logic-v1" -> algoComparator(Algorithms.LogicV1),
    "name-based" -> algoComparator(Algorithms.NameBased),
    "jaro-winkler" -> ((_, a, b) =>
      graft.text.JaroWinkler.similarity(a.toLowerCase, b.toLowerCase)),
    "levenshtein" -> ((_, a, b) => {
      val la = a.toLowerCase; val lb = b.toLowerCase
      val d = graft.text.Levenshtein.distance(la, lb)
      val m = math.max(la.length, lb.length)
      if (m == 0) 1.0 else 1.0 - d.toDouble / m
    }))

  final case class Stats(name: String, n: Int, meanUs: Double,
      p50Us: Double, p95Us: Double, totalMs: Double, precision: Double,
      recall: Double, f1: Double,
      slowest: Seq[(NameCase, Double)])

  /** Time + score every case `runs` times per comparator (median-of-runs
    * per case, one warmup pass first — the perf.py protocol).
    */
  def run(cases: Seq[NameCase], comps: Seq[(String, Comparator)],
      runs: Int, threshold: Double, topSlow: Int = 5): Seq[Stats] =
    comps.map { case (name, comp) =>
      cases.foreach(c => comp(c.schema, c.name1, c.name2)) // warmup
      val perCase = cases.map { c =>
        val samples = (0 until runs).map { _ =>
          val t0 = System.nanoTime()
          val s = comp(c.schema, c.name1, c.name2)
          (System.nanoTime() - t0) / 1e3 -> s
        }
        val med = samples.map(_._1).sorted.apply(runs / 2)
        (c, med, samples.last._2)
      }
      val times = perCase.map(_._2).sorted
      def pct(p: Double) =
        times(math.min(times.size - 1, (p * times.size).toInt))
      val preds = perCase.map { case (c, _, s) => (c.isMatch, s >= threshold) }
      val tp = preds.count { case (t, p) => t && p }
      val fp = preds.count { case (t, p) => !t && p }
      val fn = preds.count { case (t, p) => t && !p }
      val precision = if (tp + fp == 0) 0.0 else tp.toDouble / (tp + fp)
      val recall = if (tp + fn == 0) 0.0 else tp.toDouble / (tp + fn)
      val f1 = if (precision + recall == 0) 0.0
        else 2 * precision * recall / (precision + recall)
      Stats(name, cases.size, times.sum / times.size, pct(0.5), pct(0.95),
        times.sum / 1e3, precision, recall, f1,
        perCase.sortBy(-_._2).take(topSlow)
          .map { case (c, t, _) => (c, t) })
    }
}
