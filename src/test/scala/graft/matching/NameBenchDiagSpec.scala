package graft.matching

import org.scalatest.funsuite.AnyFunSuite

/** Scratch diagnostic: prints the worst score disagreements vs the
  * frozen logic-v2 run. Not part of the permanent suite contract.
  */
class NameBenchDiagSpec extends AnyFunSuite {
  test("worst disagreements vs frozen") {
    val spec = new NameBenchParitySpec
    val scored = spec.cases.map { c =>
      val s = Algorithms.LogicV2.score(spec.view(c.schema, c.name1),
        spec.view(c.schema, c.name2))
      (c, s, math.abs(s - c.frozenScore))
    }.sortBy(-_._3)
    scored.take(25).foreach { case (c, s, d) =>
      info(f"d=$d%.2f us=$s%.2f frozen=${c.frozenScore}%.2f " +
        f"[${c.schema}] '${c.name1}' vs '${c.name2}'")
    }
  }

  test("all classification disagreements vs frozen") {
    val spec = new NameBenchParitySpec
    val bad = spec.cases.map { c =>
      val s = Algorithms.LogicV2.score(spec.view(c.schema, c.name1),
        spec.view(c.schema, c.name2))
      (c, s, s >= spec.Threshold)
    }.filter { case (c, _, p) => p != c.frozenPred }
    info(s"total classification disagreements: ${bad.size}")
    bad.sortBy { case (c, s, _) => -math.abs(s - c.frozenScore) }
      .foreach { case (c, s, _) =>
        info(f"us=$s%.2f frozen=${c.frozenScore}%.2f " +
          f"[${c.schema}] '${c.name1}' vs '${c.name2}'")
      }
  }
}
