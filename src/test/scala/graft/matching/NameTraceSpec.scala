package graft.matching

import org.scalatest.funsuite.AnyFunSuite

/** Scratch diagnostic: prints alignment edges for specific pairs. */
class NameTraceSpec extends AnyFunSuite {
  test("trace alignment of selected pairs") {
    val spec = new NameBenchParitySpec
    val pairs = Seq(
      ("Company", "Citigroup Capital Trust I", "Citigroup Capital Trust II"),
      ("Company", "State Grid Corporation of Chile",
        "State Grid Corporation of China"),
      ("Company", "Mendez, Denmark A/S", "Mendez Norge A/S"),
      ("Company", "Blackstone Real Estate Partners IV L.P.",
        "Blackstone Real Estate Partners V L.P."),
      ("Company", "BAE Systems, Inc.", "BAE Industries, Inc."),
      ("Company", "Mercedes-Benn Group AG", "Mercedes-Benz Group AG"),
      ("Person", "Niels Oscar Rost", "Niels Oscar TROOST"),
      ("Person", "MOHAMAD IQBAL ABDURRAHIM", "MOHAMAD IQBAL ABDURRAHMAN"),
      ("Company", "L & H Editions, S.A.", "L & H Linguex, S.A."),
      ("Person", "AL BEN MAHMOUD, Isa Ben Tarif",
        "Shaikh Isa Bin Tarif Al Bin Ali"),
      ("Company", "TACTICAL MISSILES CORPORATION JOINT STOCK COMPANY",
        "TACTICAL MISSILES CORPORATION JOYNT STOCK COMPANY"),
      ("Company", "Bowne Global Solutions (France), S.A.R.L.",
        "Bowne Global Solutions (Germany), G.m.b.H."),
      ("Company", "Bowne Global Solutions II (U.K.) Limited",
        "Bowne Global Solutions II Canada, Inc."),
      ("Organization",
        "Academy of Military Medical Sciences, Insitute of Medical Equipment",
        "Academy of Military Medical Sciences, Institute of Micobiology and Epidemiology"),
      ("Company", "JSC Murom Instrument-Making Plant",
        "Акционерное общество “Муромский приборостроительный завод”"))
    for ((schema, a, b) <- pairs) {
      val sink = scala.collection.mutable.ListBuffer
        .empty[List[(Option[String], Option[String], Double, Double)]]
      val s = NameMatchV2.traceSink.withValue(sink) {
        Algorithms.LogicV2.score(spec.view(schema, a), spec.view(schema, b))
      }
      info(f"[$schema] '$a' vs '$b' = $s%.4f")
      // the best-scoring pair's edges (last call usually wins for
      // single-name entities, but print the max-scoring one)
      val best = sink.toList.maxByOption(ms =>
        if (ms.map(_._4).sum <= 0) 0.0
        else ms.map(m => m._3 * m._4).sum / ms.map(_._4).sum)
      best.foreach(_.foreach { case (q, r, sc, w) =>
        info(f"    ${q.getOrElse("-")}%-14s ~ ${r.getOrElse("-")}%-14s s=$sc%.3f w=$w%.3f")
      })
    }
  }
}
