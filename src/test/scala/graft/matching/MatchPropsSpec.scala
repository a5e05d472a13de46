package graft.matching

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.model.Ftm

/** Property checks over the pure matcher plumbing: initialism
  * collapsing, the can_match relation exhaustively, and the ModelIO
  * scaler fold-in (sampled generators directly — the
  * scalatest-scalacheck bridge isn't on the offline classpath).
  */
class MatchPropsSpec extends AnyFunSuite {

  private def sample[T](g: Gen[T], n: Int = 200): Seq[T] =
    (1 to n).flatMap(i =>
      g.apply(Gen.Parameters.default, Seed(i.toLong)))

  private val token: Gen[String] =
    Gen.chooseNum(1, 6).flatMap(n =>
      Gen.listOfN(n, Gen.alphaLowerChar).map(_.mkString))

  test("collapseInitialRuns preserves letters and leaves no runs") {
    for (parts <- sample(Gen.listOf(token))) {
      val (out, tagged) = NameMatchV2.collapseInitialRunsTagged(parts)
      // lossless: the concatenated letters are identical
      assert(out.mkString === parts.mkString)
      // every tagged token is a glued run (≥2 letters), present in out
      tagged.foreach { t =>
        assert(t.length >= 2)
        assert(out.contains(t))
      }
      // no THREE adjacent single-letter tokens survive (r7: a 2-run
      // stays split unless it spells a legal form — "L & H" keeps l, h
      // as full-weight parts, "B.V." glues to bv)
      out.sliding(3).foreach {
        case Seq(a, b, c) =>
          assert(!(a.length == 1 && b.length == 1 && c.length == 1))
        case _ =>
      }
    }
  }

  test("can_match is symmetric and implies matchable, exhaustively") {
    val names = Ftm.schemata.keys.toSeq.sorted
    for (a <- names; b <- names) {
      assert(Ftm.canMatch(a, b) === Ftm.canMatch(b, a), s"($a, $b)")
      if (Ftm.canMatch(a, b)) {
        assert(Ftm.isMatchable(a) && Ftm.isMatchable(b))
        assert(Ftm.ancestors(a).contains(b) || Ftm.ancestors(b).contains(a))
      }
    }
    // ancestors always include the schema itself and resolve fully
    for (n <- names) {
      val anc = Ftm.ancestors(n)
      assert(anc.contains(n))
      assert(anc.subsetOf(Ftm.schemata.keySet))
    }
  }

  test("the scaler fold-in equals scale-then-score on random models") {
    def sigmoid(z: Double) = 1.0 / (1.0 + math.exp(-z))
    val dGen = Gen.chooseNum(-3.0, 3.0)
    for (i <- 1 to 200) {
      val seed = Seed(i.toLong)
      def vec(n: Int, off: Long): Seq[Double] =
        (0 until n).flatMap(j =>
          dGen.apply(Gen.Parameters.default, seed.reseed(off + j)))
      val k = 1 + i % 6
      val means = vec(k, 0)
      val scales = vec(k, 100).map(s => math.abs(s) + 0.1)
      val weights = vec(k, 200)
      val xs = vec(k, 300)
      val b = vec(1, 400).head
      val m = ModelIO.ScaledModel("t", (1 to k).map("f" + _),
        means, scales, weights, b)
      val direct = sigmoid(b + (0 until k).map(j =>
        weights(j) * (xs(j) - means(j)) / scales(j)).sum)
      assert(math.abs(m.flat.prob(xs) - direct) < 1e-9)
    }
  }
}
