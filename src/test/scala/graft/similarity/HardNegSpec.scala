package graft.similarity

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Mining-rule audit for hard-negative mining: negatives really are
  * different-label, capped per anchor, and the margin flag agrees with
  * the anchor's best in-top-K positive.
  */
class HardNegSpec extends AnyFunSuite {
  import SparkSpec.spark

  private val dir = "/root/testdata/sf0.001"

  test("hardneg rows are different-label, capped, margin-consistent") {
    val rows = SimilarityQueries.hardNegQ(spark, dir).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getInt(4) != r.getInt(3)),
      "every mined row is a negative")
    val perAnchor = rows.groupBy(_.getLong(0))
    assert(perAnchor.values.forall(_.length <= SimilarityQueries.HardNegK))
    for (r <- rows) {
      val (cos, isHard, bestPos) =
        (r.getDouble(2), r.getBoolean(5), r.getDouble(6))
      if (bestPos == -1.0) assert(isHard, "no positive → every neg is hard")
      else assert(isHard === (cos >= bestPos))
    }
    // negatives rank densely from 1 within each anchor
    assert(perAnchor.values.forall(g =>
      g.map(_.getInt(7)).sorted.sameElements(1 to g.length)))
  }
}
