package graft.textanalysis

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Domain-mixture arithmetic on a hand-computed fixture: the scarcest
  * source (tokens/weight) caps the achievable total, rates follow, and
  * the argmin source always samples at rate 1.
  */
class MixtureSpec extends AnyFunSuite {
  import SparkSpec.spark
  import spark.implicits._

  test("rates hit the target proportions; scarcest source is exhausted") {
    // src0 (w=1): 10 tokens; src1 (w=2): 4 tokens
    // T = min(10/1, 4/2) = 2 → rate0 = 1·2/10 = 0.2, rate1 = 2·2/4 = 1.0
    val docs = Seq(
      (1L, "a b c d e", "src0"), (2L, "f g h i j", "src0"),
      (3L, "k l m n", "src1"))
      .toDF("doc_id", "text", "source")
    val out = Curation.mixtureOf(docs).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getLong(4), r.getLong(5))).sortBy(_._1)
    assert(out.map(x => (x._1, x._2, x._3, x._4)) ===
      Seq(("src0", 1L, 10L, 0.2), ("src1", 2L, 4L, 1.0)))
    // rate-1 source keeps everything; sampled source keeps a subset
    assert(out(1)._5 === 1L && out(1)._6 === 4L)
    assert(out(0)._5 <= 2L && out(0)._6 <= 10L)
  }

  test("selected token mixture approaches the weights on a larger corpus") {
    val docs = (0L until 400L).map { i =>
      (i, "w1 w2 w3 w4 w5", s"src${i % 2}")
    }.toDF("doc_id", "text", "source")
    // equal source sizes, weights 1 and 2 → rates 0.5 and 1.0
    val out = Curation.mixtureOf(docs).collect()
      .map(r => (r.getString(0), r.getDouble(3), r.getLong(5))).sortBy(_._1)
    assert(out.map(x => (x._1, x._2)) ===
      Seq(("src0", 0.5), ("src1", 1.0)))
    val Seq(t0, t1) = out.map(_._3).toSeq
    // hash-threshold sampling ≈ rate: src0 keeps about half of src1
    assert(t1 === 1000L)
    assert(t0 > 350 && t0 < 650)
  }
}
