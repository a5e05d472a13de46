package graft.similarity

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Int8-verified near-dup pairs vs the fp channel: same candidates,
  * cosine within quantization error, and near-total pair agreement at
  * the threshold.
  */
class NearQ8Spec extends AnyFunSuite {
  import SparkSpec.spark

  private val dir = "/root/testdata/sf0.001"

  test("int8 cosine matches fp cosine within the quantization bound") {
    val fp = SimilarityQueries.embedNearPairs(spark, dir)
    val q8 = SimilarityQueries.nearQ8(spark, dir)
    val joined = fp.join(q8, Seq("a", "b")).collect()
    assert(joined.nonEmpty)
    val maxErr = joined.map(r =>
      math.abs(r.getDouble(2) - r.getDouble(3))).max
    info(f"max |cos_fp - cos_int8| on shared pairs: $maxErr%.4f")
    assert(maxErr <= 0.005)
    // threshold flips only in the ±err band around the cutoff
    val nFp = fp.count(); val nQ8 = q8.count()
    assert(math.abs(nFp - nQ8) <= math.max(2L, nFp / 10))
  }
}
