package graft

import org.scalatest.funsuite.AnyFunSuite

/** The central cache switch: clearing must be safe mid-session — every
  * cached index rebuilds on next use with identical results.
  */
class CachesSpec extends AnyFunSuite {
  import SparkSpec.spark

  test("clearAll drops and rebuilds every stored-index cache") {
    val dir = "/root/testdata/sf0.001"
    val ivf = similarity.SimilarityQueries.queries("q_sim_ivf")
    val pairs = dedup.DedupQueries.queries("q_dedup_winnow")
    val before = (ivf(spark, dir).count(), pairs(spark, dir).count())
    Caches.clearAll()
    val after = (ivf(spark, dir).count(), pairs(spark, dir).count())
    assert(before === after)
  }
}
