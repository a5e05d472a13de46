package graft.similarity

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkSpec, Tables}

/** Lloyd-iteration semantics against the real sf0.001 embeddings. */
class KMeansSpec extends AnyFunSuite {
  import SparkSpec.spark

  private val sfDir = "/root/testdata/sf0.001"

  private lazy val out = KMeans.lloydQ(spark, sfDir).collect()
    .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))

  test("every centroid survives (its own vector is its member)") {
    val nCent = Tables.embeddings(spark, sfDir)
      .filter(col("vec_id") %
        SimilarityQueries.centroidMod(spark, sfDir) === 0).count()
    assert(out.length.toLong === nCent)
  }

  test("every vector is assigned exactly once") {
    val n = Tables.embeddings(spark, sfDir).count()
    assert(out.map(_._2).sum === n)
  }

  test("shift is a valid cosine and the new centroid is non-degenerate") {
    out.foreach { case (cid, _, shift, norm) =>
      assert(shift >= -1.0 && shift <= 1.0, s"cid=$cid shift=$shift")
      assert(norm > 0.0, s"cid=$cid norm=$norm")
    }
    // the mean of a centroid's neighborhood should stay correlated with
    // the centroid for most clusters
    assert(out.count(_._3 > 0.5) >= out.length / 2)
  }

  test("fixed-point accumulation is reproducible across runs") {
    val again = KMeans.lloydQ(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(out.sortBy(_._1).toSeq === again.sortBy(_._1).toSeq)
  }
}
