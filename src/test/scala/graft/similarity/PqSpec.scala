package graft.similarity

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Product-quantization semantics: the oracle gate (q_sim_pq) pins
  * engine parity; these pin the construction itself — codes come from
  * the codebook, ADC distances are exactly the sum of the query's
  * table entries for those codes, and the approximation is good enough
  * to recover most of the true L2 neighborhood (measured, not
  * guessed — the same bar q_sim_recall sets for LSH/IVF).
  */
class PqSpec extends AnyFunSuite {
  import SparkSpec.spark

  private val dir = "/root/testdata/sf0.001"

  test("every (vector, subspace) gets exactly one code from the seed set") {
    val p = Similarity.prepared(spark, dir)
    val enc = Pq.encoded(p, Pq.codebookOf(p))
    val n = p.count()
    assert(enc.count() === n * Pq.M)
    assert(enc.groupBy(col("vec_id"), col("m")).count()
      .filter(col("count") =!= 1).count() === 0)
    val seedIds = p.filter(col("vec_id") % Pq.PqCentroidMod === 0)
      .select(col("vec_id")).collect().map(_.getLong(0)).toSet
    assert(enc.select(col("code")).distinct().collect()
      .forall(r => seedIds.contains(r.getLong(0))))
    // a seed sub-vector is distance 0 from itself → encodes to itself
    assert(enc.filter(col("vec_id").isin(seedIds.toSeq.map(x => x: Any): _*)
      && col("vec_id") =!= col("code")).count() === 0)
  }

  test("ADC distance is the sum of the query's table entries") {
    val out = Pq.pqTopK(spark, dir)
    // recompute one (qid, vec_id) pair by hand from collected pieces
    val row = out.orderBy(col("qid"), col("rn")).limit(1).collect()(0)
    val (qid, vid) = (row.getLong(0), row.getLong(1))
    val p = Pq.normalized(Similarity.prepared(spark, dir))
    def vec(id: Long): Array[Double] =
      p.filter(col("vec_id") === id).select(col("u")).collect()(0)
        .getSeq[Double](0).toArray
    val seeds = p.filter(col("vec_id") % Pq.PqCentroidMod === 0)
      .select(col("vec_id")).collect().map(_.getLong(0)).sorted
    val (qv, xv) = (vec(qid), vec(vid))
    def sq(a: Array[Double], b: Array[Double], m: Int): Double =
      (0 until Pq.SubDim).map { i =>
        val d = a(m * Pq.SubDim + i) - b(m * Pq.SubDim + i); d * d
      }.sum
    val ad6 = (0 until Pq.M).map { m =>
      val code = seeds.minBy(s => (sq(xv, vec(s), m), s))
      math.floor(sq(qv, vec(code), m) * 1e6 + 0.5).toLong
    }.sum
    assert(row.getLong(2) === ad6)
  }

  test("measured recall vs the exact cosine top-10") {
    // PQ runs on unit vectors, so the exact-cosine baseline (the same
    // one q_sim_recall uses for LSH/IVF) is the right quality bar
    val exact = SimilarityQueries.cosineTopK(spark, dir)
      .select(col("qid"), col("vec_id"))
    val hits = Pq.pqTopK(spark, dir).select(col("qid"), col("vec_id"))
      .join(exact, Seq("qid", "vec_id")).count()
    val recall = hits.toDouble / exact.count()
    info(f"PQ top-10 recall vs exact cosine: $recall%.2f")
    assert(recall >= 0.30) // measured 0.37 at sf0.001 (M=16, C=30 seeds)
  }
}
