package graft.similarity

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Greedy-optimality audit for MMR: picks are distinct members of the
  * anchor's top-K, rank 1 is the pure-relevance argmax, and the rank-2
  * pick maximizes λ·cos − (1−λ)·sim(·, p1) among the remaining
  * candidates — re-derived here from raw vectors, independent of the
  * query's own joins.
  */
class MmrSpec extends AnyFunSuite {
  import SparkSpec.spark

  private val dir = "/root/testdata/sf0.001"

  test("mmr picks are distinct, in-topk, and greedily optimal") {
    val out = SimilarityQueries.mmrQ(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    assert(out.nonEmpty)
    val byQ = out.groupBy(_._1)
    assert(byQ.values.forall(g =>
      g.length == SimilarityQueries.MmrK &&
        g.map(_._3).distinct.length == SimilarityQueries.MmrK))

    val p = Similarity.prepared(spark, dir)
    val topk = Similarity
      .bruteTopK(p, p.filter(org.apache.spark.sql.functions
        .col("vec_id") % SimilarityQueries.QueryMod === 0),
        SimilarityQueries.TopK)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val vecs = p.collect()
      .map(r => r.getLong(0) ->
        ((r.getSeq[Double](1).toArray, r.getDouble(2)))).toMap
    def cos(a: Long, b: Long): Double = {
      val (va, na) = vecs(a); val (vb, nb) = vecs(b)
      BigDecimal(va.zip(vb).foldLeft(0.0) {
        case (acc, (x, y)) => acc + x * y } / (na * nb))
        .setScale(5, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    def e6(x: Double): Long = math.floor(x * 1e6 + 0.5).toLong
    val L = SimilarityQueries.MmrLambda
    val D = SimilarityQueries.MmrDiv
    for ((qid, g) <- byQ) {
      val cands = topk.filter(_._1 == qid).map(t => t._2 -> t._3).toMap
      val Seq(p1, p2, p3) = g.sortBy(_._2).map(_._3).toSeq
      assert(Seq(p1, p2, p3).forall(cands.contains))
      // rank 1 = pure-relevance argmax (ties → min id)
      val best = cands.toSeq.maxBy { case (id, c) => (c, -id) }._1
      assert(p1 === best)
      // rank 2 maximizes the fixed-point MMR score vs p1
      val mmr2 = cands.removed(p1).map { case (id, c) =>
        id -> e6(L * c - D * cos(id, p1)) }
      val best2 = mmr2.toSeq.maxBy { case (id, sc) => (sc, -id) }._1
      assert(p2 === best2, s"anchor $qid rank-2")
    }
  }
}
