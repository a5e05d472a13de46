package graft.similarity

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Drop-rule audit for SemDeDup: every output row is a corpus vector,
  * rank-1 members always survive, and every drop decision is backed by
  * a same-cluster witness of lower rank whose cosine clears the
  * threshold (recomputed here from the raw vectors, independently of
  * the query's own join).
  */
class SemDedupSpec extends AnyFunSuite {
  import SparkSpec.spark

  private val dir = "/root/testdata/sf0.001"

  test("semdedup decisions are witnessed and rank-consistent") {
    val out = SemDedup.semdedupQ(spark, dir).cache()
    val rows = out.collect()
    val n = Similarity.prepared(spark, dir).count()
    assert(rows.length.toLong === n, "every vector decided exactly once")
    assert(rows.map(_.getLong(0)).distinct.length === rows.length)
    // witness sentinel agrees with the keep flag
    assert(rows.forall(r => r.getBoolean(3) === (r.getLong(4) == -1L)))
    // rank 1 is never dropped (nothing ranks earlier in its cluster)
    assert(rows.filter(_.getInt(2) == 1).forall(_.getBoolean(3)))
    // some drops must occur at the 0.4 threshold on this corpus
    // (q_sim_embed_near finds pairs at the same threshold)
    assert(rows.exists(!_.getBoolean(3)))

    // independent witness audit: join dropped rows back to raw vectors
    val p = Similarity.prepared(spark, dir)
      .select(col("vec_id"), col("v"), col("nrm"))
    val byId = out.select(col("vec_id"), col("cid"), col("rnk"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getInt(2))))
      .toMap
    val vecs = p.collect()
      .map(r => r.getLong(0) ->
        ((r.getSeq[Double](1).toArray, r.getDouble(2)))).toMap
    for (r <- rows if !r.getBoolean(3)) {
      val (id, w) = (r.getLong(0), r.getLong(4))
      assert(byId(w)._1 === byId(id)._1, s"witness of $id in same cluster")
      assert(byId(w)._2 < byId(id)._2, s"witness of $id ranks earlier")
      val (va, na) = vecs(id); val (vb, nb) = vecs(w)
      val cos = BigDecimal(
        va.zip(vb).foldLeft(0.0) { case (a, (x, y)) => a + x * y } / (na * nb))
        .setScale(5, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(cos >= SemDedup.Eps, s"witness cosine $cos for $id")
    }
    out.unpersist()
  }
}
