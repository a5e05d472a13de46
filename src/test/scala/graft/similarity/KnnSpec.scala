package graft.similarity

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** k-NN majority-vote semantics (the oracle gate q_sim_knn checks
  * engine parity; this pins the vote arithmetic and measures accuracy
  * on the labeled corpus).
  */
class KnnSpec extends AnyFunSuite {
  import SparkSpec.spark

  test("votes sum to k and the winner has the plurality") {
    val out = SimilarityQueries.knnQ(spark, "/root/testdata/sf0.001")
    val rows = out.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getLong(3) >= 1 &&
      r.getLong(3) <= SimilarityQueries.TopK))
    // winner's votes are the max over that query's per-label counts —
    // recompute one query by hand
    val q0 = rows.minBy(_.getLong(0)).getLong(0)
    val lbl = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select(col("vec_id"), col("label"))
    val counts = SimilarityQueries.cosineTopK(spark, "/root/testdata/sf0.001")
      .filter(col("qid") === q0).join(lbl, Seq("vec_id"))
      .groupBy(col("label")).count().collect()
      .map(r => (r.getInt(0), r.getLong(1)))
    val want = counts.minBy { case (l, c) => (-c, l) }
    val got = rows.filter(_.getLong(0) == q0).head
    assert((got.getInt(2), got.getLong(3)) === want)
  }

  test("correct flag is exactly label == predicted; accuracy recorded") {
    val out = SimilarityQueries.knnQ(spark, "/root/testdata/sf0.001")
    val rows = out.collect()
    assert(rows.forall(r => r.getBoolean(4) ===
      (r.getInt(1) == r.getInt(2))))
    val acc = rows.count(_.getBoolean(4)).toDouble / rows.length
    // the synthetic labels are geometry-free (within-label mean cosine
    // equals cross-label, measured ≈ 0), so accuracy is chance (~0.1
    // over 10 classes) — the gate checks the vote ALGEBRA; accuracy
    // only becomes meaningful on a corpus whose labels follow geometry
    info(f"knn-10 accuracy at sf0.001 (chance ≈ 0.10): $acc%.2f")
    assert(acc >= 0.0 && acc <= 1.0)
  }
}
