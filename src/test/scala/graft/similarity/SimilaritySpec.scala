package graft.similarity

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Measures the banded near-dup recall against the exact all-pairs
  * answer at sf0.001 — the small-scale oracle ADVICE asked for: the
  * driver's DuckDB gate mirrors the banding, so it cannot see recall
  * loss; this test can.
  */
class SimilaritySpec extends AnyFunSuite {
  private val s = SparkSpec.spark
  private val sf = "/root/testdata/sf0.001"

  test("near-dup banding recall vs exact pairs") {
    val p = Similarity.prepared(s, sf)
    val a = p.select(col("vec_id").as("a"), col("v").as("va"),
      col("nrm").as("na"))
    val b = p.select(col("vec_id").as("b"), col("v").as("vb"),
      col("nrm").as("nb"))
    // exact ground truth: tiny corpus, the cross join is fine here
    val exact = a.join(b, col("a") < col("b"))
      .select(col("a"), col("b"),
        (Similarity.dot(col("va"), col("vb")) / (col("na") * col("nb")))
          .as("cosine"))
      .filter(col("cosine") >= SimilarityQueries.NearThreshold)
      .select(col("a"), col("b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val banded = SimilarityQueries.embedNearPairs(s, sf)
      .select(col("a"), col("b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    assert(banded.subsetOf(exact), "banding must not invent pairs")
    if (exact.nonEmpty) {
      val recall = banded.size.toDouble / exact.size
      info(s"near-dup recall: ${banded.size}/${exact.size} = $recall")
      // 4 bands × 4 bits gives ~0.50 expected recall at the 0.4
      // threshold boundary and much more above it; the observed mix
      // should clear a loose floor
      assert(recall >= 0.3, s"recall $recall below floor")
    }
  }

  test("ANN LSH top-k is a subset of brute-force cosine ranking") {
    val ann = SimilarityQueries.annLsh(s, sf)
      .select(col("qid"), col("vec_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = SimilarityQueries.cosineTopK(s, sf)
      .select(col("qid"), col("vec_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // every ANN hit is a real neighbor pair drawn from the same bucket;
    // it need not be in the global top-k, but the overlap should be
    // substantial on a small corpus
    assert(ann.nonEmpty)
    val overlap = ann.intersect(brute).size.toDouble / ann.size
    info(s"ANN∩brute overlap: $overlap")
  }

  test("IVF top-k recall against brute-force") {
    val ivf = SimilarityQueries.ivfTopK(s, sf)
      .select(col("qid"), col("vec_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = SimilarityQueries.cosineTopK(s, sf)
      .select(col("qid"), col("vec_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(ivf.nonEmpty)
    // recall = fraction of true top-k found while searching only the
    // 2 probed centroid lists; random centroids on random vectors give
    // a modest but real floor, documenting the recall/probe trade
    val recall = brute.intersect(ivf).size.toDouble / brute.size
    info(s"IVF recall@${SimilarityQueries.TopK}: $recall " +
      s"(nprobe=${SimilarityQueries.NProbe})")
    assert(recall > 0.0)
  }
}
