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

  test("int8 quantization: reconstruction bound and cosine fidelity") {
    val qz = SimilarityQueries.quantizeQ(s, sf).collect()
      .map(r => r.getLong(0) ->
        (r.getDouble(1), r.getString(2).split(",").map(_.toDouble)))
      .toMap
    val orig = graft.Tables.embeddings(s, sf)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    assert(qz.size === orig.size)
    // absmax scaling: every element reconstructs within scale/2 and
    // the worst quantized magnitude is exactly 127
    for ((id, (scale, q)) <- qz) {
      val v = orig(id)
      assert(q.map(math.abs).max <= 127.0)
      v.indices.foreach { i =>
        assert(math.abs(v(i) - q(i) * scale) <= scale / 2 + 1e-9)
      }
    }
    // cosine on dequantized vectors tracks the exact cosine — the
    // error budget the 4x memory saving costs
    def cos(x: Array[Double], y: Array[Double]): Double = {
      val d = x.indices.map(i => x(i) * y(i)).sum
      d / (math.sqrt(x.map(a => a * a).sum) *
        math.sqrt(y.map(a => a * a).sum))
    }
    val ids = orig.keys.toSeq.sorted.take(20)
    val errs = for {
      i <- ids.indices; j <- (i + 1) until ids.size
    } yield {
      val (a, b) = (ids(i), ids(j))
      val dq = (id: Long) => {
        val (sc, q) = qz(id); q.map(_ * sc)
      }
      math.abs(cos(orig(a), orig(b)) - cos(dq(a), dq(b)))
    }
    info(f"max cosine error over ${errs.size} pairs: ${errs.max}%.5f")
    assert(errs.max < 0.01)
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

  test("embedding clusters cover every verified pair, one keeper each") {
    val pairs = SimilarityQueries.embedNearPairs(s, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val rows = SimilarityQueries.embedClustersQ(s, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    val byId = rows.map(r => r._1 -> r._2).toMap
    // both endpoints of every near-dup pair are clustered together
    pairs.foreach { case (a, b) =>
      assert(byId.contains(a) && byId.contains(b))
      assert(byId(a) === byId(b), s"pair ($a,$b) split across clusters")
    }
    // canonical is the minimum member, kept exactly once per cluster
    rows.groupBy(_._2).foreach { case (canonical, members) =>
      assert(members.map(_._1).min === canonical)
      assert(members.count(_._3) === 1)
    }
  }

  test("recall query agrees with the set-intersection computed here") {
    val rows = SimilarityQueries.recallQ(s, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getLong(4), r.getDouble(5)))
    assert(rows.nonEmpty)
    val ann = SimilarityQueries.annLsh(s, sf)
      .select(col("qid"), col("vec_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = SimilarityQueries.ivfTopK(s, sf)
      .select(col("qid"), col("vec_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = SimilarityQueries.cosineTopK(s, sf)
      .select(col("qid"), col("vec_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    rows.foreach { case (qid, nExact, hitLsh, recLsh, hitIvf, recIvf) =>
      assert(nExact === SimilarityQueries.TopK.toLong)
      val mine = brute.filter(_._1 == qid)
      assert(hitLsh === mine.count(ann.contains).toLong, s"qid=$qid lsh")
      assert(hitIvf === mine.count(ivf.contains).toLong, s"qid=$qid ivf")
      assert(recLsh >= 0.0 && recLsh <= 1.0)
      assert(recIvf >= 0.0 && recIvf <= 1.0)
    }
    val avgLsh = rows.map(_._4).sum / rows.length
    info(s"banded-LSH recall@10: $avgLsh; " +
      s"IVF recall@10: ${rows.map(_._6).sum / rows.length}")
    // band-OR probing must beat the ~0.01 the single-bucket form measured
    assert(avgLsh >= 0.2)
  }
}
