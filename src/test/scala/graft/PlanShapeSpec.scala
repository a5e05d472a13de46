package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape guards: the scale claims the scaladocs make, asserted on
  * the actual physical plans so a refactor cannot silently regress
  * them. Map-only operators must plan without a single Exchange; no
  * pipeline may degrade to a cartesian product (the documented 1-row
  * scalar cross-joins and the bounded n×C products are the only
  * allowed ones, and they appear as BroadcastNestedLoopJoin over a
  * broadcast side, never CartesianProduct).
  */
class PlanShapeSpec extends AnyFunSuite {
  import SparkSpec.spark

  private val dir = "/root/testdata/sf0.001"

  private def plan(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("map-only operators plan with zero Exchanges") {
    val mapOnly = Seq(
      "q_text_pii" -> textanalysis.Pii.queries("q_text_pii"),
      "q_text_stats" -> textanalysis.TextAnalysis.queries("q_text_stats"),
      "q_text_fingerprint" ->
        textanalysis.TextAnalysis.queries("q_text_fingerprint"),
      "q_sim_quantize" ->
        similarity.SimilarityQueries.queries("q_sim_quantize"),
      "q_doc_fim" -> textanalysis.Curation.queries("q_doc_fim"),
      "q_mm_meta" -> multimodal.Multimodal.queries("q_mm_meta"))
    for ((name, q) <- mapOnly) {
      val p = plan(q(spark, dir))
      assert(!p.contains("Exchange"), s"$name plans an Exchange:\n$p")
    }
  }

  test("no query plans a CartesianProduct") {
    val all = SparkEntry.queries
    // full sweep at the smallest SF; streaming-only ops are not in the
    // map, so every entry is plannable
    for ((name, q) <- all) {
      val p = plan(q(spark, dir))
      assert(!p.contains("CartesianProduct"),
        s"$name plans a CartesianProduct")
    }
  }

  test("the pq distance table and compat tables broadcast") {
    val p = plan(similarity.Pq.queries("q_sim_pq")(spark, dir))
    assert(p.contains("BroadcastExchange") || p.contains("BroadcastHashJoin"),
      s"q_sim_pq lost its broadcast:\n$p")
  }

  test("the LM token stream joins its count tables by broadcast only") {
    // the scale claim of q_text_lm: the corpus token stream must never
    // shuffle on a term key — every LM-table join is broadcast-hash
    val p = plan(textanalysis.LangModel.queries("q_text_lm")(spark, dir))
    assert(p.contains("BroadcastHashJoin"), s"q_text_lm lost broadcasts:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      s"q_text_lm shuffles the token stream:\n$p")
  }

  test("the dedup band pipelines carry the hot-bucket cap") {
    // the r6 skew guard: candidate generation must drop capped buckets
    // before any pair fan-out. The ingest builder (lshPairsOf) still
    // uses the Dedup.dropHotBuckets LEFT-ANTI join; the live banding
    // queries (simhash_pairs, incremental) apply the SAME cap as a
    // window count + filter on their single (band, key) exchange
    // (r14: the anti-join cloned the banding subtree per consumer and
    // AQE never reused the twin exchanges).
    val p0 = plan(dedup.DedupQueries.lshPairsOf(Tables.documents(spark, dir)))
    assert(p0.contains("LeftAnti"), s"lshPairsOf lost the bucket cap:\n$p0")
    val live: Seq[(String, DataFrame)] = Seq(
      "q_dedup_simhash_pairs" ->
        dedup.DedupQueries.queries("q_dedup_simhash_pairs")(spark, dir),
      "q_dedup_incremental" ->
        dedup.DedupQueries.queries("q_dedup_incremental")(spark, dir))
    for ((name, df) <- live) {
      val p = plan(df)
      assert(p.contains("windowspecdefinition"),
        s"$name lost the window df count:\n$p")
      assert(p.contains(s"<= ${dedup.Dedup.LshBucketCap}"),
        s"$name lost the bucket-cap filter:\n$p")
    }
  }

  test("q8 near-dup scans only the stored banded corpus") {
    // nearPreparedCk is the stored index — since r7 a lake parquet
    // artifact: the int8 verify path must read ONLY the artifact, never
    // the raw embeddings table
    similarity.SimilarityQueries.nearPreparedCk(spark, dir).count()
    val p = plan(
      similarity.SimilarityQueries.queries("q_sim_near_q8")(spark, dir))
    assert(!p.contains("embeddings.parquet"),
      s"q_sim_near_q8 re-reads the corpus instead of the index:\n$p")
    // the index arrives either as the lake artifact scan or as the
    // session's read-once-then-cache copy of it (ExistingRDD)
    assert(p.contains("near_banded") || p.contains("ExistingRDD"),
      s"q_sim_near_q8 lost the stored-index scan:\n$p")
  }

  test("trained IVF keeps the broadcast n-by-C assignment product") {
    val p = plan(
      similarity.SimilarityQueries.queries("q_sim_ivf")(spark, dir))
    assert(p.contains("BroadcastNestedLoopJoin") ||
      p.contains("BroadcastHashJoin"),
      s"q_sim_ivf lost its broadcast assignment:\n$p")
  }

  test("wsample plans TakeOrderedAndProject, not a global sort") {
    val p = plan(textanalysis.Curation.queries("q_doc_wsample")(spark, dir))
    assert(p.contains("TakeOrderedAndProject"),
      s"q_doc_wsample lost its top-N plan:\n$p")
  }
}
