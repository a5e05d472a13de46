package graft.dedup

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.resolver.Resolver

/** Cluster-closure election and deterministic sampling semantics —
  * the two dedup-pipeline tails ([[DedupQueries.clustersQ]] /
  * [[DedupQueries.sampleQ]] gate the full paths against oracles; these
  * pin the branchy rules on hand-built fixtures.
  */
class DedupOpsSpec extends AnyFunSuite {
  import SparkSpec.spark
  import spark.implicits._

  test("cluster election keeps the longest text, min id on ties") {
    // components {1,2,3} and {8,9}; 2 and 3 tie on length
    val pairs = Seq(("1", "2"), ("2", "3"), ("8", "9"))
      .toDF("src", "dst")
    val cc = Resolver.connectedComponents(pairs)
    val len = Seq(("1", 5L), ("2", 9L), ("3", 9L), ("8", 4L), ("9", 2L))
      .toDF("id", "len")
    val wl = cc.join(len, Seq("id"))
    val ml = wl.groupBy(col("cluster")).agg(max(col("len")).as("mlen"))
    val canon = wl.join(ml, Seq("cluster"))
      .filter(col("len") === col("mlen"))
      .groupBy(col("cluster")).agg(min(col("id")).as("canonical"))
    val out = wl.join(canon, Seq("cluster"))
      .select(col("id"), col("canonical"),
        (col("id") === col("canonical")).as("keep"))
      .orderBy("id").collect()
      .map(r => (r.getString(0), r.getString(1), r.getBoolean(2)))
    assert(out.toSeq === Seq(
      ("1", "2", false), ("2", "2", true), ("3", "2", false),
      ("8", "8", true), ("9", "8", false)))
  }

  test("incremental dedup pairs delta docs with the corpus only") {
    import spark.implicits._
    val docs = Seq(
      // base corpus (doc_id % 10 != 7)
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "red orange yellow green blue indigo violet"),
      // delta batch (doc_id % 10 == 7)
      (7L, "alpha beta gamma delta epsilon zeta eta theta"), // dup of 1
      (27L, "one two three four five six seven"), // genuinely new
      (37L, "one two three four five six seven") // dup of 27 — but 27
      // is ALSO delta, so the cross-set check must NOT pair them
    ).toDF("doc_id", "text")
    val out = DedupQueries.incrementalOf(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.toSeq === Seq((7L, 1L, 1.0)))
  }

  test("hash sampling is deterministic and stratum-scoped") {
    val sf = "/root/testdata/sf0.001"
    val once = DedupQueries.sampleQ(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    val again = DedupQueries.sampleQ(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    // same docs every run — the decision is content-keyed, not RNG
    assert(once === again)
    assert(once.nonEmpty)
    // every sampled lang has a configured rate
    assert(once.map(_._2).subsetOf(DedupQueries.SampleRates.keySet))
    // the de stratum (rate 1.0) survives whole
    val total = graft.Tables.documents(spark, sf)
      .filter(col("lang") === "de").count()
    assert(once.count(_._2 == "de").toLong === total)
  }

  test("leak-free split: a near-dup cluster never straddles splits") {
    val sf = "/root/testdata/sf0.001"
    val split = DedupQueries.splitQ(spark, sf)
    // every document of the corpus gets exactly one assignment
    val total = graft.Tables.documents(spark, sf).count()
    assert(split.count() === total)
    // clustered docs share their cluster's split — zero clusters with
    // more than one distinct split value
    val straddling = DedupQueries.clustersQ(spark, sf)
      .select(col("doc_id"), col("canonical"))
      .join(split, Seq("doc_id"))
      .groupBy(col("canonical"))
      .agg(countDistinct(col("split")).as("n"))
      .filter(col("n") > 1).count()
    assert(straddling === 0L)
    // all three splits exist and train dominates
    val bydist = split.groupBy(col("split")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bydist.keySet === Set("train", "val", "test"))
    assert(bydist("train") > bydist("val") + bydist("test"))
  }

  /** Signatures for the cap tests: band 0 (sig slots 1-4) is the hot
    * boilerplate key shared by ALL docs; band 1 (slots 5-8) pairs doc
    * 2i with 2i+1; bands 2-3 are unique per doc. MinhashK = 16,
    * Bands = 4, RowsPerBand = 4 per [[DedupQueries]].
    */
  private def hotBandSigs(n: Int) = {
    val rows = (0 until n).map { i =>
      val sig = Array.fill(4)(7L) ++ Array.fill(4)(1000L + i / 2) ++
        (8 until 16).map(k => 100000L + i * 16L + k)
      (i.toLong, sig.toSeq)
    }
    rows.toDF("doc_id", "sig")
  }

  test("hot LSH bucket is dropped by the cap; rarer bands still pair") {
    val sigs = hotBandSigs(100)
    // uncapped: the hot band alone contributes 100*99/2 pairs
    val uncapped = Dedup.lshCandidates(sigs, "doc_id",
      DedupQueries.Bands, DedupQueries.RowsPerBand, cap = Long.MaxValue)
    assert(uncapped.count() === 100L * 99 / 2)
    // capped (default 64): the boilerplate bucket is gone, the 50
    // neighbour pairs from band 1 (bucket size 2) survive
    val capped = Dedup.lshCandidates(sigs, "doc_id",
      DedupQueries.Bands, DedupQueries.RowsPerBand)
    val got = capped.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === (0 until 100 by 2).map(i => (i.toLong, i + 1L)).toSet)
  }

  test("soak: pair volume stays linear when 1k docs share a band key") {
    val sigs = hotBandSigs(1000)
    val n = Dedup.lshCandidates(sigs, "doc_id",
      DedupQueries.Bands, DedupQueries.RowsPerBand).count()
    // linear in docs (one neighbour pair per two docs), not k²/2
    assert(n === 500L)
  }

  test("simhash hot buckets are capped; near pair outside them survives") {
    // 100 byte-identical simhashes: every band bucket holds 100 > cap,
    // so the boilerplate cluster emits nothing; docs 200/201 differ in
    // one bit and pair normally
    val sigs = ((0 until 100).map(i => (i.toLong, 0L)) ++
      Seq((200L, 0x3FFFFFL), (201L, 0x3FFFFEL))).toDF("doc_id", "simhash")
    val pairs = Dedup.simhashPairs(sigs, "doc_id",
      DedupQueries.SimhashBands, DedupQueries.SimhashBandBits,
      DedupQueries.SimhashMaxDist)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(pairs.toSeq === Seq((200L, 201L, 1)))
  }

  test("exact substring dedup: cross-doc and within-doc spans, exactly") {
    // docs 1/2 share a 12-word block at different offsets; doc 3 is
    // unrelated; doc 4 repeats its own 10-word half verbatim
    val block = (0 until 12).map(i => s"bl$i").mkString(" ")
    val half = (0 until 10).map(i => s"xx$i").mkString(" ")
    val docs = Seq(
      (1L, (0 until 9).map(i => s"pa$i").mkString(" ") + " " + block),
      (2L, block + " " + (0 until 7).map(i => s"sb$i").mkString(" ")),
      (3L, (0 until 30).map(i => s"zz$i").mkString(" ")),
      (4L, half + " " + half))
      .toDF("doc_id", "text")
    val out = DedupQueries.substrOf(docs).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))))
      .toMap
    val k = DedupQueries.SubstrK // 8
    // the shared 12-word block holds 12-8+1 = 5 duplicated grams in
    // one run → one span of (4-0)+8 = 12 tokens, in both docs
    val blockGrams = 12L - k + 1
    assert(out(1L) === ((1L, blockGrams, 12L, 0.3571))) // 5/14 grams
    assert(out(2L) === ((1L, blockGrams, 12L, 0.4167))) // 5/12 grams
    assert(!out.contains(3L))
    // "half half": grams 0-2 repeat at 10-12, boundary grams unique →
    // two 3-gram runs of (2-0)+8 = 10 tokens each
    assert(out(4L) === ((2L, 6L, 10L, 0.4615))) // 6/13 grams
  }

  test("clone spans: a shared span is found with a faithful extent") {
    // doc 1 and 2 share a 30-word clone at DIFFERENT offsets, inside
    // unrelated surrounding text; doc 3 is unrelated entirely
    val clone = (0 until 30).map(i => s"cl$i").mkString(" ")
    val docs = Seq(
      (1L, (0 until 10).map(i => s"pa$i").mkString(" ") + " " + clone +
        " " + (0 until 8).map(i => s"sa$i").mkString(" ")),
      (2L, (0 until 4).map(i => s"pb$i").mkString(" ") + " " + clone +
        " " + (0 until 12).map(i => s"sb$i").mkString(" ")),
      (3L, (0 until 40).map(i => s"zz$i").mkString(" ")))
      .toDF("doc_id", "text")
    import graft.textanalysis.TextAnalysis
    // hit-level audit: all shared fingerprints lie on the clone's
    // single diagonal (offset 10 − 4 = 6)
    val pos = TextAnalysis.fingerprintPositions(docs)
    val hits = pos.select(col("h"), col("doc_id").as("a"),
        col("gpos").as("pa"))
      .join(pos.select(col("h"), col("doc_id").as("b"),
        col("gpos").as("pb")), Seq("h"))
      .filter(col("a") < col("b"))
      .collect()
    assert(hits.nonEmpty, "the clone must produce shared fingerprints")
    assert(hits.forall(r => r.getLong(2) - r.getLong(4) === 6L))
    // end-to-end through the PRODUCTION operator: one span for (1, 2),
    // nothing involving the unrelated doc 3, faithful extent
    val spans = DedupQueries.spansOf(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(spans.length === 1)
    val (a, b, nSpans, longest) = spans.head
    assert((a, b) === ((1L, 2L)) && nSpans === 1L)
    val cloneGrams = 30 - TextAnalysis.FpN + 1
    assert(longest <= cloneGrams + TextAnalysis.FpN - 1)
    assert(longest >= cloneGrams - 2 * TextAnalysis.FpWin)
  }
}
