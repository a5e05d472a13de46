package graft.textanalysis

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Semantics of the corpus-curation operators on hand-built fixtures:
  * the oracle gate (q_text_repetition / q_text_contamination /
  * q_dedup_crossdoc / q_doc_chunks / q_doc_shards) checks engine
  * parity at SF; these pin the arithmetic the parity check can't see
  * failing (a wrong formula that both engines agree on).
  */
class CurationSpec extends AnyFunSuite {
  import SparkSpec.spark
  import spark.implicits._

  test("repetition: top-bigram and dup-trigram fractions") {
    // "a b a b a b": bigrams {ab×3, ba×2} → top 3/5; trigrams
    // {aba×2, bab×2} → all 4 occurrences duplicated → 1.0
    val docs = Seq((1L, "a b a b a b"), (2L, "x y z w v u"))
      .toDF("doc_id", "text")
    val out = Curation.repetitionOf(docs).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).sortBy(_._1)
    assert(out(0) === ((1L, 0.6, 1.0)))
    // all-distinct doc: top bigram 1/5, no duplicate trigram
    assert(out(1) === ((2L, 0.2, 0.0)))
  }

  test("contamination: eval-gram overlap fraction, eval docs excluded") {
    // doc 0 is the eval slice (0 % 97 == 0); doc 1 shares its first
    // trigram, doc 2 shares nothing
    val docs = Seq(
      (0L, "alpha beta gamma delta"),
      (1L, "alpha beta gamma zeta eta theta"),
      (2L, "one two three four")).toDF("doc_id", "text")
    val out = Curation.contaminationOf(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    // doc 1: distinct trigrams {abg, bgz, gze, zet, eth(θ)} → 4 grams
    // of 6 words = 4 trigrams; hits = 1 ("alpha beta gamma")
    assert(out(0) === ((1L, 4L, 1L)))
    assert(out(1) === ((2L, 2L, 0L)))
    // the eval doc itself is not scored
    assert(!out.exists(_._1 == 0L))
  }

  test("crossdoc: duplicated 4-gram coverage") {
    val shared = "red green blue white"
    val docs = Seq(
      (1L, s"$shared extra words here"),
      (2L, s"prefix tokens then $shared"),
      (3L, "nothing in common at all")).toDF("doc_id", "text")
    val out = Curation.crossdocOf(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    // docs 1 and 2 each carry the shared gram once (df=2)
    assert(out(0)._3 === 1L && out(1)._3 === 1L)
    assert(out(2)._3 === 0L)
  }

  test("chunks: 64-token chunking covers the stream exactly") {
    val text130 = (1 to 130).map(i => s"w$i").mkString(" ")
    val docs = Seq((1L, text130), (2L, "short doc")).toDF("doc_id", "text")
    val out = Curation.chunksOf(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    assert(out.toSeq === Seq((1L, 0L, 64L), (1L, 1L, 64L), (1L, 2L, 2L),
      (2L, 0L, 2L)))
  }

  test("shards: per-source round-robin balances token totals") {
    // one source, 6 docs totalling 2500 tokens → 3 shards of ~833
    val sizes = Seq(800, 700, 400, 300, 200, 100)
    val docs = sizes.zipWithIndex.map { case (n, i) =>
      (i.toLong, (1 to n).map(k => s"t$k").mkString(" "), "src0")
    }.toDF("doc_id", "text", "source")
    val out = Curation.shardsOf(docs).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).sortBy(_._1)
    // rank desc → shards get (800+300), (700+200), (400+100)
    assert(out.toSeq === Seq((0L, 2L, 1100L), (1L, 2L, 900L),
      (2L, 2L, 500L)))
    // partition: every token lands in exactly one shard
    assert(out.map(_._3).sum === sizes.sum.toLong)
  }

  test("shuffle: each epoch is a full, distinct, dense permutation") {
    val docs = (1L to 200L).map(i => (i, s"text $i")).toDF("doc_id", "text")
    val out = Curation.shuffleOf(docs).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getInt(2), r.getLong(3)))
    assert(out.length === 200 * Curation.ShuffleEpochs)
    // every (epoch, doc) appears exactly once
    assert(out.map(t => (t._1, t._4)).distinct.length === out.length)
    // positions are dense from 1 within each (epoch, shard)
    for (((_, _), g) <- out.groupBy(t => (t._1, t._2)))
      assert(g.map(_._3).sorted.sameElements(1 to g.length))
    // epochs permute differently: the doc sequence of shard 0 differs
    val seq0 = out.filter(t => t._1 == 0 && t._2 == 0L)
      .sortBy(_._3).map(_._4).toSeq
    val seq1 = out.filter(t => t._1 == 1 && t._2 == 0L)
      .sortBy(_._3).map(_._4).toSeq
    assert(seq0 !== seq1)
  }

  test("pack: shard streams are gapless and window math is exact") {
    // varying lengths so docs straddle window boundaries
    val docs = (1L to 300L)
      .map(i => (i, (1L to (i % 37 + 1)).map(j => s"w$j").mkString(" ")))
      .toDF("doc_id", "text")
    val out = Curation.packOf(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(out.length === 300)
    val ctx = Curation.PackContext
    for ((_, g) <- out.groupBy(_._1)) {
      // intervals are contiguous from 0: each doc starts where the
      // previous ended — concat-and-chunk never pads inside a shard
      val sorted = g.sortBy(_._4)
      assert(sorted.head._4 === 0L)
      sorted.sliding(2).foreach {
        case Array((_, _, n, s, _, _, _), (_, _, _, s2, _, _, _)) =>
          assert(s2 === s + n)
        case _ =>
      }
      for ((_, _, n, start, fw, off, nw) <- g) {
        assert(fw === start / ctx && off === start % ctx)
        assert(nw === (start + n - 1) / ctx - start / ctx + 1)
        assert(nw >= 1)
      }
      // shard packing follows the epoch-0 shuffle read order
      val order = Curation.shuffleOf(docs).filter(col("epoch") === 0)
        .collect().map(r => (r.getLong(1), r.getInt(2), r.getLong(3)))
        .filter(_._1 == g.head._1).sortBy(_._2).map(_._3).toSeq
      assert(sorted.map(_._2).toSeq === order)
    }
  }

  test("fim: PSM reorder is lossless and the rate is hash-keyed") {
    val docs = (1L to 100L)
      .map(i => (i, s"abcdefghijklmnopqrstuvwxyz $i")).toDF("doc_id", "text")
    val orig = docs.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val out = Curation.fimOf(docs).collect()
      .map(r => (r.getLong(0), r.getBoolean(1), r.getString(2)))
    assert(out.length === 100)
    val (fimmed, plain) = out.partition(_._2)
    // roughly half transform at rate 0.5; untouched docs pass through
    assert(fimmed.length > 20 && fimmed.length < 80)
    assert(plain.forall { case (id, _, t) => t === orig(id) })
    // <PRE>p<SUF>s<MID>m reassembles to p + m + s = the original text
    val Psm = "(?s)<PRE>(.*)<SUF>(.*)<MID>(.*)".r
    for ((id, _, t) <- fimmed) t match {
      case Psm(p, s, m) => assert(p + m + s === orig(id), s"doc $id")
      case _ => fail(s"doc $id not in PSM form: $t")
    }
  }

  test("curriculum: stages are balanced and ordered easy-first") {
    val rows = LangModel.curriculumQ(spark, "/root/testdata/sf0.001")
      .collect().map(r =>
        (r.getString(1), r.getDouble(2), r.getInt(3)))
    assert(rows.nonEmpty)
    for ((_, byLang) <- rows.groupBy(_._1)) {
      val sizes = byLang.groupBy(_._3).view.mapValues(_.length).toMap
      assert(sizes.keySet.subsetOf((1 to LangModel.CurriculumStages).toSet))
      // ntile balance: sizes differ by at most 1
      if (sizes.size > 1) assert(sizes.values.max - sizes.values.min <= 1)
      // stage 1 holds the highest scores
      if (sizes.size > 1) {
        val s1min = byLang.filter(_._3 == 1).map(_._2).min
        val s2max = byLang.filter(_._3 == 2).map(_._2).max
        assert(s1min >= s2max)
      }
    }
  }
}
