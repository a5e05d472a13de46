package graft.textanalysis

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** BPE pair-count arithmetic on a hand-computed fixture (the oracle
  * gate q_text_bpe checks engine parity; this pins the formula).
  */
class BpeSpec extends AnyFunSuite {
  import SparkSpec.spark
  import spark.implicits._

  test("pair counts weight by word frequency and count per occurrence") {
    // vocabulary: "aab" ×3, "ab" ×1, "x" ×2 (too short — no pairs)
    val docs = Seq((1L, "aab ab aab"), (2L, "aab x x"))
      .toDF("doc_id", "text")
    val out = Bpe.pairCounts(Bpe.vocabulary(docs)).collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    // (a,a): once per "aab" occurrence = 3; (a,b): "aab"×3 + "ab"×1 = 4
    assert(out === Map(("a", "a") -> 3L, ("a", "b") -> 4L))
  }

  test("repeated symbols count every adjacent occurrence") {
    val docs = Seq((1L, "aaaa")).toDF("doc_id", "text")
    val out = Bpe.pairCounts(Bpe.vocabulary(docs)).collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    assert(out === Map(("a", "a") -> 3L))
  }

  test("sequential training follows the hand-computed merge chain") {
    // vocab: "aaab" ×3, "ab" ×2
    // r1: (a,a)=6, (a,b)=5 → merge (a,a); aaab→[aa,a,b], ab→[a,b]
    // r2: (aa,a)=3, (a,b)=5 → merge (a,b); → [aa,ab], [ab]
    // r3: (aa,ab)=3 → merge (aa,ab)
    val docs = Seq((1L, "aaab aaab aaab ab ab")).toDF("doc_id", "text")
    val merges = Bpe.trainMerges(Bpe.vocabulary(docs), 5)
    assert(merges === Seq(("a", "a"), ("a", "b"), ("aa", "ab")))
  }

  test("encode applies ranked merges exactly, vocabulary-wise") {
    // first-round merges: (a,a) cnt 6 rank 1, (a,b) cnt 5 rank 2
    // "aaab": _a_a_a_b_ →(a,a) _aa_a_b_ →(a,b) _aa_ab_ = 2 tokens
    // "ab":   _a_b_ →(a,b) _ab_ = 1 token
    val docs = Seq((1L, "aaab aaab aaab ab ab")).toDF("doc_id", "text")
    val out = Bpe.encodeOf(docs).collect()
    assert(out.length === 1)
    assert((out(0).getLong(1), out(0).getLong(2)) === ((5L, 3L * 2 + 2L * 1)))
  }

  test("adjacent same-pair occurrences merge in one pass") {
    // the under-merge trap: with shared single-separator boundaries,
    // 'abab' would merge to [ab, a, b]; true BPE (double-boundary
    // replace) gives [ab, ab] — the merge chain below only holds if
    // adjacent occurrences merge simultaneously
    val docs = Seq((1L, "abab abab aaaa")).toDF("doc_id", "text")
    // r1: (a,b)=4 > (a,a)=3 → abab=[ab,ab]; r2: (a,a)=3 → aaaa=[aa,aa]
    // r3: (ab,ab)=2 → [abab]; r4: (aa,aa)=1 → [aaaa]; r5 dry
    val merges = Bpe.trainMerges(Bpe.vocabulary(docs), 10)
    assert(merges ===
      Seq(("a", "b"), ("a", "a"), ("ab", "ab"), ("aa", "aa")))
    // encode with first-round merges ((a,b) rank 1): abab → 2 tokens
    val out = Bpe.encodeOf(Seq((1L, "abab abab")).toDF("doc_id", "text"))
      .collect()
    assert((out(0).getLong(1), out(0).getLong(2)) === ((2L, 4L)))
  }

  test("top merges are fully tiebroken") {
    val rows = Bpe.bpeQ(spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty && rows.length <= Bpe.TopMerges)
    val keys = rows.map(r => (-r.getLong(2), r.getString(0), r.getString(1)))
    assert(keys.sameElements(keys.sorted))
  }
}
