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

  test("top merges are fully tiebroken") {
    val rows = Bpe.bpeQ(spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty && rows.length <= Bpe.TopMerges)
    val keys = rows.map(r => (-r.getLong(2), r.getString(0), r.getString(1)))
    assert(keys.sameElements(keys.sorted))
  }
}
