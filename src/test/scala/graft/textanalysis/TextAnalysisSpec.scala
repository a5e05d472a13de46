package graft.textanalysis

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Byte-stability of the text-analysis tokenization: multi-byte
  * characters must never influence the hashed grams, so the winnowing
  * fingerprint of a document is identical whether non-ASCII content is
  * present or pre-stripped. This is the invariant that keeps the Spark
  * side (UTF-16 Java regex) and the DuckDB oracle (UTF-8 RE2) in exact
  * agreement on any corpus, not just the ASCII testdata.
  */
class TextAnalysisSpec extends AnyFunSuite {
  import SparkSpec.spark
  import spark.implicits._

  private val multi = Seq(
    ("d1", "Grüße from München: the quick brown fox jumps over the lazy dog über alles"),
    ("d2", "中文 text with Chinese 字符 the quick brown fox jumps over the lazy dog"),
    ("d3", "emoji 😀 inside the quick brown fox jumps over the lazy dog"),
    ("d4", "İstanbul TITLE the quick brown fox jumps over the lazy dog"))

  private val stripped = multi.map { case (id, t) =>
    (id, t.map(c => if (c >= ' ' && c <= '~') c else ' '))
  }

  test("winnowing fingerprint is invariant to multi-byte content") {
    val a = TextAnalysis.fingerprintOf(multi.toDF("doc_id", "text"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2),
        r.getLong(3))).sortBy(_._1)
    val b = TextAnalysis.fingerprintOf(stripped.toDF("doc_id", "text"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2),
        r.getLong(3))).sortBy(_._1)
    assert(a.nonEmpty && a.sameElements(b))
  }

  test("word tokens contain only ascii alphanumerics") {
    val toks = TextAnalysis.withWords(multi.toDF("doc_id", "text"))
      .selectExpr("explode(w) AS t").as[String].collect()
    assert(toks.nonEmpty)
    assert(toks.forall(_.forall(c => (c >= 'a' && c <= 'z') ||
      (c >= '0' && c <= '9'))))
    // Unicode lower() expansions (İ → i + combining dot) must not leak
    // an engine-specific token
    assert(!toks.contains("i̇stanbul"))
  }
}
