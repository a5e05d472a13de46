package graft.cli

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** The corpus-curation pipeline driven through its real main: stage
  * counts are monotone, the output corpus matches the report, survivors
  * are deterministic, and re-running reproduces the report exactly.
  */
class CurateSpec extends AnyFunSuite {
  import SparkSpec.spark

  private val docsPath = "/root/testdata/sf0.001/documents.parquet"

  test("curate main: gated, deduped, sharded corpus with exact report") {
    val out = Files.createTempDirectory("curate").toString + "/o"
    CurateMain.main(Array(docsPath, out))
    val report = Files.readString(Paths.get(s"$out/report.json"))
    val corpus = spark.read.parquet(s"$out/corpus")
    val counts = "\\d+".r.findAllIn(report).map(_.toLong).toSeq
    val Seq(input, exact, unscoreable, qual, lm, near, _, windows) = counts
    assert(input >= exact && exact >= qual && qual >= lm && lm >= near,
      s"stage counts must be monotone: $report")
    // unscoreable docs are a subset of what the quality stage dropped
    assert(unscoreable <= exact - qual, s"unscoreable bound: $report")
    assert(windows > 0, s"packing produced no windows: $report")
    assert(near === corpus.count(), "corpus size matches the report")
    assert(near > 0, "pipeline kept something")
    // output schema carries the gating evidence + shard
    val cols = corpus.columns.toSet
    assert(Set("doc_id", "text", "quality", "avg_logp", "shard",
      "n_tokens", "start_tok", "first_window", "window_offset",
      "n_windows").subsetOf(cols), s"missing columns in $cols")
    assert(corpus.select(col("shard")).distinct().count() > 1)
    // deterministic: a second run reproduces the report byte-for-byte
    val out2 = Files.createTempDirectory("curate2").toString + "/o"
    CurateMain.main(Array(docsPath, out2))
    assert(Files.readString(Paths.get(s"$out2/report.json")) === report)
  }
}
