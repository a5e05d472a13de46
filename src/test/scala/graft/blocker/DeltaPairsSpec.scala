package graft.blocker

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Incremental pair generation ([[Blocker.deltaPairScores]]): the
  * delta-restricted join must reproduce the FULL pair table filtered to
  * delta-touched pairs, row for row — scores included — with each pair
  * emitted exactly once regardless of which side(s) sit in the delta.
  */
class DeltaPairsSpec extends AnyFunSuite {
  import SparkSpec.spark
  import spark.implicits._

  def entriesDf(rows: (String, String, String, String, Long)*) =
    rows.toDF("schema", "id", "field", "token", "cnt")

  val compat = Seq(("Person", "Person")).toDF("ls", "rs")
  val noBoosts = Seq.empty[(String, Double)].toDF("field", "boost")

  // corpus engineered for all three pair orientations:
  //   (b,a) both non-delta, (d1,a) delta-low side, (z, d1) delta as the
  //   smaller id, (d2,d1) both delta
  val e = entriesDf(
    ("Person", "a", "name", "n:x", 1L),
    ("Person", "b", "name", "n:x", 1L),
    ("Person", "d1", "name", "n:x", 1L),
    ("Person", "d2", "name", "n:x", 1L),
    ("Person", "z", "name", "n:x", 1L),
    ("Person", "a", "name", "n:solo", 1L),
    ("Person", "d1", "name", "n:solo", 1L))
  val isDelta = col("id").startsWith("d")

  test("delta pairs == full pairs filtered to delta-touched, scores equal") {
    val tf = Blocker.termFrequencies(e, compat, noBoosts)
    val full = Blocker.pairScores(tf, compat)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2))
      .toMap
    val expected = full.filter { case ((l, r), _) =>
      l.startsWith("d") || r.startsWith("d") }
    val got = Blocker.deltaPairScores(tf, isDelta, compat)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2))
      .toMap
    assert(got === expected)
    // sanity: the scenario really exercises non-trivial restriction
    assert(expected.nonEmpty && expected.size < full.size)
    // both-delta and both orientations of mixed pairs are present
    assert(got.contains(("d2", "d1")))
    assert(got.contains(("d1", "a"))) // delta id is the larger side
    assert(got.contains(("z", "d1"))) // delta id is the smaller side
  }

  test("each delta-touched pair is emitted exactly once") {
    val tf = Blocker.termFrequencies(e, compat, noBoosts)
    val rows = Blocker.deltaPairScores(tf, isDelta, compat)
      .groupBy(col("lid"), col("rid")).count()
      .filter(col("count") > 1).collect()
    assert(rows.isEmpty)
  }

  test("output is canonicalized to lid > rid like the full pair table") {
    val tf = Blocker.termFrequencies(e, compat, noBoosts)
    val bad = Blocker.deltaPairScores(tf, isDelta, compat)
      .filter(col("lid") <= col("rid")).count()
    assert(bad === 0L)
  }
}
