package graft.blocker

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Blocker operators driven with manual rows — the Spark mirror of the
  * reference's direct-SQL blocker tests
  * (`tests/blocker/test_index.py:25-112`): pair generation, stopword
  * cost caps, IDF math, and alias damping asserted on constructed
  * inputs.
  */
class BlockerSpec extends AnyFunSuite {
  import SparkSpec.spark
  import spark.implicits._

  def entriesDf(rows: (String, String, String, String, Long)*) =
    rows.toDF("schema", "id", "field", "token", "cnt")

  val compat = Seq(("Person", "Person")).toDF("ls", "rs")
  val noBoosts = Seq.empty[(String, Double)].toDF("field", "boost")

  test("shared tokens produce one pair; l.id > r.id halves the join") {
    val e = entriesDf(
      ("Person", "a", "name", "n:x", 1L),
      ("Person", "b", "name", "n:x", 1L),
      ("Person", "c", "name", "n:y", 1L))
    val tf = Blocker.termFrequencies(e, compat, noBoosts)
    val pairs = Blocker.pairScores(tf, compat).collect()
    assert(pairs.length === 1)
    assert(pairs.head.getString(0) === "b" && pairs.head.getString(1) === "a")
    assert(pairs.head.getDouble(2) > 0.0)
  }

  test("stopword cost cap drops high-fanout tokens from pairs") {
    // token n:common appears on 6 entities → same-schema cost 15;
    // with cap 10 it must become a stopword and emit no pairs
    val rows = (1 to 6).map(i =>
      ("Person", s"e$i", "name", "n:common", 1L)) :+
      (("Person", "e1", "name", "n:rare", 1L)) :+
      (("Person", "e2", "name", "n:rare", 1L))
    val e = entriesDf(rows: _*)
    val cfg = Blocker.Config(maxPairCost = 10L)
    val stats = Blocker.tokenStats(e)
    val sw = Blocker.stopwords(stats, compat, cfg).collect()
    assert(sw.map(_.getString(0)).toSet === Set("n:common"))
    assert(sw.head.getLong(1) === 15L)
    val tf = Blocker.termFrequencies(e, compat, noBoosts, cfg)
    val pairs = Blocker.pairScores(tf, compat).collect()
    // only the rare token may pair: exactly (e2, e1)
    assert(pairs.length === 1)
    assert(pairs.head.getString(0) === "e2")
  }

  test("IDF counts distinct ids and rarer tokens weigh more") {
    val e = entriesDf(
      ("Person", "a", "name", "n:rare", 1L),
      ("Person", "a", "np", "n:rare", 1L), // same id, second field
      ("Person", "a", "name", "n:common", 1L),
      ("Person", "b", "name", "n:common", 1L),
      ("Person", "c", "name", "n:common", 1L))
    val idf = Blocker.idf(e).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    // distinct-id IDF: n:rare df=1 (not 2 despite two fields)
    assert(math.abs(idf("n:rare") - (1.0 + math.log(3.0 / 1.0))) < 1e-9)
    assert(math.abs(idf("n:common") - (1.0 + math.log(3.0 / 3.0))) < 1e-9)
    assert(idf("n:rare") > idf("n:common"))
  }

  test("alias damping hits only damp fields; name-less ids keep rows") {
    val e = entriesDf(
      ("Person", "a", "name", "n:x", 4L), // 4 name tokens → damp sqrt(4)
      ("Person", "a", "date", "d:1999", 1L),
      ("Person", "b", "date", "d:1999", 1L)) // b has NO name tokens
    val tf = Blocker.termFrequencies(e, compat, noBoosts,
      dampFields = Seq("name")).collect()
      .map(r => (r.getString(1), r.getString(3)) -> r.getDouble(4)).toMap
    // b survives the left join with default n_names = 1
    assert(tf.contains(("b", "d:1999")))
    // a's date weight is NOT damped, equals b's
    assert(math.abs(tf(("a", "d:1999")) - tf(("b", "d:1999"))) < 1e-9)
    // a's name weight IS damped by sqrt(4) = 2 relative to its idf
    val idfX = 1.0 + math.log(2.0 / 1.0)
    assert(math.abs(tf(("a", "n:x")) - idfX / 2.0) < 1e-9)
  }

  test("match top-K keeps the relative score floor") {
    val idx = entriesDf(
      ("Person", "c1", "name", "n:x", 1L),
      ("Person", "c2", "name", "n:x", 1L),
      ("Person", "c2", "name", "n:y", 1L),
      ("Person", "q", "name", "n:x", 1L),
      ("Person", "q", "name", "n:y", 1L))
    val tf = Blocker.termFrequencies(idx, compat, noBoosts)
    val topk = Blocker.matchTopK(
      tf.filter(col("id") === "q"), tf.filter(col("id") =!= "q"), compat,
      Blocker.Config(maxCandidates = 10, minScoreRatio = 0.1))
    val rows = topk.orderBy(col("rn")).collect()
    // c2 shares two tokens → ranks first; c1 one token
    assert(rows.map(_.getString(1)).toSeq === Seq("c2", "c1"))
    assert(rows.head.getDouble(2) >= rows.last.getDouble(2))
  }

  test("symbol tokens block cross-form org/person variants together") {
    val named = Seq(
      ("Company", "o1", "ACME Limited"),
      ("Company", "o2", "ACME Ltd"),
      ("Company", "o3", "Siemens Russia 012"),
      ("Person", "p1", "Bill Smith"),
      ("Person", "p2", "William Smith")).toDF("schema", "id", "value")
    val sy = EntityTokenizer.symbolEntries(named)
      .collect().map(r => (r.getString(1), r.getString(3))).toSet
    // limited and ltd collapse to one ORG_CLASS symbol -> same bucket
    assert(sy(("o1", "sy:org_class:ltd")) && sy(("o2", "sy:org_class:ltd")))
    // location + zero-normalized numeral
    assert(sy(("o3", "sy:location:russia")) && sy(("o3", "sy:numeric:12")))
    // Bill and William share a NICK symbol
    val shared = sy.collect { case ("p1", t) => t }
      .intersect(sy.collect { case ("p2", t) => t })
    assert(shared.exists(_.startsWith("sy:nick:")))
  }
}
