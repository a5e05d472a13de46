package graft.resolver

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.store.EntityStore

/** Batch review loop ([[Review]]) against the reference TUI semantics:
  * queue filtering/canonicalization (`tui/dedupe.py:45-67`,
  * `resolver/resolver.py:284-327`) and the comparison rendering order
  * and value-similarity classes (`tui/comparison.py`, `tui/util.py`).
  */
class ReviewSpec extends AnyFunSuite {
  import SparkSpec.spark
  import spark.implicits._

  private def edge(t: String, s: String, j: String, score: Double,
      deleted: String = null) =
    (t, s, j, score, "u", "t0", deleted)

  private def edgesDf(rows: Seq[(String, String, String, Double, String,
      String, String)]): DataFrame =
    rows.toDF("target", "source", "judgement", "score", "user",
      "created_at", "deleted_at")

  val canonicalMap = Seq(("a2", "a1"), ("a1", "a1"), ("n2", "n1"),
    ("n1", "n1")).toDF("member", "canonical")

  val schemas = Seq("a1" -> "Person", "a2" -> "Person", "b" -> "Person",
    "c" -> "Company", "n1" -> "Person", "n2" -> "Person",
    "d" -> "Address", "e" -> "Person").toDF("id", "schema")

  val compat = Seq(("Company", "Company"), ("Company", "Person"),
    ("Person", "Person"))

  test("queue canonicalizes, filters judged pairs, gates schemas") {
    val edges = edgesDf(Seq(
      // suggestion against a cluster member → surfaces canonicalized
      edge("a2", "b", ResolverOps.NoJudgement, 12.0),
      // duplicate suggestion for the same canonical pair, lower score
      edge("a1", "b", ResolverOps.NoJudgement, 8.0),
      // within-cluster suggestion → transitively positive → dropped
      edge("a1", "a2", ResolverOps.NoJudgement, 15.0),
      // negative edge n1–e kills the suggestion between the clusters
      edge("n2", "e", ResolverOps.NoJudgement, 11.0),
      edge("n1", "e", ResolverOps.Negative, 2.0),
      // Person × Address: matchable schemata but not compatible
      edge("b", "d", ResolverOps.NoJudgement, 9.0),
      // deleted suggestion is invisible
      edge("b", "c", ResolverOps.NoJudgement, 14.0, deleted = "t1"),
      // live Person × Company suggestion passes the gate
      edge("c", "e", ResolverOps.NoJudgement, 10.0)))
    val q = Review.queue(edges, canonicalMap, schemas, compat)
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getDouble(2), r.getString(3), r.getString(4))).toSet
    assert(q === Set(
      ("a1", "b", 12.0, "Person", "Person"),
      ("c", "e", 10.0, "Company", "Person")))
  }

  test("queue keeps the max score per canonical pair") {
    val edges = edgesDf(Seq(
      edge("a1", "b", ResolverOps.NoJudgement, 8.0),
      edge("a2", "b", ResolverOps.NoJudgement, 12.0),
      edge("b", "a1", ResolverOps.NoJudgement, 5.0)))
    val q = Review.queue(edges, canonicalMap, schemas, compat).collect()
    assert(q.length === 1)
    assert(q.head.getAs[Double]("score") === 12.0)
  }

  // -------------------------------------------------------- comparison

  val entities = Seq(
    ("p1", "Person", Map(
      "name" -> Seq("Johanna Quandt"),
      "birthDate" -> Seq("1926-06-21"),
      "nationality" -> Seq("de"),
      "weakAlias" -> Seq("Hanna"),
      "sourceUrl" -> Seq("https://example.com/1"),
      "wikipediaUrl" -> Seq("https://de.wikipedia.org/wiki/JQ"),
      "notes" -> Seq("matriarch"))),
    ("p2", "Person", Map(
      "name" -> Seq("Johanna Quandt", "J. Quandt"),
      "birthDate" -> Seq("1926"),
      "nationality" -> Seq("fr"),
      "notes" -> Seq("heiress"))))
    .toDF("id", "schema", "properties")

  lazy val stmts = EntityStore.statements(entities, "donations")
  lazy val cmp = Review.comparison(
    Seq(("p1", "p2")).toDF("left_id", "right_id"), stmts)
  lazy val rows = cmp.collect()

  test("comparison orders props by type weight with featured boost") {
    val props = rows.map(_.getAs[String]("prop")).toSeq
    // featured Person props (name −26, birthDate −24, nationality −23)
    // lead; free text follows; the Sources row is pinned last
    assert(props === Seq("name", "birthDate", "nationality", "notes",
      "wikipediaUrl", "datasets"))
    val wName = rows.find(_.getAs[String]("prop") == "name").get
      .getAs[Int]("weight")
    val wBirth = rows.find(_.getAs[String]("prop") == "birthDate").get
      .getAs[Int]("weight")
    assert(wName === -26 && wBirth === -24)
  }

  test("comparison hides non-matchable instances of matchable types") {
    val props = rows.map(_.getAs[String]("prop")).toSet
    assert(!props.contains("weakAlias"))
    assert(!props.contains("sourceUrl"))
    assert(props.contains("wikipediaUrl")) // ALWAYS_SHOW
  }

  test("comparison similarity classes match the TUI thresholds") {
    val name = rows.find(_.getAs[String]("prop") == "name").get
    // exact shared name → strong on both sides
    assert(name.getAs[Double]("left_sim") > 0.95)
    assert(name.getAs[Double]("right_sim") > 0.95)
    val birth = rows.find(_.getAs[String]("prop") == "birthDate").get
    // FtM dates are prefixes: "1926" ⊑ "1926-06-21" compares equal
    assert(birth.getAs[Double]("left_sim") === 1.0)
    val nat = rows.find(_.getAs[String]("prop") == "nationality").get
    assert(nat.getAs[Double]("left_sim") === 0.0)
  }

  test("comparison carries both sides' sorted values and the datasets row") {
    val name = rows.find(_.getAs[String]("prop") == "name").get
    assert(name.getAs[Seq[String]]("left_values") ===
      Seq("Johanna Quandt"))
    assert(name.getAs[Seq[String]]("right_values") ===
      Seq("J. Quandt", "Johanna Quandt"))
    val ds = rows.last
    assert(ds.getAs[String]("prop") === "datasets")
    assert(ds.getAs[Seq[String]]("left_values") === Seq("donations"))
  }
}
