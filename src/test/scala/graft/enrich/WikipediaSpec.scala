package graft.enrich

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.store.EntityStore

/** Wikipedia summary selection ([[Wikipedia]]) against the reference
  * semantics (`wikidata/wikipedia.py`): country-first language
  * preference, plain-over-variant wiki resolution, the per-candidate
  * cap, the `""` no-summary sentinel and the outside-preference skip.
  */
class WikipediaSpec extends AnyFunSuite {
  import SparkSpec.spark
  import spark.implicits._

  def persons: DataFrame = EntityStore.statements(Seq(
    ("p1", "Person", Map(
      "name" -> Seq("Olena K"),
      "citizenship" -> Seq("ua"))),
    ("p2", "Person", Map(
      "name" -> Seq("Jean D"),
      "citizenship" -> Seq("fr", "ca"))))
    .toDF("id", "schema", "properties"), "t")

  test("preferredLangs: own-country languages first, then global") {
    val pl = Wikipedia.preferredLangs(persons)
    val p1 = pl.filter(col("entity_id") === "p1")
      .orderBy("rank").select("lang").as[String].collect()
    // ukrainian then russian (ua langs), then the global list minus
    // the already-ranked rus
    assert(p1.take(3).toSeq === Seq("ukr", "rus", "eng"))
    val p2 = pl.filter(col("entity_id") === "p2")
      .orderBy("rank").select("lang").as[String].collect()
    // countries sort alphabetically: ca (eng, fra) before fr (fra);
    // fra keeps its best (ca) rank; spa is the first unranked global
    assert(p2.take(3).toSeq === Seq("eng", "fra", "spa"))
  }

  def snak(qid: String, site: String, title: String): (String, String,
      String, String) = (qid, "sitelink", site, title)

  def snaks: DataFrame = Seq(
    snak("Q1", "ukwiki", "Olena"),
    snak("Q1", "enwiki", "Olena_K"),
    snak("Q1", "ruwiki", "Olena_R"),
    snak("Q1", "dewiki", "Olena_D"),
    snak("Q1", "frwiki", "Olena_F"),
    snak("Q1", "eswiki", "Olena_S"),
    snak("Q1", "arwiki", "Olena_A"),
    // variant + plain chinese: the plain wiki must win
    snak("Q2", "zh-classicalwiki", "Ming_old"),
    snak("Q2", "zhwiki", "Ming"),
    // a language outside every preference list
    snak("Q2", "viwiki", "Ming_V"))
    .toDF("qid", "role", "site", "title")

  def summariesOf(rows: (String, String, String)*): DataFrame =
    rows.toDF("site", "title", "extract")

  test("summaries: preference order, cap, sentinel and missing drop") {
    val cands = Seq(("p1", "Q1")).toDF("entity_id", "qid")
    val tbl = summariesOf(
      ("ukwiki", "Olena", "Украинская статья."),
      ("enwiki", "Olena_K", ""), // cached no-summary sentinel
      ("ruwiki", "Olena_R", "Русская статья."),
      ("dewiki", "Olena_D", "Deutscher Artikel."),
      ("frwiki", "Olena_F", "Article français."),
      ("eswiki", "Olena_S", "Artículo español."),
      ("arwiki", "Olena_A", "مقالة عربية."))
    val out = Wikipedia.summaries(cands, snaks,
      Wikipedia.preferredLangs(persons), tbl, limit = 3)
      .orderBy("lang").collect()
    // eng drops on the sentinel; ukr + rus (country langs) then the
    // first surviving global (spa) fill to the cap of 3
    assert(out.length === 3)
    val langs = out.map(_.getAs[String]("lang")).toSeq
    assert(langs === Seq("rus", "spa", "ukr"))
  }

  test("summaries: plain wiki beats variant; unlisted language skips") {
    val cands = Seq(("p2", "Q2")).toDF("entity_id", "qid")
    val tbl = summariesOf(
      ("zhwiki", "Ming", "平文."),
      ("zh-classicalwiki", "Ming_old", "古文."),
      ("viwiki", "Ming_V", "Bài viết."))
    // give p2 chinese preference via a zho-speaking citizenship
    val zh = EntityStore.statements(Seq(
      ("p2", "Person", Map("citizenship" -> Seq("cn"))))
      .toDF("id", "schema", "properties"), "t")
    val out = Wikipedia.summaries(cands, snaks,
      Wikipedia.preferredLangs(zh), tbl)
      .collect()
    // one zho row from the plain wiki; vie is outside the preference
    // list and never surfaces
    assert(out.length === 1)
    assert(out.head.getAs[String]("summary") === "平文.")
  }
}
