package graft.enrich

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.store.EntityStore

/** Mirror-dataset enrichment over a donations split: the Person half
  * queried against a mirror containing the duplicates must surface the
  * Johanna Quandt pair and expand to the address entities.
  */
class EnricherSpec extends AnyFunSuite {
  import SparkSpec.spark

  val fixture = "/root/reference/tests/fixtures/donations.ijson"

  lazy val stmts = EntityStore.statements(
    EntityStore.readIjson(spark, fixture), "donations").cache()

  lazy val captions = EntityStore.assemble(stmts)
    .select(col("id"), col("caption")).cache()

  test("dataset enricher matches the duplicate and expands candidates") {
    val jqId = captions.filter(col("caption") === "Johanna Quandt")
      .head.getString(0)
    val fjqId = captions.filter(col("caption") === "Frau Johanna Quandt")
      .head.getString(0)
    val query = stmts.filter(col("canonical_id") === jqId)
    val mirror = stmts.filter(col("canonical_id") =!= jqId)
    val enricher = new DatasetEnricher("donations-mirror", mirror)
    val cand = enricher.matchCandidates(spark, query).cache()
    assert(cand.count() > 0)
    val best = cand.orderBy(col("match_score").desc).head
    assert(best.getString(1) === fjqId)
    // expand pulls the candidate's statements + referenced addresses
    val expanded = enricher.expand(cand.limit(5))
    assert(expanded.filter(col("canonical_id") === fjqId).count() > 0)
    assert(expanded.filter(col("schema") === "Address").count() > 0)
  }
}
