package graft.textanalysis

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** PII scrub semantics on adversarial inline rows — the synthetic
  * corpus only exercises the digit-run class (customer record ids), so
  * emails / phones / SSNs are pinned here with the same expressions the
  * q_text_pii query uses.
  */
class PiiSpec extends AnyFunSuite {
  import SparkSpec.spark
  import spark.implicits._

  private def run(rows: Seq[(Long, String)]) =
    Pii.scrubbed(rows.toDF("id", "text"), "id").collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)), r.getString(5)))
      .sortBy(_._1)

  test("each class detected and replaced with its typed placeholder") {
    val out = run(Seq(
      (1L, "mail me at jane.doe+x@example.co.uk today"),
      (2L, "call 415-555-0143 or +1 (650) 555-2368 now"),
      (3L, "ssn 078-05-1120 on file"),
      (4L, "account 123456789 balance ok"),
      (5L, "clean text with no identifiers")))
    assert(out(0)._2 === ((1L, 0L, 0L, 0L)))
    assert(out(0)._3 === "mail me at <EMAIL> today")
    assert(out(1)._2 === ((0L, 2L, 0L, 0L)))
    assert(out(1)._3 === "call <PHONE> or <PHONE> now")
    assert(out(2)._2 === ((0L, 0L, 1L, 0L)))
    assert(out(2)._3 === "ssn <SSN> on file")
    assert(out(3)._2 === ((0L, 0L, 0L, 1L)))
    assert(out(3)._3 === "account <ID> balance ok")
    assert(out(4)._2 === ((0L, 0L, 0L, 0L)))
    assert(out(4)._3 === "clean text with no identifiers")
  }

  test("class order: separator-bearing classes win over the digit run") {
    // an SSN is 3-2-4 digits; applied after the id rule it would
    // survive as digits — the fixed order types it first
    val out = run(Seq((1L, "078-05-1120 and 9876543210")))
    assert(out(0)._3 === "<SSN> and <ID>")
    assert(out(0)._2 === ((0L, 0L, 1L, 1L)))
  }

  test("five-digit runs are below the id threshold") {
    val out = run(Seq((1L, "zip 94107 stays, run 123456 goes")))
    assert(out(0)._3 === "zip 94107 stays, run <ID> goes")
  }

  test("customer export carries one live record id per row") {
    val dir = "/root/testdata/sf0.001"
    val out = Pii.piiQ(spark, dir)
    val agg = out.agg(sum(col("n_id")), count(lit(1)), sum(col("n_email")),
      sum(col("n_phone")), sum(col("n_ssn"))).collect()(0)
    assert(agg.getLong(0) === agg.getLong(1)) // every name redacts its id
    assert(agg.getLong(2) === 0L && agg.getLong(3) === 0L &&
      agg.getLong(4) === 0L)
    assert(out.filter(col("redacted").contains("Customer#<ID>")).count() ===
      agg.getLong(1))
  }
}
