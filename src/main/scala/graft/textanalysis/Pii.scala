package graft.textanalysis

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** PII detection / redaction — the scrub pass every training-data
  * pipeline runs before text leaves the curation boundary. Four
  * pattern classes (email, phone, SSN-shaped, long digit runs = account
  * and record ids), each counted on the raw text and replaced with a
  * typed placeholder, in a fixed class order so the output is
  * deterministic. Pure column expressions — `regexp_count` +
  * `regexp_replace` are codegen'd, the pass is map-only, and at 100 TB
  * it pipelines inside the same scan stage as tokenization.
  *
  * Patterns deliberately use explicit `[0-9]`/`[A-Za-z]` classes and no
  * lookaround, so Java regex (Spark) and RE2 (the DuckDB oracle) agree
  * byte-for-byte.
  *
  * The driver query runs the scrub over a flattened structured export
  * (customer name + segment — the realistic case of DB records being
  * surfaced as training text; every `Customer#NNNNNNNNN` name carries a
  * live 9-digit record id that MUST be caught). The synthetic prose
  * corpus contains no digits, so emails/phones/SSNs are exercised by
  * PiiSpec on adversarial inline rows instead — same expressions, same
  * class order.
  */
object Pii {

  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe =
    "(\\+?[0-9]{1,2}[-. ])?(\\([0-9]{3}\\)|[0-9]{3})[-. ][0-9]{3}[-. ][0-9]{4}"
  val SsnRe = "[0-9]{3}-[0-9]{2}-[0-9]{4}"
  val IdRe = "[0-9]{6,}"

  /** (class, pattern, placeholder) in application order: narrower,
    * separator-bearing classes first so the broad digit-run rule can
    * never swallow a phone or SSN before it is typed.
    */
  val Classes: Seq[(String, String, String)] = Seq(
    ("email", EmailRe, "<EMAIL>"),
    ("phone", PhoneRe, "<PHONE>"),
    ("ssn", SsnRe, "<SSN>"),
    ("id", IdRe, "<ID>"))

  /** Redacted form of a text column: every class applied in order. */
  def scrub(text: Column): Column =
    Classes.foldLeft(text) { case (c, (_, re, ph)) =>
      regexp_replace(c, re, ph)
    }

  /** Per-class match count on the raw text (pre-redaction, so counts
    * are independent of class order).
    */
  def counts(text: Column): Seq[(String, Column)] =
    Classes.map { case (name, re, _) =>
      s"n_$name" -> regexp_count(text, lit(re)).cast("long")
    }

  /** Scrub an arbitrary (key, text) frame: counts + redacted text. */
  def scrubbed(records: DataFrame, key: String): DataFrame = {
    val cs = counts(col("text")).map { case (n, c) => c.as(n) }
    records.select(col(key) +: cs :+ scrub(col("text")).as("redacted"): _*)
  }

  /** The flattened customer export: structured record → one text line. */
  def customerText(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d).select(col("c_custkey"),
      concat_ws(" ", col("c_name"), col("c_mktsegment")).as("text"))

  def piiQ(s: SparkSession, d: String): DataFrame =
    scrubbed(customerText(s, d), "c_custkey")

  // ---------------------------------------------------------------- oracle

  private def replaceSql(inner: String): String =
    Classes.foldLeft(inner) { case (e, (_, re, ph)) =>
      s"regexp_replace($e, '${re.replace("\\", "\\")}', '$ph', 'g')"
    }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_text_pii" -> (piiQ _))

  val oracles: Map[String, String] = Map(
    "q_text_pii" -> s"""
      SELECT c_custkey,
             ${Classes.map { case (n, re, _) =>
               s"CAST(len(regexp_extract_all(text, '$re')) AS BIGINT) AS n_$n"
             }.mkString(",\n             ")},
             ${replaceSql("text")} AS redacted
      FROM (SELECT c_custkey, c_name || ' ' || c_mktsegment AS text
            FROM customer)""")
}
