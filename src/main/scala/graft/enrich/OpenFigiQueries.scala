package graft.enrich

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver-facing OpenFIGI mapping query: parts play the mirrored FIGI
  * instrument table, customers the query entities. Exercises the
  * Security/ISIN gate, the composite-FIGI filter (non-composite
  * instruments dropped, a missing composite kept) and the
  * keep-query-id contract; the oracle recomputes the join
  * arithmetically.
  */
object OpenFigiQueries {

  /** FIGI mapping mirror from part: every fifth instrument is a
    * non-composite listing (dropped by the filter), every seventh-
    * mod-3 has no composite recorded (kept).
    */
  def mapping(s: SparkSession, d: String): DataFrame = {
    val p = col("p_partkey")
    graft.Tables.part(s, d).select(
      concat(lit("BBG"), lpad(p.cast("string"), 9, "0")).as("figi"),
      when(p % 7 === 3, lit(null).cast("string"))
        .when(p % 5 === 0,
          concat(lit("BBG"), lpad((p + 1).cast("string"), 9, "0")))
        .otherwise(concat(lit("BBG"), lpad(p.cast("string"), 9, "0")))
        .as("composite_figi"),
      concat(lit("US"), lpad((p % 500).cast("string"), 10, "0"))
        .as("isin"),
      concat(lit("Issuer "), (p % 300).cast("string")).as("name"),
      concat(lit("TK"), (p % 100).cast("string")).as("ticker"),
      when(p % 3 === 0, "Common Stock").when(p % 3 === 1, "Bond")
        .otherwise("ETP").as("security_type"),
      concat(lit("Desc "), p.cast("string")).as("security_description"))
  }

  /** Query entities from customer: every fourth is a Security, every
    * sixth-mod-1 lacks an ISIN.
    */
  def securityQueries(s: SparkSession, d: String): DataFrame = {
    val k = col("c_custkey")
    graft.Tables.customer(s, d).select(
      concat(lit("s:"), k.cast("string")).as("id"),
      when(k % 4 === 0, "Security").otherwise("Company").as("schema"),
      when(k % 6 =!= 1,
        concat(lit("US"), lpad((k % 500).cast("string"), 10, "0")))
        .as("isin"))
  }

  def figiQ(s: SparkSession, d: String): DataFrame =
    new OpenFigiEnricher(mapping(s, d))
      .matchSecurities(securityQueries(s, d))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_enrich_figi" -> (figiQ _))

  val oracles: Map[String, String] = Map(
    "q_enrich_figi" -> """
    SELECT 's:' || CAST(c_custkey AS VARCHAR) AS query_id,
           'US' || lpad(CAST(c_custkey % 500 AS VARCHAR), 10, '0')
             AS isin,
           'BBG' || lpad(CAST(p_partkey AS VARCHAR), 9, '0')
             AS figi_code,
           'TK' || CAST(p_partkey % 100 AS VARCHAR) AS ticker,
           CASE WHEN p_partkey % 3 = 0 THEN 'Common Stock'
                WHEN p_partkey % 3 = 1 THEN 'Bond'
                ELSE 'ETP' END AS type
    FROM customer JOIN part ON c_custkey % 500 = p_partkey % 500
    WHERE c_custkey % 4 = 0 AND c_custkey % 6 <> 1
      AND NOT (p_partkey % 5 = 0 AND p_partkey % 7 <> 3)""")
}
