package graft.enrich

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver-facing geocode query: customers carry messy synthetic
  * address strings, the orders table plays the mirrored OSM gazetteer,
  * and the DuckDB oracle computes the expected matches arithmetically
  * from the keys — so the Spark side's actual text parsing
  * (squash/lowercase/tokenize) is checked against an independent path.
  */
object NominatimQueries {

  /** Gazetteer mirror from orders: normalized join columns + display
    * fields, the shape a geocoder index would be mirrored into.
    */
  def gazetteer(s: SparkSession, d: String): DataFrame =
    graft.Tables.orders(s, d).select(
      col("o_orderkey").cast("long").as("osm_id"),
      when(col("o_orderkey") % 2 === 0, "node").otherwise("way")
        .as("osm_type"),
      (col("o_orderkey") % 40 + 1).cast("string").as("g_num"),
      concat(lit("city"), (col("o_orderkey") % 7).cast("string"))
        .as("g_city"),
      concat(lit("c"), (col("o_orderkey") % 25).cast("string"))
        .as("g_country"),
      concat((col("o_orderkey") % 40 + 1).cast("string"),
        lit(" Market Street, City"), (col("o_orderkey") % 7).cast("string"),
        lit(", C"), (col("o_orderkey") % 25).cast("string"))
        .as("display_name"),
      concat(lit("C"), (col("o_orderkey") % 25).cast("string"))
        .as("g_country_name"),
      concat(lit("City"), (col("o_orderkey") % 7).cast("string"))
        .as("g_city_name"),
      concat(lit("State"), (col("o_orderkey") % 5).cast("string"))
        .as("g_state_name"),
      (col("o_orderkey") % 100 + 10000).cast("string").as("g_postcode"))

  /** Query addresses from customers: messy spacing, lowercase text,
    * a tiny unparseable address every 17th row, country present on
    * two-thirds.
    */
  def addresses(s: SparkSession, d: String): DataFrame =
    graft.Tables.customer(s, d).select(
      concat(lit("c:"), col("c_custkey").cast("string")).as("id"),
      when(col("c_custkey") % 17 === 0, "x st").otherwise(
        concat((col("c_custkey") % 40 + 1).cast("string"),
          lit("  market   street  city"),
          (col("c_custkey") % 7).cast("string"))).as("full"),
      when(col("c_custkey") % 3 =!= 1,
        concat(lit("C"), (col("c_custkey") % 25).cast("string")))
        .as("country"))

  /** The gazetteer as a lake artifact — a mirrored OSM index IS a
    * stored table in production; synthesizing it inline put the whole
    * display-string arithmetic on a single-row-group scan task (see
    * the bq_mirror note in BrightQueryQueries). Built at ingest.
    */
  def gazetteerCk(s: SparkSession, d: String): DataFrame =
    graft.IndexLake.artifact(s, d, "osm_gazetteer")(gazetteer(s, d))

  def geocodeQ(s: SparkSession, d: String): DataFrame =
    new NominatimEnricher(gazetteerCk(s, d)).geocode(s, addresses(s, d))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_enrich_geocode" -> (geocodeQ _))

  val oracles: Map[String, String] = Map(
    "q_enrich_geocode" -> """
    WITH q AS (
      SELECT 'c:' || CAST(c_custkey AS VARCHAR) AS id,
             c_custkey % 40 + 1 AS num, c_custkey % 7 AS city,
             CASE WHEN c_custkey % 3 <> 1 THEN c_custkey % 25 END AS ctry
      FROM customer WHERE c_custkey % 17 <> 0
    ),
    cand AS (
      SELECT q.id, o.o_orderkey,
             row_number() OVER (PARTITION BY q.id ORDER BY o.o_orderkey)
               AS rn
      FROM q JOIN orders o
        ON o.o_orderkey % 40 + 1 = q.num AND o.o_orderkey % 7 = q.city
       AND (q.ctry IS NULL OR o.o_orderkey % 25 = q.ctry)
    )
    SELECT id,
           'osm-' || CASE WHEN o_orderkey % 2 = 0 THEN 'node'
                          ELSE 'way' END || '-'
             || CAST(o_orderkey AS VARCHAR) AS match_id,
           CAST(o_orderkey % 40 + 1 AS VARCHAR) || ' Market Street, City'
             || CAST(o_orderkey % 7 AS VARCHAR) || ', C'
             || CAST(o_orderkey % 25 AS VARCHAR) AS full,
           'C' || CAST(o_orderkey % 25 AS VARCHAR) AS country,
           'City' || CAST(o_orderkey % 7 AS VARCHAR) AS city,
           'State' || CAST(o_orderkey % 5 AS VARCHAR) AS state,
           CAST(o_orderkey % 100 + 10000 AS VARCHAR) AS postalCode
    FROM cand WHERE rn = 1""")
}
