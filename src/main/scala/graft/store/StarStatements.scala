package graft.store

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Long/narrow "statement" view of the synthetic star schema.
  *
  * The reference engine's unit of data is the statement — one
  * (entity, property, value) assertion (reference `db.py:193-214`). To run
  * its entity-resolution operators against the driver's TPC-H-ish tables,
  * we project the name-bearing tables into the same narrow shape:
  * `(id, schema, field, value)`. At 100 TB this is the layout statements
  * would be stored in anyway (partitioned by dataset), so every blocker /
  * matcher operator downstream consumes it unchanged.
  */
object StarStatements {

  /** All name-bearing rows of the star schema as one statement table. */
  def apply(s: SparkSession, d: String): DataFrame = {
    val c = graft.Tables.customer(s, d).select(
      concat(lit("c:"), col("c_custkey").cast("string")).as("id"),
      lit("Customer").as("schema"), lit("name").as("field"),
      col("c_name").as("value"))
    val su = graft.Tables.supplier(s, d).select(
      concat(lit("s:"), col("s_suppkey").cast("string")).as("id"),
      lit("Supplier").as("schema"), lit("name").as("field"),
      col("s_name").as("value"))
    val pn = graft.Tables.part(s, d).select(
      concat(lit("p:"), col("p_partkey").cast("string")).as("id"),
      lit("Part").as("schema"), lit("name").as("field"),
      col("p_name").as("value"))
    val pt = graft.Tables.part(s, d).select(
      concat(lit("p:"), col("p_partkey").cast("string")).as("id"),
      lit("Part").as("schema"), lit("type").as("field"),
      col("p_type").as("value"))
    c.unionAll(su).unionAll(pn).unionAll(pt)
  }

  /** DuckDB CTE body mirroring [[apply]] — prefix for oracle queries. */
  val sql: String = """
    stmts AS (
      SELECT 'c:' || CAST(c_custkey AS VARCHAR) AS id, 'Customer' AS schema,
             'name' AS field, c_name AS value FROM customer
      UNION ALL
      SELECT 's:' || CAST(s_suppkey AS VARCHAR), 'Supplier', 'name', s_name
      FROM supplier
      UNION ALL
      SELECT 'p:' || CAST(p_partkey AS VARCHAR), 'Part', 'name', p_name
      FROM part
      UNION ALL
      SELECT 'p:' || CAST(p_partkey AS VARCHAR), 'Part', 'type', p_type
      FROM part
    )"""

  /** Matchable-schema compatibility pairs, normalized ls <= rs (the
    * broadcast `schemata` table of reference `blocker/index.py:220-225`).
    */
  val compat: Seq[(String, String)] = Seq(
    ("Customer", "Customer"), ("Customer", "Supplier"),
    ("Supplier", "Supplier"), ("Part", "Part"))

  val compatSql: String = """
    compat(ls, rs) AS (VALUES ('Customer','Customer'),
      ('Customer','Supplier'), ('Supplier','Supplier'), ('Part','Part'))"""

  /** Field boosts (reference `blocker/index.py` boosts table). */
  val boosts: Seq[(String, Double)] = Seq(("name", 2.0))

  val boostsSql: String = "boosts(field, boost) AS (VALUES ('name', 2.0))"
}
