package graft.enrich

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.store.EntityStore

/** Driver-facing QuickStatements proposal query: customers become FtM
  * persons paired against the synthetic wikidata dump of
  * [[WikidataQueries]] (every tenth customer against an absent QID, so
  * the empty-known CREATE-shaped path runs too), with qid-resolved
  * positions exercising the qualifier/bare-statement rule. The oracle
  * reconstructs every expected command line arithmetically from
  * `customer`.
  */
object ProposeQueries {

  val Retrieved = "2024-06-01"

  private def k = col("c_custkey").cast("long")

  /** FtM person entities derived from customers: a known name plus a
    * variant, a year-precision birth date, a gender, the fixture
    * citizenship plus a rotating extra (new country / historical /
    * none), and a source URL for the citation tail.
    */
  def personEntities(s: SparkSession, d: String): DataFrame = {
    val isoLit = typedLit(WikidataQueries.FixtureCountries.map(_._2))
    val own = element_at(isoLit, (k % 25).cast("int") + 1)
    val extra = when(k % 3 === 0, array(lit("ua")))
      .when(k % 3 === 1, array(lit("su")))
      .otherwise(array().cast("array<string>"))
    graft.Tables.customer(s, d).select(
      concat(lit("w:"), k.cast("string")).as("id"),
      lit("Person").as("schema"),
      map(
        lit("name"), array(col("c_name"),
          concat(lit("C. "), col("c_name"))),
        lit("birthDate"), array((lit(1900) + k % 100).cast("string")),
        lit("gender"),
        array(when(k % 2 === 0, "male").otherwise("female")),
        lit("citizenship"), concat(array(own), extra),
        lit("sourceUrl"),
        array(concat(lit("https://qs.example/"), k.cast("string")))
      ).as("properties"))
  }

  /** (entity, item) pairs: the customer's own dump item, except every
    * tenth customer pairs against a QID absent from the dump.
    */
  def pairs(s: SparkSession, d: String): DataFrame =
    graft.Tables.customer(s, d).select(
      concat(lit("w:"), k.cast("string")).as("entity_id"),
      when(k % 10 === 9,
        concat(lit("Q"), (lit(999000) + k).cast("string")))
        .otherwise(concat(lit("Q"), (lit(100000) + k).cast("string")))
        .as("qid"))

  /** QID-resolved position claims: always a post the item does not
    * hold; even customers carry a start date, every fourth an end date,
    * and k%16==1 customers a duplicate claim (re-election → bare
    * statement).
    */
  def positions(s: SparkSession, d: String): DataFrame = {
    val base = graft.Tables.customer(s, d).select(
      concat(lit("w:"), k.cast("string")).as("entity_id"),
      concat(lit("Q"), (lit(200000) + (k + 3) % 20).cast("string"))
        .as("pos_qid"),
      when(k % 2 === 0, (lit(2000) + k % 20).cast("string")).as("start"),
      when(k % 4 === 0,
        concat((lit(2010) + k % 20).cast("string"), lit("-06")))
        .as("end"))
    base.unionByName(base.filter(k % 16 === 1)
      .withColumn("start", lit(null).cast("string"))
      .withColumn("end", lit(null).cast("string")))
  }

  /** The FtM person statements as a lake artifact (ingest builds it;
    * see graft.Caches.ensureAll).
    */
  def personStmtsCk(s: SparkSession, d: String): DataFrame =
    graft.IndexLake.artifact(s, d, "wd_person_stmts")(
      EntityStore.statements(personEntities(s, d), "wdq"))

  /** The standing batch's proposal scaffold as a lake artifact (keyed,
    * like every artifact, on the data fingerprint — which covers the
    * dump): the enrich legs broadcast bounded selections of a 32-file
    * parquet scan instead of rebuilding the scaffold on each session's
    * first proposal (the build was billed to q_wd_propose's cold pass).
    */
  def scaffoldCk(s: SparkSession, d: String): DataFrame =
    graft.IndexLake.artifact(s, d, "wd_propose_scaffold")(
      Propose.scaffoldOf(pairs(s, d), personStmtsCk(s, d),
        WikidataQueries.snakCk(s, d), retrieved = Some(Retrieved)))

  def proposeQ(s: SparkSession, d: String): DataFrame =
    Propose.enrichFrom(scaffoldCk(s, d), personStmtsCk(s, d),
      positions(s, d))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_wd_propose" -> (proposeQ _))

  private val countryVals = WikidataQueries.FixtureCountries.zipWithIndex
    .map { case ((q, c), i) => s"($i, '$q', '$c')" }.mkString(", ")

  val oracles: Map[String, String] = Map(
    "q_wd_propose" -> s"""
    WITH cty(i, cqid, iso) AS (VALUES $countryVals),
    base AS (
      SELECT c_custkey AS k, c_name AS n,
             'w:' || CAST(c_custkey AS VARCHAR) AS entity_id,
             CASE WHEN c_custkey % 10 = 9
                  THEN 'Q' || CAST(999000 + c_custkey AS VARCHAR)
                  ELSE 'Q' || CAST(100000 + c_custkey AS VARCHAR)
                  END AS qid,
             chr(9) || 'S854' || chr(9) || '"https://qs.example/' ||
               CAST(c_custkey AS VARCHAR) || '"' || chr(9) || 'S813' ||
               chr(9) || '+$Retrieved' || 'T00:00:00Z/11' AS refs
      FROM customer
    ),
    -- the "C. <name>" variant is never known; the plain name is known
    -- only when the dump item exists (its en label)
    alias1 AS (
      SELECT entity_id, qid, 11 AS ord,
             qid || chr(9) || 'Amul' || chr(9) || '"C. ' || n || '"'
               AS line
      FROM base
    ),
    alias2 AS (
      SELECT entity_id, qid, 12 AS ord,
             qid || chr(9) || 'Amul' || chr(9) || '"' || n || '"' AS line
      FROM base WHERE k % 10 = 9
    ),
    p31 AS (
      SELECT entity_id, qid, 1000 AS ord,
             qid || chr(9) || 'P31' || chr(9) || 'Q5' || refs AS line
      FROM base WHERE k % 10 = 7 OR k % 10 = 9
    ),
    p569 AS (
      SELECT entity_id, qid, 1001 AS ord,
             qid || chr(9) || 'P569' || chr(9) || '+' ||
               CAST(1900 + k % 100 AS VARCHAR) ||
               '-01-01T00:00:00Z/9' || refs AS line
      FROM base WHERE k % 10 = 9
    ),
    p21 AS (
      SELECT entity_id, qid, 1002 AS ord,
             qid || chr(9) || 'P21' || chr(9) || 'Q6581072' || refs
               AS line
      FROM base WHERE k % 10 = 9
    ),
    -- emitted citizenships: the fixture country only for absent items,
    -- 'ua' (Q212) for every third customer; 'su' is historical
    p27_rows AS (
      SELECT b.entity_id, b.qid, b.refs, c.iso AS code, c.cqid
      FROM base b JOIN cty c ON c.i = b.k % 25
      WHERE b.k % 10 = 9
      UNION ALL
      SELECT entity_id, qid, refs, 'ua', 'Q212'
      FROM base WHERE k % 3 = 0
    ),
    p27 AS (
      SELECT entity_id, qid,
             1010 + CAST(row_number() OVER
               (PARTITION BY entity_id ORDER BY code) AS INT) AS ord,
             qid || chr(9) || 'P27' || chr(9) || cqid || refs AS line
      FROM p27_rows
    ),
    p39 AS (
      SELECT entity_id, qid, 2001 AS ord,
             qid || chr(9) || 'P39' || chr(9) ||
             'Q' || CAST(200000 + (k + 3) % 20 AS VARCHAR) ||
             CASE WHEN k % 16 = 1 THEN ''
                  WHEN k % 2 = 0 THEN
                    chr(9) || 'P580' || chr(9) || '+' ||
                    CAST(2000 + k % 20 AS VARCHAR) ||
                    '-01-01T00:00:00Z/9' ||
                    CASE WHEN k % 4 = 0 THEN
                      chr(9) || 'P582' || chr(9) || '+' ||
                      CAST(2010 + k % 20 AS VARCHAR) ||
                      '-06-01T00:00:00Z/10'
                    ELSE '' END
                  ELSE '' END || refs AS line
      FROM base
    )
    SELECT * FROM alias1 UNION ALL SELECT * FROM alias2
    UNION ALL SELECT * FROM p31 UNION ALL SELECT * FROM p569
    UNION ALL SELECT * FROM p21 UNION ALL SELECT * FROM p27
    UNION ALL SELECT * FROM p39""")
}
