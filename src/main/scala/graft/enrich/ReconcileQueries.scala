package graft.enrich

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.store.EntityStore

/** Driver-facing reconcile queries over the synthetic wikidata dump of
  * [[WikidataQueries]]:
  *
  *  - `q_wd_positions`: the Person → Occupancy → post → Position store
  *    walk, with startDate/periodStart (endDate/periodEnd) fallbacks, a
  *    QID-less position that must be skipped, and a re-election
  *    duplicate occupancy.
  *  - `q_wd_reconcile`: the decision split — customers become persons
  *    whose names search the dump's label/alias table (human items
  *    only); every fifth is pre-linked (enrich), perturbed names miss
  *    their label (alias tier or nothing), non-human items yield no
  *    candidate, and negative-decided pairs are suppressed by
  *    check_candidate. The oracle reconstructs every decision
  *    arithmetically from `customer`.
  */
object ReconcileQueries {

  private def k = col("c_custkey").cast("long")

  // ------------------------------------------------- positions fixture

  /** Occupancy entities: customer k holds post pos:(k%20); even k carry
    * startDate, k%3==0 odd k fall back to periodStart; k%4==0 carry
    * endDate, k%4==2 fall back to periodEnd; k%16==1 add a dateless
    * re-election occupancy.
    */
  def occupancyEntities(s: SparkSession, d: String): DataFrame = {
    val base = graft.Tables.customer(s, d).select(
      concat(lit("o:"), k.cast("string")).as("id"),
      lit("Occupancy").as("schema"),
      map(
        lit("holder"), array(concat(lit("w:"), k.cast("string"))),
        lit("post"),
        array(concat(lit("pos:"), (k % 20).cast("string"))),
        lit("startDate"),
        when(k % 2 === 0, array((lit(2000) + k % 20).cast("string"))),
        lit("periodStart"),
        when(k % 2 === 1 && k % 3 === 0, array(lit("1998"))),
        lit("endDate"), when(k % 4 === 0, array(lit("2010-06"))),
        lit("periodEnd"), when(k % 4 === 2, array(lit("2011")))
      ).as("properties"))
    val dup = graft.Tables.customer(s, d).filter(k % 16 === 1).select(
      concat(lit("o2:"), k.cast("string")).as("id"),
      lit("Occupancy").as("schema"),
      map(
        lit("holder"), array(concat(lit("w:"), k.cast("string"))),
        lit("post"),
        array(concat(lit("pos:"), (k % 20).cast("string")))
      ).as("properties"))
    base.unionByName(dup)
  }

  /** Position entities pos:0..pos:19 — every fourth lacks a wikidataId
    * and must drop out of the claim walk.
    */
  def positionEntities(s: SparkSession): DataFrame = {
    import s.implicits._
    (0 until 20).map { i =>
      (s"pos:$i", "Position", i)
    }.toDF("id", "schema", "i")
      .select(col("id"), col("schema"),
        map(
          lit("name"), array(concat(lit("position "), col("i"))),
          lit("wikidataId"),
          when(col("i") % 4 =!= 3,
            array(concat(lit("Q"), (col("i") + 200000).cast("string"))))
        ).as("properties"))
  }

  def positionsQ(s: SparkSession, d: String): DataFrame =
    Reconcile.positionClaims(EntityStore.statements(
      occupancyEntities(s, d).unionByName(positionEntities(s)), "rec"))

  // ------------------------------------------------- reconcile fixture

  /** Persons searching the dump: every k%10==4 name is perturbed away
    * from its label; k%4==0 carry the "C k" alias the dump also lists.
    */
  def reconPersons(s: SparkSession, d: String): DataFrame =
    graft.Tables.customer(s, d).select(
      concat(lit("w:"), k.cast("string")).as("id"),
      lit("Person").as("schema"),
      map(
        lit("name"),
        array(when(k % 10 === 4, concat(lit("X "), col("c_name")))
          .otherwise(col("c_name"))),
        lit("alias"),
        when(k % 4 === 0, array(concat(lit("C "), k.cast("string"))))
      ).as("properties"))

  def reconcileQ(s: SparkSession, d: String): DataFrame = {
    val stmts = EntityStore.statements(reconPersons(s, d), "rec")
    val persons = stmts.select(col("entity_id")).distinct()
    val qid = concat(lit("Q"), (lit(100000) + k).cast("string"))
    val eid = concat(lit("w:"), k.cast("string"))
    val linked = graft.Tables.customer(s, d).filter(k % 5 === 0)
      .select(eid.as("entity_id"), qid.as("qid"))
    val decided = graft.Tables.customer(s, d).filter(k % 7 === 3)
      .select(eid.as("entity_id"), qid.as("qid"))
    val candidates =
      Reconcile.searchCandidates(stmts, WikidataQueries.snakCk(s, d))
    Reconcile.decide(persons, candidates, linked, decided)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_wd_positions" -> (positionsQ _),
    "q_wd_reconcile" -> (reconcileQ _))

  val oracles: Map[String, String] = Map(
    "q_wd_positions" -> """
    WITH base AS (
      SELECT c_custkey AS k, c_custkey % 20 AS p FROM customer
      WHERE (c_custkey % 20) % 4 <> 3
    ),
    claims AS (
      SELECT 'w:' || CAST(k AS VARCHAR) AS entity_id,
             'Q' || CAST(200000 + p AS VARCHAR) AS pos_qid,
             CASE WHEN k % 2 = 0 THEN CAST(2000 + p AS VARCHAR)
                  WHEN k % 3 = 0 THEN '1998' END AS "start",
             CASE WHEN k % 4 = 0 THEN '2010-06'
                  WHEN k % 4 = 2 THEN '2011' END AS "end"
      FROM base
      UNION ALL
      SELECT 'w:' || CAST(k AS VARCHAR),
             'Q' || CAST(200000 + p AS VARCHAR),
             CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR)
      FROM base WHERE k % 16 = 1
    )
    SELECT entity_id, pos_qid, "start", "end" FROM claims""",

    "q_wd_reconcile" -> """
    WITH base AS (
      SELECT c_custkey AS k,
             'w:' || CAST(c_custkey AS VARCHAR) AS entity_id,
             'Q' || CAST(100000 + c_custkey AS VARCHAR) AS own_qid
      FROM customer
    ),
    -- the best candidate the name search yields: the label at 1.0
    -- unless the name is perturbed (k%10=4) or the item non-human
    -- (k%10=7); the "C k" alias at 0.8 rescues perturbed persons that
    -- carry it (k%4=0, i.e. k%20=4); check_candidate then suppresses
    -- negative-decided pairs (k%7=3)
    scored AS (
      SELECT *,
        CASE WHEN k % 7 = 3 THEN NULL
             WHEN k % 10 = 7 THEN NULL
             WHEN k % 10 = 4 THEN (CASE WHEN k % 20 = 4 THEN 0.8 END)
             ELSE 1.0 END AS best
      FROM base
    )
    SELECT entity_id, 'enrich' AS decision, own_qid AS qid,
           CAST(NULL AS DOUBLE) AS score
    FROM scored WHERE k % 5 = 0
    UNION ALL
    SELECT entity_id, 'merge', own_qid, CAST(best AS DOUBLE)
    FROM scored WHERE k % 5 <> 0 AND best > 0.9
    UNION ALL
    SELECT entity_id, 'create',
           CASE WHEN best IS NOT NULL THEN own_qid END,
           CAST(best AS DOUBLE)
    FROM scored WHERE k % 5 <> 0 AND (best IS NULL OR best <= 0.9)""")
}
