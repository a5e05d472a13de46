package graft.enrich

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._



/** Driver-facing wikipedia-summary query: the [[ProposeQueries]]
  * persons/pairs fixture against the synthetic dump's sitelinks
  * (enwiki for k%3==0, dewiki+frwiki for k%5==2 otherwise) and a
  * mirrored summaries table carrying the `""` no-summary sentinel
  * (k%9==0 English, k%7==0 German) and an unfetched French page
  * (k%11==0). Every tenth pair targets an absent QID and must yield
  * nothing. The oracle reconstructs the joined rows arithmetically.
  */
object WikipediaQueries {

  private def k = col("c_custkey").cast("long")

  /** The mirrored `page/summary` responses for the dump's sitelinks. */
  def summariesTbl(s: SparkSession, d: String): DataFrame = {
    val c = graft.Tables.customer(s, d)
    val en = c.filter(k % 3 === 0).select(
      lit("enwiki").as("site"),
      concat(lit("C"), k.cast("string")).as("title"),
      when(k % 9 === 0, "")
        .otherwise(concat(lit("Customer "), k.cast("string"), lit(".")))
        .as("extract"))
    val de = c.filter(k % 5 === 2).select(
      lit("dewiki").as("site"),
      concat(lit("D"), k.cast("string")).as("title"),
      when(k % 7 === 0, "")
        .otherwise(concat(lit("Kunde "), k.cast("string"), lit(".")))
        .as("extract"))
    val fr = c.filter(k % 5 === 2 && k % 11 =!= 0).select(
      lit("frwiki").as("site"),
      concat(lit("F"), k.cast("string")).as("title"),
      concat(lit("Client "), k.cast("string"), lit(".")).as("extract"))
    en.unionByName(de).unionByName(fr)
  }

  def summariesQ(s: SparkSession, d: String): DataFrame = {
    // the same statement table propose reads — serve it from the lake
    // artifact instead of re-deriving the entity explode per query
    val persons = ProposeQueries.personStmtsCk(s, d)
    Wikipedia.summaries(
      ProposeQueries.pairs(s, d), WikidataQueries.snakCk(s, d),
      Wikipedia.preferredLangs(persons), summariesTbl(s, d))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_wd_summaries" -> (summariesQ _))

  val oracles: Map[String, String] = Map(
    "q_wd_summaries" -> """
    WITH base AS (
      SELECT c_custkey AS k,
             'w:' || CAST(c_custkey AS VARCHAR) AS entity_id,
             'Q' || CAST(100000 + c_custkey AS VARCHAR) AS qid
      FROM customer WHERE c_custkey % 10 <> 9
    )
    SELECT entity_id, qid, 'eng' AS lang,
           'Customer ' || CAST(k AS VARCHAR) || '.' AS summary
    FROM base WHERE k % 3 = 0 AND k % 9 <> 0
    UNION ALL
    SELECT entity_id, qid, 'deu',
           'Kunde ' || CAST(k AS VARCHAR) || '.'
    FROM base WHERE k % 3 <> 0 AND k % 5 = 2 AND k % 7 <> 0
    UNION ALL
    SELECT entity_id, qid, 'fra',
           'Client ' || CAST(k AS VARCHAR) || '.'
    FROM base WHERE k % 3 <> 0 AND k % 5 = 2 AND k % 11 <> 0""")
}
