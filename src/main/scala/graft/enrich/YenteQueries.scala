package graft.enrich

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.blocker.BlockerQueries

/** Driver-facing yente query: the service plumbing of
  * [[YenteEnricher]] — an absolute score `cutoff` pruning the match
  * response and the `sourceUrl` entity-endpoint decoration — gated
  * over the shared match-topk candidate shape (parts query side, full
  * score variance). The algorithm scoring inside
  * [[YenteEnricher.matchEntities]] is separately gated by the
  * q_match_* family; namespace stripping and matchable-prop filtering
  * are spec-covered (they need FtM-schema fixtures, not star tables).
  */
object YenteQueries {

  private val Api = "http://yente.local/"
  private val Cutoff = 8.7

  def yenteQ(s: SparkSession, d: String): DataFrame =
    BlockerQueries.matchTopKQ(s, d)
      .filter(col("score") >= Cutoff)
      .select(col("qid"), col("cid"), col("score"),
        concat(lit(Api), lit("entities/"), col("cid")).as("source_url"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_enrich_yente" -> (yenteQ _))

  val oracles: Map[String, String] = Map(
    "q_enrich_yente" -> (BlockerQueries.ctePrefix +
      s"""SELECT qid, cid, score,
            'http://yente.local/entities/' || cid AS source_url
          FROM match_ranked
          WHERE rn <= ${BlockerQueries.cfg.maxCandidates}
            AND score >= best * ${BlockerQueries.cfg.minScoreRatio}
            AND score >= $Cutoff"""))
}
