package graft.resolver

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.blocker.{Blocker, BlockerQueries}
import graft.store.StarStatements

/** Resolver operators wired to the blocker's candidate pairs: positive
  * edges (score ≥ 20) → connected components → canonical map →
  * statement canonicalization → transitive judgement. The DuckDB oracles
  * replay the same pipeline with a recursive CTE as the components spec.
  */
object ResolverQueries {

  val PositiveThreshold = 20.0
  val NegativeBelow = 19.0

  /** All scored candidate pairs (no top-N cut — the resolver consumes the
    * full score table, thresholds are the decision rule).
    */
  private def pairScores(s: SparkSession, d: String): DataFrame =
    BlockerQueries.pairsAll(s, d)

  private def edges(s: SparkSession, d: String): DataFrame =
    pairScores(s, d).filter(col("score") >= PositiveThreshold)
      .select(col("lid").as("src"), col("rid").as("dst"))

  /** Precedence of an id when electing a cluster canonical — the QID >
    * NK- > raw rule of the reference (`resolver/identifier.py:11-27`)
    * mapped onto the star id prefixes.
    */
  private def weightOf(id: Column): Column =
    when(id.startsWith("c:"), 3).when(id.startsWith("s:"), 2).otherwise(1)

  def components(s: SparkSession, d: String): DataFrame =
    Resolver.connectedComponents(edges(s, d))

  def canonicalMapQ(s: SparkSession, d: String): DataFrame =
    Resolver.canonicalMap(components(s, d), weightOf)

  def applyQ(s: SparkSession, d: String): DataFrame =
    Resolver.applyCanonical(StarStatements(s, d), canonicalMapQ(s, d))

  /** Transitive judgement for every candidate pair
    * (`resolver/resolver.py:256-282`): same cluster → positive; a
    * negative edge between the two clusters → negative; else
    * no_judgement. Negative edges here are the weak candidates
    * (score < 19).
    */
  def judgementQ(s: SparkSession, d: String): DataFrame = {
    // materialize the blocker score table once; both the positive-edge
    // set and the candidate batch derive from it (round 1 ran the whole
    // blocker chain twice inside this one plan)
    val scores = pairScores(s, d).localCheckpoint(true)
    val posEdges = scores.filter(col("score") >= PositiveThreshold)
      .select(col("lid").as("src"), col("rid").as("dst"))
    val cm = Resolver.canonicalMap(
      Resolver.connectedComponents(posEdges), weightOf)
    // judge the candidate batch (top-N pairs), the xref shape — not the
    // full score table
    val ps = scores
      .orderBy(col("score").desc, col("lid").asc, col("rid").asc)
      .limit(graft.blocker.BlockerQueries.cfg.maxPairs)
    val lc = cm.select(col("member").as("lid"), col("canonical").as("lcan"))
    val rc = cm.select(col("member").as("rid"), col("canonical").as("rcan"))
    val withCan = ps
      .join(broadcast(lc), Seq("lid"), "left_outer")
      .join(broadcast(rc), Seq("rid"), "left_outer")
      .select(col("lid"), col("rid"), col("score"),
        coalesce(col("lcan"), col("lid")).as("lcan"),
        coalesce(col("rcan"), col("rid")).as("rcan"))
    val negPairs = withCan.filter(col("score") < NegativeBelow)
      .select(least(col("lcan"), col("rcan")).as("na"),
        greatest(col("lcan"), col("rcan")).as("nb"))
      .distinct()
    withCan
      .join(broadcast(negPairs),
        least(col("lcan"), col("rcan")) === col("na") &&
          greatest(col("lcan"), col("rcan")) === col("nb"), "left_outer")
      .select(col("lid"), col("rid"),
        when(col("lcan") === col("rcan"), "positive")
          .when(col("na").isNotNull, "negative")
          .otherwise("no_judgement").as("judgement"))
  }

  // ---------------------------------------------------------------- oracle

  /** Blocker CTE chain + resolver CTEs, under WITH RECURSIVE. */
  private def prefix: String = {
    val blk = BlockerQueries.ctePrefix.trim.stripPrefix("WITH")
    s"""WITH RECURSIVE $blk,
    edges AS (SELECT lid AS src, rid AS dst FROM pair_scores
              WHERE score >= $PositiveThreshold),
    verts AS (SELECT src AS id FROM edges UNION SELECT dst FROM edges),
    sym AS (SELECT src, dst FROM edges
            UNION SELECT dst AS src, src AS dst FROM edges),
    reach AS (
      SELECT id, id AS lbl FROM verts
      UNION
      SELECT s.dst AS id, r.lbl FROM reach r JOIN sym s ON s.src = r.id
    ),
    cc AS (SELECT id, min(lbl) AS cluster FROM reach GROUP BY id),
    canon AS (
      SELECT cluster,
             split_part(max(
               (CASE WHEN id LIKE 'c:%' THEN '3'
                     WHEN id LIKE 's:%' THEN '2' ELSE '1' END) || '|' || id),
               '|', 2) AS canonical
      FROM cc GROUP BY cluster
    ),
    canonical_map AS (
      SELECT cc.id AS member, canon.canonical
      FROM cc JOIN canon ON cc.cluster = canon.cluster
    ),
    cand_pairs AS (
      SELECT lid, rid, score FROM pair_scores
      ORDER BY score DESC, lid, rid
      LIMIT ${graft.blocker.BlockerQueries.cfg.maxPairs}
    ),
    pair_can AS (
      SELECT p.lid, p.rid, p.score,
             coalesce(lc.canonical, p.lid) AS lcan,
             coalesce(rc.canonical, p.rid) AS rcan
      FROM cand_pairs p
      LEFT JOIN canonical_map lc ON p.lid = lc.member
      LEFT JOIN canonical_map rc ON p.rid = rc.member
    ),
    neg_pairs AS (
      SELECT DISTINCT least(lcan, rcan) AS na, greatest(lcan, rcan) AS nb
      FROM pair_can WHERE score < $NegativeBelow
    )
    """
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_res_components" -> (components _),
    "q_res_canonical_map" -> (canonicalMapQ _),
    "q_res_apply" -> (applyQ _),
    "q_res_judgement" -> (judgementQ _))

  val oracles: Map[String, String] = Map(
    "q_res_components" -> (prefix + "SELECT id, cluster FROM cc"),
    "q_res_canonical_map" -> (prefix +
      "SELECT member, canonical FROM canonical_map"),
    "q_res_apply" -> (prefix + """
      SELECT st.id, coalesce(cm.canonical, st.id) AS canonical_id,
             st.schema, st.field, st.value
      FROM stmts st LEFT JOIN canonical_map cm ON st.id = cm.member"""),
    "q_res_judgement" -> (prefix + """
      SELECT p.lid, p.rid,
             CASE WHEN p.lcan = p.rcan THEN 'positive'
                  WHEN n.na IS NOT NULL THEN 'negative'
                  ELSE 'no_judgement' END AS judgement
      FROM pair_can p
      LEFT JOIN neg_pairs n ON least(p.lcan, p.rcan) = n.na
                           AND greatest(p.lcan, p.rcan) = n.nb"""))
}
