package graft.matching

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.blocker.BlockerQueries
import graft.store.StarStatements
import graft.text.JaroWinkler

/** Pair-scoring stage: feature comparators over candidate pairs, composed
  * into algorithm scores (reference `matching/` package).
  *
  * Design follows SURVEY §2.8: per-entity analysis (fingerprint, token
  * set, number set) is computed ONCE per entity *before* the pair join —
  * the Spark replacement for the reference's per-batch `lru_cache`
  * memoization (`matching/util.py:17-19`) — then pairs join two analysis
  * rows and evaluate pure column expressions. Everything except
  * jaro-winkler stays in Catalyst built-ins (whole-stage codegen); JW is
  * one scalar UDF whose output was verified byte-identical to DuckDB's.
  *
  * Algorithm composition semantics mirror `HeuristicAlgorithm.compare`
  * (`matching/types.py:242-308`): qualifiers only apply when some main
  * feature fired; final score clamped to [0,1]. The regression scorer is
  * logistic inference with broadcast coefficients
  * (`matching/regression_v1/model.py:94-110`) — w·x+b → sigmoid, no ML
  * library needed.
  */
object MatchingQueries {

  private val jwUdf = udf((a: String, b: String) => JaroWinkler.similarity(a, b))

  /** Per-entity name analysis: one row per entity with precomputed
    * fingerprint / token set / number set columns.
    */
  def analysis(s: SparkSession, d: String): DataFrame = {
    val toks = array_distinct(filter(
      split(lower(col("name")), "[^a-z0-9]+"), t => length(t) > 0))
    StarStatements(s, d)
      .filter(col("field") === "name")
      .groupBy(col("id")).agg(min(col("value")).as("name"))
      .select(col("id"), col("name"),
        array_join(array_sort(filter(split(lower(col("name")), "[^a-z0-9]+"),
          t => length(t) > 0)), " ").as("fp"),
        toks.as("toks"),
        array_distinct(regexp_extract_all(col("name"), lit("[0-9]+"), lit(0)))
          .as("nums"))
  }

  /** Candidate pairs (blocker top-N) joined to both analysis rows, with
    * the feature vector evaluated as columns.
    */
  def features(s: SparkSession, d: String): DataFrame = {
    val an = analysis(s, d)
    val la = an.select(col("id").as("lid"), col("name").as("lname"),
      col("fp").as("lfp"), col("toks").as("ltoks"), col("nums").as("lnums"))
    val ra = an.select(col("id").as("rid"), col("name").as("rname"),
      col("fp").as("rfp"), col("toks").as("rtoks"), col("nums").as("rnums"))
    val overlap = size(array_intersect(col("ltoks"), col("rtoks")))
    BlockerQueries.pairsQ(s, d)
      .join(la, Seq("lid"))
      .join(ra, Seq("rid"))
      .select(col("lid"), col("rid"),
        when(col("lfp") === col("rfp"), 1.0).otherwise(0.0).as("literal"),
        (lit(1.0) - levenshtein(col("lfp"), col("rfp")) /
          greatest(length(col("lfp")), length(col("rfp")), lit(1)))
          .as("lev_sim"),
        (overlap.cast("double") /
          (size(col("ltoks")) + size(col("rtoks")) - overlap))
          .as("tok_jaccard"),
        jwUdf(col("lname"), col("rname")).as("jw"),
        when(size(col("lnums")) > 0 && size(col("rnums")) > 0 &&
          size(array_intersect(col("lnums"), col("rnums"))) === 0, 1.0)
          .otherwise(0.0).as("num_mismatch"),
        when(substring(col("lid"), 1, 1) =!= substring(col("rid"), 1, 1), 1.0)
          .otherwise(0.0).as("schema_mismatch"))
  }

  def featuresRounded(s: SparkSession, d: String): DataFrame =
    features(s, d).select(col("lid"), col("rid"), col("literal"),
      round(col("lev_sim"), 6).as("lev_sim"),
      round(col("tok_jaccard"), 6).as("tok_jaccard"),
      round(col("jw"), 6).as("jw"),
      col("num_mismatch"), col("schema_mismatch"))

  /** LogicV1-shape heuristic: score = max(weighted mains) + qualifiers,
    * qualifiers skipped when no main fired, clamped to [0,1]
    * (`matching/logic_v1/model.py:63-81`, `matching/types.py:242-308`).
    */
  def logicScore(s: SparkSession, d: String): DataFrame = {
    val main = greatest(col("literal") * 1.0, col("lev_sim") * 0.8,
      col("tok_jaccard") * 0.7)
    val qual = col("num_mismatch") * -0.3 + col("schema_mismatch") * -0.1
    features(s, d).select(col("lid"), col("rid"),
      round(when(main <= 0, 0.0)
        .otherwise(least(greatest(main + qual, lit(0.0)), lit(1.0))), 4)
        .as("score"))
  }

  /** Logistic-regression inference with fixed exported coefficients:
    * sigmoid(b + w·x) as a plain column expression.
    */
  val RegWeights: Seq[(String, Double)] = Seq(
    "literal" -> 4.0, "lev_sim" -> 2.5, "tok_jaccard" -> 1.5,
    "jw" -> 2.0, "num_mismatch" -> -2.5)
  val RegIntercept: Double = -3.0

  def regressionScore(s: SparkSession, d: String): DataFrame = {
    val z = RegWeights.foldLeft(lit(RegIntercept)) {
      case (acc, (f, w)) => acc + col(f) * w
    }
    features(s, d).select(col("lid"), col("rid"),
      round(lit(1.0) / (lit(1.0) + exp(-z)), 6).as("prob"))
  }

  // ---------------------------------------------------------------- oracle

  private val featSql: String = s"""
    names AS (
      SELECT id, min(value) AS name FROM stmts
      WHERE field = 'name' GROUP BY id
    ),
    analysis AS (
      SELECT id, name,
        array_to_string(list_sort(list_filter(
          string_split_regex(lower(name), '[^a-z0-9]+'),
          t -> length(t) > 0)), ' ') AS fp,
        list_distinct(list_filter(
          string_split_regex(lower(name), '[^a-z0-9]+'),
          t -> length(t) > 0)) AS toks,
        list_distinct(regexp_extract_all(name, '[0-9]+')) AS nums
      FROM names
    ),
    cand AS (
      SELECT lid, rid FROM pair_scores
      ORDER BY score DESC, lid, rid LIMIT ${BlockerQueries.cfg.maxPairs}
    ),
    feat AS (
      SELECT c.lid, c.rid,
        CASE WHEN la.fp = ra.fp THEN 1.0 ELSE 0.0 END AS literal,
        1.0 - CAST(levenshtein(la.fp, ra.fp) AS DOUBLE)
              / greatest(length(la.fp), length(ra.fp), 1) AS lev_sim,
        CAST(len(list_intersect(la.toks, ra.toks)) AS DOUBLE)
          / (len(la.toks) + len(ra.toks)
             - len(list_intersect(la.toks, ra.toks))) AS tok_jaccard,
        jaro_winkler_similarity(la.name, ra.name) AS jw,
        CASE WHEN len(la.nums) > 0 AND len(ra.nums) > 0
              AND len(list_intersect(la.nums, ra.nums)) = 0
             THEN 1.0 ELSE 0.0 END AS num_mismatch,
        CASE WHEN substr(c.lid, 1, 1) <> substr(c.rid, 1, 1)
             THEN 1.0 ELSE 0.0 END AS schema_mismatch
      FROM cand c
      JOIN analysis la ON c.lid = la.id
      JOIN analysis ra ON c.rid = ra.id
    )
    """

  private def prefix: String = BlockerQueries.ctePrefix + ", " + featSql

  private val regZ: String = RegWeights
    .map { case (f, w) => s"$f * ($w)" }
    .mkString(s"($RegIntercept) + ", " + ", "")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_match_features" -> (featuresRounded _),
    "q_match_logic" -> (logicScore _),
    "q_match_regression" -> (regressionScore _))

  val oracles: Map[String, String] = Map(
    "q_match_features" -> (prefix + """
      SELECT lid, rid, literal, round(lev_sim, 6) AS lev_sim,
             round(tok_jaccard, 6) AS tok_jaccard, round(jw, 6) AS jw,
             num_mismatch, schema_mismatch
      FROM feat"""),
    "q_match_logic" -> (prefix + """
      SELECT lid, rid,
        round(CASE WHEN main <= 0 THEN 0.0
                   ELSE least(greatest(main + qual, 0.0), 1.0) END, 4) AS score
      FROM (
        SELECT lid, rid,
               greatest(literal * 1.0, lev_sim * 0.8, tok_jaccard * 0.7) AS main,
               num_mismatch * -0.3 + schema_mismatch * -0.1 AS qual
        FROM feat)"""),
    "q_match_regression" -> (prefix + s"""
      SELECT lid, rid, round(1.0 / (1.0 + exp(-($regZ))), 6) AS prob
      FROM feat"""))
}
