package graft.similarity

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Similarity / embedding-dedup queries with DuckDB oracles. The oracle
  * computes the dot product with the same left-to-right fold
  * (`list_sum(list_transform(list_zip(...)))`) and results are rounded to
  * 5 decimals, so hash-compare is stable.
  */
object SimilarityQueries {

  val TopK = 10
  val QueryMod = 50
  val NearThreshold = 0.4
  val NumPlanes = 8

  private def isQuery = col("vec_id") % QueryMod === 0

  def cosineTopK(s: SparkSession, d: String): DataFrame = {
    val p = Similarity.prepared(s, d)
    Similarity.bruteTopK(p, p.filter(isQuery), TopK)
  }

  /** Embedding near-duplicate pairs (cosine ≥ threshold, a < b). */
  def embedNearPairs(s: SparkSession, d: String): DataFrame = {
    val p = Similarity.prepared(s, d)
    val a = p.select(col("vec_id").as("a"), col("v").as("va"),
      col("nrm").as("na"))
    val b = p.select(col("vec_id").as("b"), col("v").as("vb"),
      col("nrm").as("nb"))
    a.join(broadcast(b), col("a") < col("b"))
      .select(col("a"), col("b"),
        round(Similarity.dot(col("va"), col("vb")) / (col("na") * col("nb")),
          5).as("cosine"))
      .filter(col("cosine") >= NearThreshold)
  }

  /** LSH-bucketed ANN: join query and corpus on hyperplane bucket, then
    * rank within bucket — the scale path (no all-pairs scan).
    */
  def annLsh(s: SparkSession, d: String): DataFrame = {
    val planes = Similarity.hyperplanes(NumPlanes, 64)
    val p = Similarity.prepared(s, d)
      .withColumn("bucket", Similarity.bucketOf(col("v"), planes))
    val q = broadcast(p.filter(isQuery).select(col("vec_id").as("qid"),
      col("v").as("qv"), col("nrm").as("qnrm"), col("bucket")))
    val scored = p.join(q, Seq("bucket")).filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
        round(Similarity.dot(col("qv"), col("v")) / (col("qnrm") * col("nrm")),
          5).as("cosine"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cosine").desc, col("vec_id").asc)
    scored.withColumn("rn", row_number().over(w)).filter(col("rn") <= TopK)
  }

  // ---------------------------------------------------------------- oracle

  private val planesSql: String = {
    val planes = Similarity.hyperplanes(NumPlanes, 64)
    // literal list-of-lists, exactly the Scala-computed values
    planes.map(_.mkString("[", ",", "]")).mkString("[", ",\n      ", "]")
  }

  val ctePrefix: String = s"""
    WITH prep AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    ),
    normed AS (
      SELECT vec_id, v,
             sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm
      FROM prep
    ),
    planes AS (SELECT $planesSql AS m),
    bucketed AS (
      SELECT vec_id, v, nrm,
             (SELECT sum(CASE WHEN list_sum(list_transform(
                         list_zip(n.v, m[j+1]), s -> s[1] * s[2])) > 0
                    THEN CAST(1 AS BIGINT) << j ELSE 0 END)
              FROM planes, unnest(range($NumPlanes)) t(j)) AS bucket
      FROM normed n
    )
    """

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_sim_cosine_topk" -> (cosineTopK _),
    "q_sim_embed_near" -> (embedNearPairs _),
    "q_sim_ann_lsh" -> (annLsh _))

  val oracles: Map[String, String] = Map(
    "q_sim_cosine_topk" -> (ctePrefix + s"""
      SELECT qid, vec_id, cosine, rn FROM (
        SELECT q.vec_id AS qid, c.vec_id,
               round(list_sum(list_transform(list_zip(q.v, c.v),
                 s -> s[1] * s[2])) / (q.nrm * c.nrm), 5) AS cosine,
               row_number() OVER w AS rn
        FROM normed q JOIN normed c ON c.vec_id <> q.vec_id
        WHERE q.vec_id % $QueryMod = 0
        WINDOW w AS (PARTITION BY q.vec_id
                     ORDER BY round(list_sum(list_transform(list_zip(q.v, c.v),
                       s -> s[1] * s[2])) / (q.nrm * c.nrm), 5) DESC,
                       c.vec_id ASC)
      ) WHERE rn <= $TopK"""),
    "q_sim_embed_near" -> (ctePrefix + s"""
      SELECT a, b, cosine FROM (
        SELECT x.vec_id AS a, y.vec_id AS b,
               round(list_sum(list_transform(list_zip(x.v, y.v),
                 s -> s[1] * s[2])) / (x.nrm * y.nrm), 5) AS cosine
        FROM normed x JOIN normed y ON x.vec_id < y.vec_id)
      WHERE cosine >= $NearThreshold"""),
    "q_sim_ann_lsh" -> (ctePrefix + s"""
      SELECT qid, vec_id, cosine, rn FROM (
        SELECT q.vec_id AS qid, c.vec_id,
               round(list_sum(list_transform(list_zip(q.v, c.v),
                 s -> s[1] * s[2])) / (q.nrm * c.nrm), 5) AS cosine,
               row_number() OVER w AS rn
        FROM bucketed q JOIN bucketed c
          ON q.bucket = c.bucket AND c.vec_id <> q.vec_id
        WHERE q.vec_id % $QueryMod = 0
        WINDOW w AS (PARTITION BY q.vec_id
                     ORDER BY round(list_sum(list_transform(list_zip(q.v, c.v),
                       s -> s[1] * s[2])) / (q.nrm * c.nrm), 5) DESC,
                       c.vec_id ASC)
      ) WHERE rn <= $TopK"""))
}
