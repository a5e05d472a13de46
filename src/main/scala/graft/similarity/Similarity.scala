package graft.similarity

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.Tables

/** Similarity search over an embedding column (`Array[Float]`).
  *
  * Baseline: brute-force cosine top-k — the query side is broadcast so
  * the corpus never shuffles; the dot product runs as codegen'd
  * higher-order functions (`zip_with` + `aggregate`), no UDF.
  *
  * Scale path: random-hyperplane LSH — each vector gets a small bucket
  * id from the signs of h deterministic hyperplane projections; search
  * only joins query and corpus rows in the same bucket, turning the
  * all-pairs scan into an equi-join Catalyst can shuffle-partition by
  * bucket. Hyperplanes are md5-derived so the DuckDB oracle reproduces
  * them bit-for-bit.
  */
object Similarity {

  /** Cast a float-array column to double (parity with the oracle math). */
  def toDouble(v: Column): Column = transform(v, x => x.cast("double"))

  /** Native codegen dot product ([[graft.functions.DotProduct]]) — the
    * HOF composition `aggregate(zip_with(a, b, _*_), 0.0, _+_)` is
    * interpreted per element; the expression generates one fused loop
    * with identical semantics (sequential left-to-right double sum).
    */
  def dot(a: Column, b: Column): Column =
    graft.functions.VectorExpressions.dot(a, b)

  def norm(v: Column): Column = sqrt(dot(v, v))

  /** Deterministic hyperplane matrix: h rows of d components in
    * [-1, 1], derived from md5 so both engines agree. Component (j, i) =
    * ((hash60("j_i") mod 2001) − 1000) / 1000.
    */
  def hyperplanes(h: Int, d: Int): Array[Array[Double]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(h, d) { (j, i) =>
      val hex = md.digest(s"${j}_$i".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 15)
      val v = java.lang.Long.parseLong(hex, 16)
      ((v % 2001) - 1000) / 1000.0
    }
  }

  /** LSH bucket id of a vector: bit j set iff dot(v, plane_j) > 0. */
  def bucketOf(v: Column, planes: Array[Array[Double]]): Column =
    (0 until planes.length).map { j =>
      val plane = array(planes(j).map(lit): _*)
      when(dot(v, plane) > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Corpus with normalized vector + norm (computed once). */
  def prepared(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d).select(col("vec_id"),
      toDouble(col("embedding")).as("v"))
      .withColumn("nrm", norm(col("v")))

  /** Brute-force cosine top-k: broadcast queries × corpus, windowed rank. */
  /** Per-query rank window with NO explicit repartition: a bare
    * `row_number ≤ k` filter over the window lets physical planning
    * insert WindowGroupLimit in PARTIAL mode below the qid exchange —
    * each map task locally prunes to its own per-qid top-k, so the
    * shuffle carries ≤ tasks × queries × k rows instead of every
    * scored candidate (measured: the hybrid dense arm shuffled 3.06M
    * scored rows at sf0.1 with the r13 explicit repartition, which
    * planning treats as the window's exchange and therefore only
    * emits the FINAL-mode limit above it — the repartition "fix" for
    * AQE's tiny-exchange coalescing was defeating map-side pruning,
    * trading a ~100× bigger shuffle for post-shuffle parallelism the
    * pruned exchange no longer needs).
    */
  def topkPerQid(scored: DataFrame, k: Int, order: Column*): DataFrame = {
    val w = Window.partitionBy(col("qid")).orderBy(order: _*)
    scored
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
  }

  def bruteTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val q = broadcast(queries.select(col("vec_id").as("qid"),
      col("v").as("qv"), col("nrm").as("qnrm")))
    val scored = corpus.join(q, col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
        round(dot(col("qv"), col("v")) / (col("qnrm") * col("nrm")), 5)
          .as("cosine"))
    topkPerQid(scored, k, col("cosine").desc, col("vec_id").asc)
  }
}
