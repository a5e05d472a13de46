package graft.textanalysis

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** The distributed kernel of BPE tokenizer training: adjacent-symbol
  * pair counting over the corpus vocabulary (Sennrich et al. 2016,
  * "Neural Machine Translation of Rare Words with Subword Units" —
  * public algorithm). Training proper is inherently sequential (each
  * merge changes the next round's counts), so like the k-means trainer
  * ([[graft.similarity.KMeans]]) the engine ships the per-iteration
  * kernel and the driver loops: count pairs → pick the top merge →
  * re-segment → repeat.
  *
  * Scale shape (100 TB): the only corpus-sized work is the word-count
  * aggregate — one shuffle with full map-side combine, and the result
  * is the VOCABULARY (distinct words × frequency), orders of magnitude
  * smaller than the corpus. Pair explosion and the pair aggregate run
  * over the vocabulary, so every BPE iteration after the first scan is
  * corpus-free: re-segmenting cached word counts, never re-reading
  * 100 TB.
  */
object Bpe {

  val TopMerges = 20

  /** Corpus vocabulary: distinct word × occurrence count, shared
    * byte-stable tokenization ([[TextAnalysis.words]]).
    */
  def vocabulary(docs: DataFrame): DataFrame =
    docs.select(explode(TextAnalysis.words(col("text"))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))

  /** Adjacent character-pair counts weighted by word frequency — the
    * first-iteration merge candidates ("aaa" counts (a,a) twice, like
    * the reference algorithm's per-occurrence scan). Words shorter
    * than 2 symbols emit nothing.
    */
  def pairCounts(vocab: DataFrame): DataFrame =
    vocab.filter(length(col("w")) >= 2)
      .select(col("freq"),
        explode(transform(sequence(lit(1), length(col("w")) - 1),
          i => struct(col("w").substr(i, lit(1)).as("a"),
            col("w").substr(i + 1, lit(1)).as("b")))).as("p"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(sum(col("freq")).as("cnt"))

  /** Top merge candidates, fully tiebroken (count desc, pair asc) so
    * the chosen merges are deterministic across engines and runs —
    * a tokenizer trained twice must be the same tokenizer.
    */
  def bpeQ(s: SparkSession, d: String): DataFrame =
    pairCounts(vocabulary(Tables.documents(s, d)))
      .orderBy(col("cnt").desc, col("a").asc, col("b").asc)
      .limit(TopMerges)

  // ---------------------------------------------------------------- oracle

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_text_bpe" -> (bpeQ _))

  val oracles: Map[String, String] = Map(
    "q_text_bpe" -> s"""
      WITH words AS (
        SELECT unnest(${TextAnalysis.wSql}) AS w FROM documents),
      vocab AS (SELECT w, count(*) AS freq FROM words GROUP BY w),
      pairs AS (
        SELECT substring(w, CAST(i AS INT), 1) AS a,
               substring(w, CAST(i + 1 AS INT), 1) AS b, freq
        FROM (SELECT * FROM vocab WHERE length(w) >= 2),
             unnest(range(1, length(w))) t(i))
      SELECT a, b, CAST(sum(freq) AS BIGINT) AS cnt
      FROM pairs GROUP BY a, b
      ORDER BY cnt DESC, a ASC, b ASC LIMIT $TopMerges""")
}
