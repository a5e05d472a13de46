package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.textanalysis.TextAnalysis

/** Continuous training-data ingest: the document-side streaming twins.
  * A 100 TB corpus is not rebuilt nightly — new documents arrive as a
  * stream, and the first two pipeline stages (quality gate, exact
  * dedupe) run incrementally so only survivors reach the lake.
  *
  * Both operators are Structured-Streaming-native: the quality gate is
  * stateless (map-only, the same expression as the batch
  * q_text_quality), and the dedupe is `dropDuplicatesWithinWatermark`
  * — state keyed by content hash and aged out with the watermark, so
  * the state store is bounded by the dedupe horizon rather than
  * growing with the corpus.
  */
object DocumentStream {

  /** Stateless quality gate on a document stream (needs a `text`
    * column): keep documents whose quality score clears the floor.
    * One projection, no state, no shuffle.
    */
  def qualityGate(docs: DataFrame, minScore: Double = 0.5): DataFrame =
    docs
      .withColumn("quality",
        TextAnalysis.qualityExpr(TextAnalysis.words(col("text"))))
      .filter(col("quality") >= minScore)

  /** Streaming exact dedupe by content fingerprint: one copy of each
    * hash within the watermark horizon passes (which copy is
    * unspecified inside a micro-batch; across batches the earlier
    * one wins), later copies drop even when their event times
    * differ. State is
    * (hash → expiry) aged by the watermark — at scale the horizon
    * (default 24h) bounds the store regardless of corpus size;
    * duplicates further apart than the horizon are the batch dedupe's
    * job on the lake. Needs a `ts` timestamp column.
    */
  def dedupeStream(docs: DataFrame, horizon: String = "24 hours")
      : DataFrame =
    docs
      .withColumn("content_hash", md5(col("text")))
      .withWatermark("ts", horizon)
      .dropDuplicatesWithinWatermark("content_hash")

  /** Stateless LM perplexity gate on a document stream: score each
    * arriving document against a STATIC, broadcast
    * [[graft.textanalysis.LangModel.LmModel]] (trained once on the
    * lake's reference slice, shipped to executors in the closure — the
    * CCNet serving shape) and keep documents whose mean token
    * log-probability clears the floor. Map-only like [[qualityGate]]:
    * no state, no shuffle, and the same fixed-point arithmetic as the
    * batch scorer, so re-scoring a gated stream in batch reproduces
    * the decisions exactly (asserted in DocumentStreamSpec).
    */
  def lmGate(docs: DataFrame, model: graft.textanalysis.LangModel.LmModel,
      minLogp: Double): DataFrame = {
    val score = udf((ws: Seq[String]) =>
      model.avgLogp(ws).map(Double.box).orNull)
    docs
      .withColumn("avg_logp", score(TextAnalysis.words(col("text"))))
      .filter(col("avg_logp") >= minLogp)
  }

  /** Streaming HLL register maintenance over a document stream (needs
    * `source`, `doc_id`, `text`): the same relational register algebra
    * as the batch sketch ([[graft.textanalysis.Sketches]]), run as a
    * streaming aggregation. A streaming `count(distinct term)` keeps
    * every distinct value in the state store — unbounded on a corpus
    * feed; the register table is ≤ 2^12 rows per source forever, and
    * any snapshot of it merges (register-wise max) and estimates with
    * the batch algebra (`Sketches.estimateOf`), so a continuously-run
    * dashboard reads cardinalities off the state snapshot without
    * touching the corpus.
    */
  def hllRegisters(docs: DataFrame): DataFrame = {
    import graft.textanalysis.Sketches
    Sketches.registersOf(Sketches.postingsOf(docs))
  }
}
