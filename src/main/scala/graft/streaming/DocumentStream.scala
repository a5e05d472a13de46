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
}
