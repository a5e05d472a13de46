package graft.cli

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.dedup.DedupQueries
import graft.textanalysis.{Curation, LangModel, TextAnalysis}

/** `curate` — the end-to-end training-corpus curation pipeline as one
  * spark-submit main, composing the library's LLM-data operators the
  * way `DedupeMain` composes the entity operators:
  *
  *   1. exact dedup        (md5(text) groups, min-doc_id survivor)
  *   2. quality gate       (composite heuristic, `--min-quality`)
  *   3. LM perplexity gate (stupid-backoff bigram LM, `--min-logp`)
  *   4. near-dup removal   (MinHash-LSH pairs → components → survivor)
  *   5. shard assignment   (content-keyed hash shard, no global sort)
  *   6. sequence packing   (per-shard 256-token context windows — the
  *                          training-ready layout, Curation.packOf)
  *
  * Order matters and mirrors production pipelines: exact dedup first
  * (cheapest, biggest shrink on crawled data), heuristic gates before
  * the quadratic-ish near-dup stage so LSH sees only plausible
  * documents, sharding last so shard sizes reflect the final corpus.
  *
  * Outputs under `outDir`: `corpus/` — the kept documents with
  * `quality`, `avg_logp`, `shard` columns, partitioned by shard — and
  * `report.json`, one JSON object of per-stage document counts.
  * Every stage is deterministic (content-keyed decisions, tiebroken
  * survivors), so re-running the pipeline reproduces the corpus and
  * the report byte-for-byte.
  *
  * {{{
  *   spark-submit --class graft.cli.CurateMain graft.jar \
  *     documents.parquet /out/curated --min-quality 0.3 --min-logp -12
  * }}}
  */
object CurateMain {

  final case class Report(input: Long, afterExact: Long,
      unscoreable: Long, afterQuality: Long,
      afterLm: Long, afterNearDup: Long, shards: Int,
      packWindows: Long) {
    def json: String =
      s"""{"input": $input, "after_exact_dedup": $afterExact,
         | "unscoreable_no_tokens": $unscoreable,
         | "after_quality": $afterQuality, "after_lm": $afterLm,
         | "after_near_dup": $afterNearDup, "shards": $shards,
         | "pack_windows": $packWindows}"""
        .stripMargin.replace("\n", "")
  }

  /** The pipeline on a documents frame; returns (curated, report). */
  def run(spark: SparkSession, docs0: DataFrame, minQuality: Double,
      minLogp: Double): (DataFrame, Report) = {
    val docs = docs0.select(col("doc_id"), col("text"), col("lang"),
      col("source")).localCheckpoint(true)
    val input = docs.count()

    // 1. exact dedup — deterministic survivor: min doc_id per content
    //    hash (dropDuplicates keeps an arbitrary partition's winner)
    val hashed = docs.withColumn("h", md5(col("text")))
    val winners = hashed.groupBy(col("h")).agg(min(col("doc_id")).as("doc_id"))
    val exact = hashed.join(winners, Seq("h", "doc_id"), "left_semi")
      .drop("h").localCheckpoint(true)
    val nExact = exact.count()

    // 2. heuristic quality gate. Token-less documents score NULL and
    //    are dropped here regardless of --min-quality — reported
    //    separately (`unscoreable_no_tokens`) so "failed the gate"
    //    and "had nothing to score" stay distinguishable downstream.
    val withQ = TextAnalysis.withWords(exact)
      .select(col("doc_id"), TextAnalysis.qualityExpr(col("w")).as("quality"))
      .localCheckpoint(true)
    val nUnscoreable = withQ.filter(col("quality").isNull).count()
    val qual = exact.join(withQ.filter(col("quality") >= minQuality),
      Seq("doc_id")).localCheckpoint(true)
    val nQual = qual.count()

    // 3. LM gate — the bigram LM trains on the gated corpus's own
    //    held-out hash split (CCNet trains on a reference corpus; pass
    //    one via a second input path if you have one). lmScoreOf's
    //    inner join only emits docs with words — vacuous here, since
    //    the quality gate already dropped every token-less doc (same
    //    tokenizer), so this stage drops on --min-logp alone.
    val lm = LangModel.lmScoreOf(qual)
      .select(col("doc_id"), col("avg_logp"))
    val lmKept = qual.join(lm.filter(col("avg_logp") >= minLogp),
      Seq("doc_id")).localCheckpoint(true)
    val nLm = lmKept.count()

    // 4. near-dup removal — LSH pairs → connected components →
    //    longest-text/min-id survivor election. The cluster table only
    //    contains docs that appear in a near-dup pair, so unpaired docs
    //    pass through the anti-join untouched.
    val drop = DedupQueries.clustersOf(lmKept)
      .filter(!col("keep"))
      .select(col("doc_id").cast("long").as("doc_id"))
      .localCheckpoint(true)
    val nearKept = lmKept.join(drop, Seq("doc_id"), "left_anti")
      .localCheckpoint(true)
    val nNear = nearKept.count()

    // 5+6. shard assignment + sequence packing — Curation.packOf keys
    //    its shards on the SAME epoch-0 content hash, so its shard
    //    column IS stage 5's assignment, and the pack columns lay the
    //    kept corpus out as per-shard 256-token context windows (the
    //    training-ready layout). Quality-gated docs always have words,
    //    so the inner join drops nothing.
    val packed = Curation.packOf(nearKept)
    val curated = nearKept.join(packed, Seq("doc_id"))
    val nWindows = packed
      .select((expr(s"(start_tok + n_tokens + ${Curation.PackContext - 1}) " +
        s"div ${Curation.PackContext}")).as("w"), col("shard"))
      .groupBy(col("shard")).agg(max(col("w")).as("w"))
      .agg(sum(col("w"))).head.getLong(0)
    (curated, Report(input, nExact, nUnscoreable, nQual, nLm, nNear,
      Curation.ShuffleShards, nWindows))
  }

  def main(args: Array[String]): Unit = {
    val (pos, flags) = CliArgs.parse(args)
    require(pos.length == 2, "usage: curate <documents.parquet> <outDir>")
    val spark = CliArgs.session("curate")
    val minQuality = flags.getOrElse("min-quality", "0.3").toDouble
    val minLogp = flags.getOrElse("min-logp", "-12.0").toDouble
    val (curated, report) =
      run(spark, spark.read.parquet(pos.head), minQuality, minLogp)
    curated.write.mode("overwrite").partitionBy("shard")
      .parquet(s"${pos(1)}/corpus")
    // Hadoop FS, not java.nio: outDir may be hdfs:// or s3:// under
    // spark-submit — both outputs must honor the same scheme
    val reportPath = new org.apache.hadoop.fs.Path(pos(1), "report.json")
    val fs = reportPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val os = fs.create(reportPath, true)
    try os.write(report.json.getBytes("UTF-8")) finally os.close()
    // NO spark.stop(): the CLI convention here (and what keeps these
    // mains drivable from the shared test session) — spark-submit
    // tears the JVM down anyway
  }
}
