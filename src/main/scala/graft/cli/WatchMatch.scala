package graft.cli

import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.{StringType, StructField, StructType}

import graft.blocker.{Blocker, EntityTokenizer}
import graft.streaming.MatchStream
import graft.xref.Xref

/** `graft watch-match` — the operational wrapper for the streaming
  * incremental matcher ([[MatchStream]]): build the TF index once from
  * a statement table (or ijson entities), then watch a directory for
  * new statement batches (JSON lines) and write live candidate
  * rankings as Parquet.
  *
  * {{{
  *   spark-submit --class graft.cli.WatchMatchMain graft.jar \
  *     corpus.parquet /in/watch-dir /out/candidates \
  *     [--trigger available-now|<interval>] [--checkpoint dir]
  * }}}
  *
  * `--trigger available-now` (default) drains what is in the directory
  * and exits — the batch-operable form. An interval (e.g. "30 seconds")
  * runs continuously; that is also the mode where a state TTL belongs
  * (see [[MatchStream.candidates]] on why TTL + zero-interval trigger
  * must not be combined).
  */
object WatchMatchMain {

  /** Minimal streamed-statement schema: the fields the tokenizer reads. */
  val StreamSchema: StructType = StructType(Seq(
    "entity_id", "schema", "prop", "prop_type", "value")
    .map(StructField(_, StringType)))

  def main(args: Array[String]): Unit = {
    val (pos, flags) = CliArgs.parse(args)
    require(pos.length == 3,
      "usage: WatchMatchMain <corpus> <watch-dir> <out-dir> " +
        "[--trigger available-now|interval] [--checkpoint dir] " +
        "[--dataset name] [--state-ttl dur]")
    val List(corpus, watchDir, outDir) = pos
    val s = CliArgs.session("watch-match")
    val cfg = Blocker.Config()

    val stmts = CliArgs.readStatements(s, corpus,
      flags.getOrElse("dataset", "default"))
    val tf = Blocker.termFrequencies(
      EntityTokenizer.entries(stmts), Xref.compatDf(s), Xref.boostsDf(s),
      cfg, dampFields = EntityTokenizer.DampFields)
      .localCheckpoint(eager = true)

    val stream = s.readStream.schema(StreamSchema).json(watchDir)
    val out = MatchStream.candidates(stream, tf, Xref.compatDf(s), cfg,
      stateTtl = flags.get("state-ttl"))

    val trigger = flags.getOrElse("trigger", "available-now") match {
      case "available-now" => Trigger.AvailableNow()
      case interval => Trigger.ProcessingTime(interval)
    }
    val q = out.writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation",
        flags.getOrElse("checkpoint", s"$outDir/_checkpoint"))
      .outputMode("append")
      .trigger(trigger)
      .start()
    q.awaitTermination()
  }
}
