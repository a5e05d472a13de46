package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.blocker.{BlockerIndex, EntityTokenizer}
import graft.cli.CliArgs
import graft.resolver.Resolver
import graft.store.{EntityStore, MergeLake}
import graft.xref.Xref

/** The COMPOSED incremental loop as ONE continuous streaming driver —
  * the streaming twin of the batch loop soak (Soak `loop`), and the
  * shape a deployed nomenklatura pipeline actually runs: statements
  * arrive as micro-batches and each `foreachBatch` executes the full
  * production increment through the SAME code paths the batch loop
  * uses —
  *
  *  1. MERGE ingest     — [[MergeLake.append]], O(Δ)
  *  2. index fold       — [[BlockerIndex.refresh]], O(|Δ|·tokens)
  *  3. delta xref       — [[Xref.scoredDeltaPairs]] against everything
  *                        decided so far, O(|Δ|·postings)
  *  4. incremental decide — [[ResolveStream.applyBatchChanged]],
  *                        O(affected members)
  *  5. Δ-scoped apply   — re-elect canonicals for the touched clusters
  *                        only, upsert ONLY their members' rewritten
  *                        statements (plus the batch's own) into the
  *                        canonical statement lake
  *
  * so a day's increment costs its own volume at every stage. The end
  * state (the canonical lake) is bit-equal to one from-scratch batch
  * run over the final corpus — LoopStreamSpec proves it with the same
  * oracle the batch soak uses.
  *
  * Exactly-once: foreachBatch is at-least-once on retry. Every stage
  * here is retry-idempotent — lake appends resolve by last-writer-wins
  * over identical replayed content, the index fold skips an
  * already-committed generation, the edge log writes a deterministic
  * per-batch directory with overwrite, and a replayed decide finds its
  * edges intra-cluster and writes nothing.
  */
object LoopStream {

  /** On-disk layout of one loop deployment. */
  final case class Paths(root: String) {
    val lake = s"$root/lake"
    val state = s"$root/state"
    val index = s"$root/blkidx"
    val canonical = s"$root/canonical"
    val edges = s"$root/edges"
  }

  private def tokenize(cfg: Xref.Config)(st: DataFrame): DataFrame =
    EntityTokenizer.entries(
      EntityStore.view(st, withExternal = cfg.external))

  private def edgeDirs(s: SparkSession, p: Paths): Seq[String] = {
    val root = new Path(p.edges)
    val fs = root.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).map(_.getPath.toString).toSeq.sorted
  }

  private def decidedSoFar(s: SparkSession, p: Paths): DataFrame =
    s.read.parquet(edgeDirs(s, p): _*)

  private def writeEdges(s: SparkSession, p: Paths, gen: String,
      edges: DataFrame): DataFrame = {
    val dir = s"${p.edges}/gen-$gen"
    edges.write.mode("overwrite").parquet(dir)
    s.read.parquet(dir)
  }

  /** Day 0: land and resolve the base corpus (the batch setup every
    * continuous deployment starts from). Builds the statement lake
    * (bucketed by entity for pruned slice reads), the blocker index,
    * the resolver state from one full xref, and the canonical lake.
    */
  def init(s: SparkSession, day0: DataFrame, p: Paths,
      cfg: Xref.Config): Unit = {
    val threshold = cfg.autoThreshold.getOrElse(sys.error(
      "LoopStream needs cfg.autoThreshold (the auto-merge gate)"))
    MergeLake.init(day0, p.lake, bucketBy = "canonical_id")
    val corpus = MergeLake.snapshot(s, p.lake).drop("bucket")
    BlockerIndex.init(corpus, p.index, tokenize(cfg))
    import s.implicits._
    val none = Seq.empty[(String, String)].toDF("src", "dst")
    val (m, _) = Xref.run(s, corpus, none, cfg)
    val edges0 = writeEdges(s, p, "init",
      m.filter(col("score") > threshold).select(col("src"), col("dst")))
    ResolveStream.init(Resolver.connectedComponents(edges0), p.state)
    val cm = Resolver.canonicalMap(
      ResolveStream.state(s, p.state), CliArgs.idWeight)
    MergeLake.init(CliArgs.applyCanonical(corpus, cm), p.canonical,
      bucketBy = "canonical_id")
  }

  /** One increment — the foreachBatch body, callable directly by a
    * batch driver too (the spec runs both and compares).
    */
  def processBatch(s: SparkSession, batch: DataFrame, gen: String,
      p: Paths, cfg: Xref.Config): Unit = {
    if (batch.isEmpty) return
    val threshold = cfg.autoThreshold.get
    import s.implicits._

    // 1. MERGE ingest
    MergeLake.append(batch, p.lake): Unit
    val corpus = MergeLake.snapshot(s, p.lake).drop("bucket")

    // 2. blocker-index fold (skip if a retried batch already committed
    // its generation)
    val touched = batch.select(col("canonical_id")).distinct()
      .collect().map(_.getString(0)).toIndexedSeq
    if (!BlockerIndex.readManifest(s, p.index).statsDirs
        .contains(s"stats-$gen")) {
      val bs = MergeLake.bucketsOf(s, p.lake, touched)
      val slice = MergeLake.snapshot(s, p.lake, Some(bs))
        .join(broadcast(touched.toDF("cid")),
          col("canonical_id") === col("cid"), "left_semi")
        .drop("bucket")
      BlockerIndex.refresh(s, p.index, slice, touched, gen, tokenize(cfg))
    }

    // 3. delta xref against everything decided so far, through the
    // maintained TF view
    val tf = BlockerIndex.termFrequencies(s, p.index, Xref.compatDf(s),
      Xref.boostsDf(s), cfg.blocker,
      dampFields = EntityTokenizer.DampFields)
    val isDelta = col("id").isInCollection(touched)
    val edges = writeEdges(s, p, gen,
      Xref.scoredDeltaPairs(s, corpus, decidedSoFar(s, p), isDelta, cfg,
          Some(tf))
        .filter(col("score") > threshold)
        .select(col("lid").as("src"), col("rid").as("dst")))

    // 4. incremental decide
    val changed = ResolveStream.applyBatchChanged(s, edges, p.state, gen)

    // 5. Δ-scoped apply into the canonical lake. The write set is the
    // full closure a relabeling actually dirties — the touched
    // clusters' members, the batch's own entities, AND every entity
    // whose statements REFERENCE a relabeled member (their entity-ref
    // values must repoint to the new canonical; the referrer scan is
    // one map-only corpus pass behind a broadcast semi-join — at lake
    // scale the inverted-reference artifact serves the same lookup).
    // The canonical map must cover both the write set's own clusters
    // and the clusters of every entity the rewritten rows reference
    // (canonical election is per-cluster, so a referenced member pulls
    // its whole cluster into the map) — without the closure an upsert
    // would regress a day-0 rewrite back to a raw id.
    val st = ResolveStream.state(s, p.state)
    // the write-set clusters derive from the batch's TOUCHED entities,
    // not from `changed`: every cluster this batch's edges merged
    // contains a touched entity (delta edges always have a Δ
    // endpoint), so clusters-of-touched ⊇ changed-clusters — and
    // unlike `changed` (empty on a replay, whose edges are already
    // intra-cluster) it is REPLAY-STABLE: a batch whose decide
    // committed but whose apply crashed still rewrites the flipped
    // members when re-run
    val members0 = st.join(
      broadcast(st.join(broadcast(touched.toDF("tid")),
          st("id") === col("tid"), "left_semi")
        .select(col("cluster")).distinct()),
      Seq("cluster"), "left_semi")
    // referrers key on ALL members of the touched clusters, not just
    // the relabeled ids: a batch that merges into an existing cluster
    // relabels only the joiner, but the cluster's ELECTED CANONICAL
    // can flip — every statement referencing any member must repoint
    val referrers = corpus.filter(col("prop_type") === "entity")
      .join(broadcast(members0.select(col("id").as("t"))),
        col("value") === col("t"), "left_semi")
      .select(col("canonical_id").as("eid")).distinct()
    val writeIds = members0.select(col("id").as("eid"))
      .unionByName(referrers).unionByName(touched.toDF("eid"))
      .distinct()
    val slice = graft.Caches.pin(corpus.join(broadcast(writeIds),
      col("canonical_id") === col("eid"), "left_semi"))
    val refs = slice.filter(col("prop_type") === "entity")
      .select(col("value").as("eid")).distinct()
    val cmClusters = st.join(
      broadcast(writeIds.unionByName(refs).distinct()),
      st("id") === col("eid"), "left_semi")
      .select(col("cluster")).distinct()
    val cmMembers = st.join(broadcast(cmClusters), Seq("cluster"),
      "left_semi")
    val cm = Resolver.canonicalMap(cmMembers, CliArgs.idWeight)
    MergeLake.append(
      CliArgs.applyCanonical(slice, cm).withColumn("last_seen", lit(gen)),
      p.canonical): Unit
    slice.unpersist(): Unit
    changed.unpersist(): Unit
  }

  /** Attach the composed loop to a statement stream. */
  def sink(stmts: DataFrame, p: Paths,
      cfg: Xref.Config): DataStreamWriter[Row] =
    stmts.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch.sparkSession, batch, s"b$batchId", p, cfg)
      }
}
