package graft.store

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental statement-lake MERGE — the upsert-on-statement-id
  * semantics of the reference's SQL store (`store/sql.py:90-177`,
  * INSERT .. ON CONFLICT(id) DO UPDATE) as a delta-append +
  * partition-compaction lake, so a daily increment costs O(delta)
  * instead of rewriting the corpus (which is what dedupe-on-id +
  * overwrite costs at 100 TB).
  *
  * Layout under `path` (merge-on-read, the Hudi/Iceberg MOR shape in
  * plain parquet + Hadoop FS):
  *
  * {{{
  *   base/bucket=K/...parquet     the compacted corpus
  *   delta/<seq>/bucket=K/...     appended increments, seq ascending
  * }}}
  *
  * Every file set is hash-partitioned on the upsert key
  * (`pmod(xxhash64(stmt_id), nBuckets)`), which buys two things at
  * scale: (a) a snapshot read resolves each key WITHIN one bucket, so
  * with the bucket count matched to the cluster the resolve shuffle
  * moves one bucket per task and never re-partitions the corpus; (b)
  * compaction rewrites ONLY the buckets the deltas touched (dynamic
  * partition overwrite) — a small increment touches at most
  * `delta-rows` buckets, so compaction cost is bounded by touched
  * data, not corpus size.
  *
  * Writes are append-only until [[compact]]; the resolve rule is
  * last-writer-wins per `stmt_id` (higher seq wins; within one batch
  * the tie breaks on (last_seen, value) descending, deterministic on
  * any engine — the reference's writer dedupes a batch in a Set the
  * same way).
  */
object MergeLake {

  val DefaultBuckets = 32

  private def fs(s: SparkSession, p: Path) =
    p.getFileSystem(s.sparkContext.hadoopConfiguration)

  /** Bucket column + one shuffle onto it before every write: without
    * it each of the writer's input partitions opens a file in every
    * bucket directory it touches (input-partitions × buckets tiny
    * files — the small-files problem that kills object-store listings
    * at scale, and measured 5.8 s to append 150 rows locally). The
    * shuffle is O(rows written); AQE sizes the task count to the
    * batch.
    */
  private def withBucket(df: DataFrame, nBuckets: Int): DataFrame =
    df.withColumn("bucket", pmod(xxhash64(col("stmt_id")), lit(nBuckets)))
      .repartition(col("bucket"))

  /** Initialize (or reset) the lake with a base corpus. */
  def init(stmts: DataFrame, path: String,
      nBuckets: Int = DefaultBuckets): Unit = {
    val s = stmts.sparkSession
    val root = new Path(path)
    val f = fs(s, root)
    if (f.exists(root)) f.delete(root, true)
    withBucket(stmts, nBuckets)
      .write.mode("overwrite").partitionBy("bucket")
      .parquet(new Path(root, "base").toString)
  }

  /** Append one increment — cost O(delta): no read of the base, no
    * rewrite, one partitioned write of the batch.
    */
  def append(delta: DataFrame, path: String,
      nBuckets: Int = DefaultBuckets): Int = {
    val s = delta.sparkSession
    val root = new Path(path)
    val seq = nextSeq(s, root)
    withBucket(delta, nBuckets)
      .write.mode("overwrite").partitionBy("bucket")
      .parquet(new Path(root, f"delta/$seq%06d").toString)
    seq
  }

  private def nextSeq(s: SparkSession, root: Path): Int = {
    val d = new Path(root, "delta")
    val f = fs(s, d)
    if (!f.exists(d)) 1
    else f.listStatus(d).map(_.getPath.getName.toInt).foldLeft(0)(math.max) + 1
  }

  private def deltaDirs(s: SparkSession, root: Path): Seq[(Int, Path)] = {
    val d = new Path(root, "delta")
    val f = fs(s, d)
    if (!f.exists(d)) Seq.empty
    else f.listStatus(d).map(st => (st.getPath.getName.toInt, st.getPath))
      .sortBy(_._1).toSeq
  }

  /** The resolved current state (merge-on-read): base ∪ deltas with
    * last-writer-wins per stmt_id. `buckets` restricts the read to a
    * bucket subset (partition pruning does the rest) — the compaction
    * path.
    */
  def snapshot(s: SparkSession, path: String,
      buckets: Option[Seq[Int]] = None): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val root = new Path(path)
    val base = s.read.parquet(new Path(root, "base").toString)
      .withColumn("_seq", lit(0))
    val all = deltaDirs(s, root).foldLeft(base) { case (acc, (seq, p)) =>
      acc.unionByName(
        s.read.parquet(p.toString).withColumn("_seq", lit(seq)))
    }
    val scoped = buckets match {
      case Some(bs) => all.filter(col("bucket").isin(bs: _*))
      case None => all
    }
    // one window over (bucket, stmt_id): the bucket column is a cheap
    // prefix of the partition key, so at scale a bucketed layout
    // satisfies the clustering without re-shuffling the corpus
    val w = Window.partitionBy(col("bucket"), col("stmt_id"))
      .orderBy(col("_seq").desc, col("last_seen").desc, col("value").desc)
    scoped.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_rn", "_seq")
  }

  /** Fold the accumulated deltas into the base and drop them. Only the
    * buckets the deltas touched are rewritten (their ids are plain
    * directory names — no data read to discover them). The resolved
    * buckets land in a temp sibling first and swap in per bucket
    * directory (Spark refuses to overwrite a path it reads, and the
    * swap is the object-store-safe publish order anyway — a production
    * deployment commits the swap through a manifest, the IndexLake
    * marker pattern); untouched base buckets are never opened.
    */
  def compact(s: SparkSession, path: String): Seq[Int] = {
    val root = new Path(path)
    val dirs = deltaDirs(s, root)
    if (dirs.isEmpty) return Seq.empty
    val f = fs(s, root)
    val touched = dirs.flatMap { case (_, p) =>
      f.listStatus(p).map(_.getPath.getName)
        .filter(_.startsWith("bucket="))
        .map(_.stripPrefix("bucket=").toInt)
    }.distinct.sorted
    val tmp = new Path(root, "base.tmp")
    if (f.exists(tmp)) f.delete(tmp, true)
    snapshot(s, path, Some(touched))
      .repartition(col("bucket")) // one file set per bucket dir
      .write.mode("overwrite").partitionBy("bucket")
      .parquet(tmp.toString)
    val base = new Path(root, "base")
    f.listStatus(tmp).filter(_.getPath.getName.startsWith("bucket="))
      .foreach { st =>
        val dst = new Path(base, st.getPath.getName)
        if (f.exists(dst)) f.delete(dst, true)
        f.rename(st.getPath, dst)
      }
    f.delete(tmp, true)
    dirs.foreach { case (_, p) => f.delete(p, true) }
    touched
  }
}
