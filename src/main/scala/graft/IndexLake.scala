package graft

import java.io.File
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.security.MessageDigest
import java.util.Comparator

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Lake-persisted stored-index artifacts — the production shape of the
  * engine's derived indexes (blocker entries/TF, resolver score table,
  * wikidata snak table, trained IVF centroids, PQ codebook/codes, the
  * banded near-dup corpus, winnow fingerprint tables, BPE merges).
  *
  * The reference persists every one of these inside its storage engine
  * (the blocker keeps `term_frequencies` as a DuckDB TABLE,
  * `blocker/index.py:504-531`; the resolver reads one edge store,
  * `resolver/index.py`); a 100 TB Spark lake does the same with
  * write-once parquet next to the data: build on first touch, publish
  * atomically, and every later session — verify, bench, a different
  * driver — reads the artifact instead of re-deriving it. This replaces
  * the session-local `localCheckpoint` stand-ins the engine used
  * before: those were executor-memory-resident and died with the
  * session; these are restartable and shareable.
  *
  * Artifacts are keyed by a fingerprint of the source directory
  * (name/size/mtime of its parquet entries + [[FormatVersion]]), so a
  * regenerated data dir or a changed builder silently rebuilds instead
  * of serving a stale index. Publication is write-to-temp + atomic
  * rename, so concurrent builders race benignly: one wins the rename,
  * the loser discards its copy and reads the winner's.
  */
object IndexLake {

  /** Bump whenever any artifact builder changes its output.
    * v2: corpus-scaled IVF coarse lists (C ≈ √n) replaced mod-37
    * seeding; wd statement/link artifacts added.
    */
  val FormatVersion = 2

  /** Artifact root — overridable per deployment; defaults to the local
    * tmp filesystem (the sandbox's stand-in for a lake prefix; the data
    * dir itself is read-only here, in production this would live next
    * to the data).
    */
  def root: String = sys.env.getOrElse("GRAFT_INDEX_DIR",
    sys.props.getOrElse("graft.index.dir", "/tmp/graft-index"))

  /** Fingerprint of a source dir: sorted `name:size:mtime` of its
    * parquet entries (recursing into directory-shaped parquet), hashed
    * with [[FormatVersion]]. Regenerated data ⇒ new fingerprint ⇒
    * rebuild; stale fingerprints age out with the tmp dir.
    */
  def fingerprint(sfDir: String): String = {
    def walk(f: File): Seq[String] = {
      val kids = Option(f.listFiles()).map(_.toSeq).getOrElse(Seq.empty)
      if (f.isDirectory) kids.sortBy(_.getName).flatMap(walk)
      else Seq(s"${f.getName}:${f.length}:${f.lastModified}")
    }
    val entries = Option(new File(sfDir).listFiles())
      .map(_.toSeq).getOrElse(Seq.empty)
      .filter(_.getName.endsWith(".parquet"))
      .sortBy(_.getName).flatMap(walk)
    val md = MessageDigest.getInstance("SHA-256")
    md.update(s"graft-index-v$FormatVersion\n$sfDir\n".getBytes("UTF-8"))
    entries.foreach(e => md.update((e + "\n").getBytes("UTF-8")))
    md.digest().take(8).map("%02x".format(_)).mkString
  }

  def path(sfDir: String, name: String): Path =
    Paths.get(root, fingerprint(sfDir), name)

  private def ready(dir: Path): Boolean =
    Files.exists(dir.resolve("_SUCCESS"))

  private val memo = TrieMap.empty[(SparkSession, String, String), DataFrame]

  /** Read-or-build: return `name` for `sfDir`, building and publishing
    * it first if absent. The returned frame is a plain parquet scan of
    * the artifact — column pruning and predicate pushdown apply to
    * every consumer, unlike a checkpointed in-memory frame.
    */
  def artifact(s: SparkSession, sfDir: String, name: String)
      (build: => DataFrame): DataFrame =
    memo.getOrElseUpdate((s, sfDir, name), {
      val dir = path(sfDir, name)
      if (!ready(dir)) publish(dir, build)
      s.read.parquet(dir.toString)
    })

  private def publish(dir: Path, df: DataFrame): Unit = synchronized {
    if (ready(dir)) return
    Files.createDirectories(dir.getParent)
    val tmp = dir.getParent.resolve(
      s".${dir.getFileName}.tmp-${java.util.UUID.randomUUID().toString.take(8)}")
    // spread the artifact over the session's parallelism: an
    // AQE-coalesced single file would scan as ONE task in every
    // consumer (a 36k-row analysis index cost 1.3 s single-threaded;
    // 0.3 s spread). At lake scale the same rule sizes files so a
    // scan saturates the cluster.
    val parts = math.min(32,
      df.sparkSession.sparkContext.defaultParallelism)
    df.repartition(parts).write.mode("overwrite").parquet(tmp.toString)
    try Files.move(tmp, dir, StandardCopyOption.ATOMIC_MOVE)
    catch {
      // another process published concurrently: keep the winner
      case _: java.nio.file.FileSystemException =>
        if (ready(dir)) deleteRec(tmp)
        else { deleteRec(dir); Files.move(tmp, dir, StandardCopyOption.ATOMIC_MOVE) }
    }
  }

  private def deleteRec(p: Path): Unit =
    if (Files.exists(p))
      Files.walk(p).sorted(Comparator.reverseOrder[Path]())
        .forEach(f => Files.deleteIfExists(f))

  /** Drop the in-session memo (regenerated-dir hygiene — the on-disk
    * artifacts key on the data fingerprint and need no clearing).
    */
  def clearMemo(): Unit = memo.clear()

  /** Delete every on-disk artifact for `sfDir` (tests). */
  def invalidate(sfDir: String): Unit = {
    deleteRec(Paths.get(root, fingerprint(sfDir)))
    clearMemo()
  }
}
