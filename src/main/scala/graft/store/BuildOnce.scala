package graft.store

import java.util.UUID

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Build-once gate for the stateful query artifacts (the MERGE lake,
  * blocker-index and ref-index scenarios that run their own
  * init/refresh sequence inside a gated query): the builder constructs
  * under a FRESH scratch directory and publishes it with one atomic
  * rename, so two sessions racing the same data dir can never build in
  * place on top of each other (the r12 shape ran init() directly at
  * the final path, gated only by a marker — a concurrent session could
  * delete the root out from under another's refresh). The loser of the
  * publish race discards its scratch and serves the winner's artifact;
  * builders are deterministic per data dir, so the two are
  * byte-equivalent. Stale-code serving is already impossible: callers
  * key `path` on [[graft.IndexLake.fingerprint]], which folds the
  * engine-build class-bytes hash into every artifact path.
  */
object BuildOnce {

  val Marker = "_APPLIED"

  /** Run `build` against a scratch dir unless `path` is already
    * published, then publish atomically. Returns `path`.
    */
  def apply(s: SparkSession, path: String)(build: String => Unit): String = {
    val dst = new Path(path)
    val f = dst.getFileSystem(s.sparkContext.hadoopConfiguration)
    val marker = new Path(dst, Marker)
    if (!f.exists(marker)) {
      val tmp = new Path(s"$path.build-${UUID.randomUUID()}")
      try {
        build(tmp.toString)
        // the marker is written INSIDE the scratch before the rename:
        // the publish makes artifact and marker visible in one step, so
        // a reader can never see a marked-but-half-built directory
        f.create(new Path(tmp, Marker), true).close()
        if (f.exists(dst) || !f.rename(tmp, dst)) {
          // lost the race — a concurrent session published first
          f.delete(tmp, true)
          require(f.exists(marker),
            s"raced builder left no published artifact at $path")
        }
      } catch {
        case e: Throwable => f.delete(tmp, true); throw e
      }
    }
    path
  }
}
