package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

/** The stored-index lake: artifacts publish to disk once, later
  * sessions read them, clearing/invalidation is safe mid-session —
  * every index rebuilds on next use with identical results.
  */
class CachesSpec extends AnyFunSuite {
  import SparkSpec.spark

  val dir = "/root/testdata/sf0.001"

  test("clearAll drops and rebuilds every stored-index cache") {
    val ivf = similarity.SimilarityQueries.queries("q_sim_ivf")
    val pairs = dedup.DedupQueries.queries("q_dedup_winnow")
    val before = (ivf(spark, dir).count(), pairs(spark, dir).count())
    Caches.clearAll()
    val after = (ivf(spark, dir).count(), pairs(spark, dir).count())
    assert(before === after)
  }

  test("ensureAll publishes on-disk artifacts; reads match rebuilds") {
    val tmp = Files.createTempDirectory("graft-index-spec").toString
    val prev = sys.props.get("graft.index.dir")
    sys.props.put("graft.index.dir", tmp)
    Caches.clearAll()
    try {
      Caches.ensureAll(spark, dir)
      val fp = IndexLake.fingerprint(dir)
      val names = Seq("blocker_entries", "blocker_tf", "resolver_scores",
        "wd_snaks", "ivf_centroids", "pq_codebook", "pq_codes",
        "near_banded", "fp_sets", "fp_pos", "bpe_merges")
      for (n <- names)
        assert(Files.exists(Paths.get(tmp, fp, n, "_SUCCESS")),
          s"artifact $n not published")
      // a fresh memo (new session would do the same) reads the artifact
      // and the result matches a from-scratch rebuild bit-for-bit
      val viaDisk = blocker.BlockerQueries.tfCk(spark, dir)
        .orderBy("field", "token", "id").collect().toSeq
      IndexLake.clearMemo()
      val reread = blocker.BlockerQueries.tfCk(spark, dir)
        .orderBy("field", "token", "id").collect().toSeq
      assert(viaDisk === reread)
      val rebuilt = blocker.BlockerQueries.tf(spark, dir)
        .orderBy("field", "token", "id").collect().toSeq
      assert(viaDisk === rebuilt)
      // invalidate wipes the fingerprint dir; next touch republishes
      IndexLake.invalidate(dir)
      assert(!Files.exists(Paths.get(tmp, fp, "blocker_tf", "_SUCCESS")))
      blocker.BlockerQueries.tfCk(spark, dir).count()
      assert(Files.exists(Paths.get(tmp, fp, "blocker_tf", "_SUCCESS")))
    } finally {
      prev match {
        case Some(v) => sys.props.put("graft.index.dir", v)
        case None => sys.props.remove("graft.index.dir")
      }
      Caches.clearAll()
      IndexLake.invalidate(dir) // no-op under the restored root
    }
  }

  test("a partial artifact (no _SUCCESS) is rebuilt, not served") {
    val tmp = Files.createTempDirectory("graft-index-partial").toString
    val prev = sys.props.get("graft.index.dir")
    sys.props.put("graft.index.dir", tmp)
    IndexLake.clearMemo()
    try {
      // plant a garbage directory where the artifact would live,
      // WITHOUT the _SUCCESS marker — a crashed writer's leftovers
      val dir = Paths.get(tmp, IndexLake.fingerprint(this.dir),
        "blocker_tf")
      Files.createDirectories(dir)
      Files.write(dir.resolve("part-garbage.parquet"),
        Array[Byte](1, 2, 3))
      val viaLake = blocker.BlockerQueries.tfCk(spark, this.dir).count()
      val direct = blocker.BlockerQueries.tf(spark, this.dir).count()
      assert(viaLake === direct, "partial artifact must be rebuilt")
      assert(Files.exists(dir.resolve("_SUCCESS")))
    } finally {
      prev match {
        case Some(v) => sys.props.put("graft.index.dir", v)
        case None => sys.props.remove("graft.index.dir")
      }
      IndexLake.clearMemo()
    }
  }

  test("concurrent first-touch builders publish exactly one artifact") {
    val tmp = Files.createTempDirectory("graft-index-race").toString
    val prev = sys.props.get("graft.index.dir")
    sys.props.put("graft.index.dir", tmp)
    IndexLake.clearMemo()
    try {
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration._
      import scala.concurrent.ExecutionContext.Implicits.global
      val counts = Await.result(
        Future.sequence((1 to 4).map(_ => Future {
          blocker.BlockerQueries.tfCk(spark, dir).count()
        })), 120.seconds)
      assert(counts.distinct.size === 1)
      val fp = IndexLake.fingerprint(dir)
      assert(Files.exists(Paths.get(tmp, fp, "blocker_tf", "_SUCCESS")))
      // no leftover temp dirs from losing racers
      val leftovers = Files.list(Paths.get(tmp, fp)).toArray
        .map(_.toString).filter(_.contains(".tmp-"))
      assert(leftovers.isEmpty, leftovers.mkString(","))
    } finally {
      prev match {
        case Some(v) => sys.props.put("graft.index.dir", v)
        case None => sys.props.remove("graft.index.dir")
      }
      IndexLake.clearMemo()
    }
  }

  test("artifacts publish and read through a file: URI root") {
    // the Hadoop-FS port: the root may be any Hadoop URI, not a bare
    // local path — hdfs://, s3a:// go through the same code path
    val tmp = Files.createTempDirectory("graft-index-uri").toString
    val prev = sys.props.get("graft.index.dir")
    sys.props.put("graft.index.dir", s"file:$tmp")
    IndexLake.clearMemo()
    try {
      val viaLake = blocker.BlockerQueries.tfCk(spark, dir).count()
      val fp = IndexLake.fingerprint(dir)
      assert(Files.exists(Paths.get(tmp, fp, "blocker_tf", "_SUCCESS")))
      IndexLake.clearMemo()
      assert(blocker.BlockerQueries.tfCk(spark, dir).count() === viaLake)
    } finally {
      prev match {
        case Some(v) => sys.props.put("graft.index.dir", v)
        case None => sys.props.remove("graft.index.dir")
      }
      IndexLake.clearMemo()
    }
  }

  test("gc retires stale generations, keeps the current and the young") {
    val tmp = Files.createTempDirectory("graft-index-gc").toString
    val prev = sys.props.get("graft.index.dir")
    sys.props.put("graft.index.dir", tmp)
    IndexLake.clearMemo()
    try {
      def mk(name: String, ageMs: Long): Unit = {
        val d = Paths.get(tmp, name, "some_artifact")
        Files.createDirectories(d)
        Files.write(d.resolve("part-0.parquet"), Array[Byte](1))
        val t = java.nio.file.attribute.FileTime.fromMillis(
          System.currentTimeMillis() - ageMs)
        Files.setLastModifiedTime(d.resolve("part-0.parquet"), t)
        Files.setLastModifiedTime(d, t)
        Files.setLastModifiedTime(Paths.get(tmp, name), t)
      }
      mk("aaaa00000000stal", 48L * 3600 * 1000) // stale
      mk("bbbb00000000kept", 48L * 3600 * 1000) // stale but kept
      mk("cccc00000000youn", 0L) // too young to collect
      val gone = IndexLake.gc(keep = Set("bbbb00000000kept"),
        maxAgeMs = 6L * 3600 * 1000)
      assert(gone === Seq("aaaa00000000stal"))
      assert(!Files.exists(Paths.get(tmp, "aaaa00000000stal")))
      assert(Files.exists(Paths.get(tmp, "bbbb00000000kept")))
      assert(Files.exists(Paths.get(tmp, "cccc00000000youn")))
    } finally {
      prev match {
        case Some(v) => sys.props.put("graft.index.dir", v)
        case None => sys.props.remove("graft.index.dir")
      }
      IndexLake.clearMemo()
    }
  }

  test("fingerprint tracks data-dir content") {
    val a = IndexLake.fingerprint(dir)
    assert(a === IndexLake.fingerprint(dir), "fingerprint is stable")
    assert(a !== IndexLake.fingerprint("/root/testdata/sf0.01"),
      "different dirs key different artifact sets")
  }
}
