package graft.store

import org.scalatest.funsuite.AnyFunSuite

/** MergeLake: upsert-on-id resolve, O(delta) appends, and
  * touched-bucket-only compaction.
  */
class MergeLakeSpec extends AnyFunSuite {
  import graft.SparkSpec.spark
  import spark.implicits._

  private def row(id: String, value: String, seen: String) =
    (id, id.split("#")(0), "Thing", id.split("#")(1), value, seen)

  private def df(rows: (String, String, String)*) =
    rows.map(r => row(r._1, r._2, r._3))
      .toDF("stmt_id", "id", "schema", "field", "value", "last_seen")

  private def stateOf(path: String): Set[(String, String, String)] =
    MergeLake.snapshot(spark, path)
      .select("stmt_id", "value", "last_seen")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
      .toSet

  test("append upserts on stmt_id and compact preserves the resolve") {
    val path = java.nio.file.Files
      .createTempDirectory("mergelake").toString + "/lake"
    MergeLake.init(df(
      ("a#name", "Alice", "v1"),
      ("b#name", "OLD Bob", "v1"),
      ("c#name", "Carol", "v1")), path, nBuckets = 4)
    // one batch updates b and inserts d; a later batch re-updates d
    MergeLake.append(df(
      ("b#name", "Bob", "v2"),
      ("d#name", "Dan", "v2")), path, nBuckets = 4)
    MergeLake.append(df(("d#name", "Daniel", "v3")), path, nBuckets = 4)
    val expected = Set(
      ("a#name", "Alice", "v1"),
      ("b#name", "Bob", "v2"),
      ("c#name", "Carol", "v1"),
      ("d#name", "Daniel", "v3"))
    assert(stateOf(path) === expected) // merge-on-read resolve
    val touched = MergeLake.compact(spark, path)
    assert(touched.nonEmpty)
    assert(stateOf(path) === expected) // compaction is state-preserving
    // all deltas folded: a fresh append gets seq 1 again
    assert(MergeLake.append(df(("e#name", "Eve", "v4")), path, 4) === 1)
    assert(stateOf(path) === expected + (("e#name", "Eve", "v4")))
  }

  test("compact rewrites only the buckets the deltas touched") {
    val path = java.nio.file.Files
      .createTempDirectory("mergelake").toString + "/lake"
    // many buckets so the single-row delta cannot touch them all
    val base = (1 to 64).map(i => (s"e$i#name", s"N$i", "v1"))
    MergeLake.init(df(base: _*), path, nBuckets = 16)
    MergeLake.append(df(("e1#name", "N1b", "v2")), path, nBuckets = 16)
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val basePath = new org.apache.hadoop.fs.Path(path, "base")
    def mtimes: Map[String, Long] =
      fs.listStatus(basePath).filter(_.getPath.getName.startsWith("bucket="))
        .map(st => st.getPath.getName ->
          fs.listStatus(st.getPath).map(_.getModificationTime).max).toMap
    val before = mtimes
    Thread.sleep(20)
    val touched = MergeLake.compact(spark, path)
    val after = mtimes
    assert(touched.size < 16, "a one-row delta must not touch every bucket")
    val untouched = before.keySet.filterNot(k =>
      touched.map(t => s"bucket=$t").contains(k))
    assert(untouched.nonEmpty)
    untouched.foreach(k => assert(before(k) === after(k),
      s"untouched bucket $k was rewritten"))
  }
}
