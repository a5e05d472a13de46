package graft.store

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** The maintained inverted-reference index must reproduce a full-scan
  * `prop_type = 'entity'` inversion after any fold sequence: adds,
  * retractions (an entity that STOPS referencing another), replays of
  * a committed fold, and a compaction of the posting lake.
  */
class RefIndexSpec extends AnyFunSuite {
  import SparkSpec.spark
  import spark.implicits._

  private def stmts(rows: (String, String, String, String)*): DataFrame =
    rows.toDF("canonical_id", "prop_type", "value", "last_seen")
      .withColumn("stmt_id",
        concat_ws("#", col("canonical_id"), col("prop_type"), col("value")))

  private def pairs(df: DataFrame): Set[(String, String)] =
    df.select(col("ref"), col("referrer")).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet

  test("fold forward adds, retracts, replays, compacts") {
    val root = java.nio.file.Files
      .createTempDirectory("refidx-spec").toString
    val lakeP = s"$root/lake"
    val idxP = s"$root/refidx"
    // a refs x; b refs x and y; c has only a non-entity statement
    MergeLake.init(stmts(
      ("a", "entity", "x", "d0"),
      ("b", "entity", "x", "d0"),
      ("b", "entity", "y", "d0"),
      ("c", "name", "x", "d0")), lakeP, bucketBy = "canonical_id")
    RefIndex.init(spark, idxP, lakeP)
    assert(pairs(RefIndex.postings(spark, idxP)) ===
      Set(("x", "a"), ("x", "b"), ("y", "b")))

    // a's update drops the x ref and adds a z ref — the x posting must
    // retract. The delta carries a's FULL new statement set; the old
    // refs come from the pinned pre-append lake state.
    val delta = stmts(("a", "entity", "z", "d1"))
      // a's old x-ref row is superseded by a tombstone-style rewrite:
      // in statement MERGE semantics the upsert key is the stmt_id, so
      // "dropping" a statement means its key is re-asserted with a
      // non-entity marker — here we exercise the simpler production
      // case where the SAME stmt_id flips value (same key, new value)
      .withColumn("stmt_id", lit("a#entity#x"))
    MergeLake.append(delta, lakeP)
    RefIndex.refresh(spark, idxP, lakeP, Seq("a"), "d1")
    assert(pairs(RefIndex.postings(spark, idxP)) ===
      Set(("x", "b"), ("y", "b"), ("z", "a")))

    // pruned lookup: referrers of x alone
    assert(pairs(RefIndex.referrers(spark, idxP, Seq("x").toDF("id"))) ===
      Set(("x", "b")))

    // replay of a committed fold: re-append the identical delta and
    // re-refresh the same generation — postings must not change (the
    // symmetric difference between the re-synced versions is empty)
    MergeLake.append(delta, lakeP)
    RefIndex.refresh(spark, idxP, lakeP, Seq("a"), "d1")
    assert(pairs(RefIndex.postings(spark, idxP)) ===
      Set(("x", "b"), ("y", "b"), ("z", "a")))

    // maintenance folds the posting deltas (with their tombstones)
    RefIndex.maintain(spark, idxP, compactEvery = 1)
    assert(MergeLake.deltaCount(spark, s"$idxP/postings") === 0)
    assert(pairs(RefIndex.postings(spark, idxP)) ===
      Set(("x", "b"), ("y", "b"), ("z", "a")))
    assert(pairs(RefIndex.referrers(spark, idxP,
      Seq("z", "y").toDF("id"))) === Set(("z", "a"), ("y", "b")))
  }
}
