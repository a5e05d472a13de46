package graft.store

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The statement lake as a bucketed table — the physical layout the
  * 100 TB runbook (PLANS.md) prescribes: statements bucketed and
  * sorted by `canonical_id`, so every downstream grouping and
  * self-join on the id (assembly, adjacency, canonicalization,
  * delta) reads pre-partitioned data and the Exchanges disappear
  * from the plan.
  *
  * The reference's stores get this for free from their storage
  * engines (`store/sql.py` orders by canonical id, `store/level.py`
  * key-prefixes on it); on Spark the equivalent is a bucketed
  * datasource table: `bucketBy` is the one layout Catalyst's
  * `EnsureRequirements` recognizes as already satisfying a
  * `ClusteredDistribution` on the bucket keys. StatementLakeSpec
  * asserts the assemble plan drops from 3 Exchanges to 0 when read
  * through the table.
  */
object StatementLake {

  /** Write a statement table as a bucketed+sorted external table.
    * Bucket count sizes to the cluster: at 100 TB use O(cores × 4)
    * buckets so a bucket is a few GB; locally 8 is plenty.
    */
  def writeBucketed(stmts: DataFrame, table: String, path: String,
      buckets: Int = 8): Unit =
    stmts.write.mode("overwrite")
      .bucketBy(buckets, "canonical_id")
      .sortBy("canonical_id")
      .option("path", path)
      .format("parquet")
      .saveAsTable(table)

  /** Read the lake back with its bucketing metadata intact — plain
    * `spark.read.parquet(path)` would lose the layout and reintroduce
    * the shuffles.
    */
  def read(s: SparkSession, table: String): DataFrame = s.table(table)
}
