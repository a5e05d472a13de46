package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Readers for the driver-provided synthetic tables (TESTDATA.md).
  *
  * All operators take the scale-factor directory as a parameter so the
  * same code runs at sf0.001 (smoke), sf0.01 (oracle) and sf0.1 (bench) —
  * and, unchanged, against a 100 TB lake: the reads are plain parquet
  * scans, so Catalyst pushes filters/projections into the scan and
  * partition pruning applies when the lake is partitioned.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def read(spark: SparkSession, sfDir: String, table: String): DataFrame =
    spark.read.parquet(s"$sfDir/$table.parquet")

  def lineitem(s: SparkSession, d: String): DataFrame = read(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame = read(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = read(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = read(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = read(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame = read(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame = read(s, d, "region")
  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark 4 rejects by
    * default; read it as nanos-since-epoch LONG (column `ts_ns`) and let
    * operators derive event-time from it. Truncated to microsecond
    * precision (the sub-microsecond digits zeroed) because DuckDB — the
    * correctness oracle — reads parquet nanos as TIMESTAMP(US); ordering
    * and session semantics are unaffected.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    read(s, d, "events").withColumnRenamed("ts", "ts_ns")
      .withColumn("ts_ns", col("ts_ns") - col("ts_ns") % 1000)
  }
  def documents(s: SparkSession, d: String): DataFrame = read(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = read(s, d, "embeddings")
}
