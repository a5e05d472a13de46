package graft.store

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Statement file formats: CSV round-trip of the 14-column statement
  * schema (reference `cli.py:322-334` statement read/write via the
  * FORMATS registry) and the pack form (a compact JSON tuple per row,
  * `store/util.py:7-47`).
  */
object StatementFormats {

  val csvSchema: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("entity_id", StringType),
    StructField("canonical_id", StringType),
    StructField("prop", StringType),
    StructField("prop_type", StringType),
    StructField("schema", StringType),
    StructField("value", StringType),
    StructField("original_value", StringType),
    StructField("dataset", StringType),
    StructField("origin", StringType),
    StructField("lang", StringType),
    StructField("external", BooleanType),
    StructField("first_seen", TimestampType),
    StructField("last_seen", TimestampType)))

  def writeCsv(stmts: DataFrame, path: String): Unit =
    stmts.select(EntityStore.statementCols.map(col): _*)
      .write.mode("overwrite").option("header", "true").csv(path)

  def readCsv(s: SparkSession, path: String): DataFrame =
    s.read.option("header", "true").schema(csvSchema).csv(path)

  /** Pack: one compact JSON array per statement — the KV-store wire
    * form (`store/util.py:7-47`).
    */
  def pack(stmts: DataFrame): DataFrame =
    stmts.select(col("id").as("key"), to_json(array(
      col("entity_id"), col("prop"), col("value"),
      coalesce(col("lang"), lit("")),
      coalesce(col("original_value"), lit("")),
      coalesce(col("origin"), lit("")),
      col("schema"), col("dataset"), col("canonical_id"),
      col("prop_type"))).as("packed"))

  def unpack(packed: DataFrame): DataFrame =
    packed.select(col("key").as("id"),
      from_json(col("packed"), ArrayType(StringType)).as("a"))
      .select(col("id"),
        col("a")(0).as("entity_id"), col("a")(8).as("canonical_id"),
        col("a")(1).as("prop"), col("a")(9).as("prop_type"),
        col("a")(6).as("schema"), col("a")(2).as("value"),
        when(col("a")(4) === "", null).otherwise(col("a")(4))
          .as("original_value"),
        col("a")(7).as("dataset"),
        when(col("a")(5) === "", null).otherwise(col("a")(5)).as("origin"),
        when(col("a")(3) === "", null).otherwise(col("a")(3)).as("lang"),
        lit(false).as("external"),
        lit(null).cast("timestamp").as("first_seen"),
        lit(null).cast("timestamp").as("last_seen"))
}
