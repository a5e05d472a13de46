package graft

import org.apache.spark.sql.SparkSession

/** Shared local SparkSession for the test suite. */
object SparkSpec {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // bound plan-explain allocations (a pathological plan otherwise
      // OOMs the driver building a multi-hundred-MB debug string)
      .config("spark.sql.maxPlanStringLength", "65536")
      .appName("graft-test")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}
