package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Dump formatted physical plans for the headline queries (plan-audit
  * input for PLANS.md).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.maxPlanStringLength", "65536")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.001"
    val names = sys.env.get("SPARK_GRAFT_PLANS")
      .map(_.split(",").toSeq).getOrElse(Seq(
        "q_agg_pricing", "q_blk_pairs", "q_blk_match_topk",
        "q_dedup_lsh_pairs", "q_sim_ann_lsh", "q_topk_window",
        "q_store_assemble", "q_sim_ivf", "q_dedup_ngram_jaccard",
        "q_store_delta", "q_train_quarantine", "q_enrich_candidates",
        "q_store_pack"))
    val sb = new StringBuilder
    for (n <- names) {
      val df = SparkEntry.queries(n)(spark, d)
      sb.append(s"==== $n ====\n")
      sb.append(df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
      sb.append("\n")
    }
    Files.writeString(Paths.get("/tmp/plans.txt"), sb.toString)
    println("WROTE /tmp/plans.txt")
    spark.stop()
  }
}
