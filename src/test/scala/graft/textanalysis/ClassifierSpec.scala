package graft.textanalysis

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** The trained quality-classifier gate: the model must genuinely LEARN
  * (held-out accuracy above the majority-class baseline), be
  * deterministic (fixed-point gradients — retraining gives identical
  * weights), and score map-only against the lake-artifact
  * coefficients.
  */
class ClassifierSpec extends AnyFunSuite {
  import SparkSpec.spark

  val sf = "/root/testdata/sf0.001"

  test("training beats the majority baseline on the held-out half") {
    val feat = Classifier.featuresOf(graft.Tables.documents(spark, sf))
      .cache()
    val m = Classifier.train(feat)
    val test = feat.filter(!col("is_train"))
    val z = lit(m.b) + col("x1") * m.w1 + col("x2") * m.w2 +
      col("x3") * m.w3 + col("x4") * m.w4
    val p = lit(1.0) / (lit(1.0) + exp(-z))
    val row = test.agg(
      sum(when((p >= 0.5).cast("int") === col("y"), 1).otherwise(0))
        .as("ok"),
      count(lit(1)).as("n"),
      sum(col("y")).as("pos")).head()
    val ok = row.getLong(0).toDouble
    val n = row.getLong(1).toDouble
    val majority = math.max(row.getLong(2).toDouble,
      n - row.getLong(2)) / n
    assert(ok / n > majority + 0.05,
      s"accuracy ${ok / n} vs majority $majority")
    assert(ok / n > 0.7)
  }

  test("fixed-point training is deterministic across runs") {
    val feat = Classifier.featuresOf(graft.Tables.documents(spark, sf))
    val a = Classifier.train(feat)
    val b = Classifier.train(feat.repartition(7))
    // bit-identical despite a different partitioning: the gradient
    // sums are integers
    assert(a === b)
  }

  test("the gated query scores every token-bearing doc, map-only") {
    val out = Classifier.classifierQ(spark, sf)
    val rows = out.collect()
    assert(rows.nonEmpty)
    // probabilities in [0, 1] at 1e-6 fixed point; pred consistent
    assert(rows.forall { r =>
      val s6 = r.getLong(2)
      s6 >= 0L && s6 <= 1000000L &&
        (r.getInt(3) == 1) == (s6 >= 500000L)
    })
    // no shuffle in the scoring plan: the model side is a broadcast
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"))
  }
}
