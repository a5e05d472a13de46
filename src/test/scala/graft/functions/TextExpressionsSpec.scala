package graft.functions

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.text.JaroWinkler

/** The native Jaro-Winkler expression: value parity with the Scala
  * kernel (both codegen and interpreted paths), null handling, and the
  * codegen claim itself — the feature projection must stay inside one
  * WholeStageCodegen span instead of breaking at a UDF boundary.
  */
class TextExpressionsSpec extends AnyFunSuite {
  import SparkSpec.spark
  import spark.implicits._

  private val pairs = Seq(
    ("martha", "marhta"), ("dixon", "dicksonx"), ("", "abc"),
    ("jones", "johnson"), ("identical", "identical"),
    ("a", "b"), ("винстон", "winston"))

  test("matches the Scala kernel on the sample pairs") {
    val df = pairs.toDF("a", "b")
      .select(col("a"), col("b"),
        TextExpressions.jaroWinkler(col("a"), col("b")).as("jw"))
    df.collect().foreach { r =>
      assert(r.getDouble(2) === JaroWinkler.similarity(
        r.getString(0), r.getString(1)))
    }
  }

  test("null in either operand yields null, not a crash") {
    val df = Seq((Some("abc"), None: Option[String]),
      (None: Option[String], Some("abc")),
      (Some("abc"), Some("abd"))).toDF("a", "b")
      .select(TextExpressions.jaroWinkler(col("a"), col("b")).as("jw"))
    val out = df.collect()
    assert(out(0).isNullAt(0) && out(1).isNullAt(0))
    assert(out(2).getDouble(0) > 0.8)
  }

  test("the projection stays inside WholeStageCodegen") {
    // a non-local source: literal input gets constant-folded into a
    // LocalTableScan before the codegen question even arises
    val df = spark.range(100)
      .select(concat(lit("martha"), col("id")).as("a"),
        concat(lit("marhta"), col("id")).as("b"))
      .select(TextExpressions.jaroWinkler(col("a"), col("b")).as("jw"))
    val plan = df.queryExecution.executedPlan.toString
    // `*(1)` is the WholeStageCodegen marker in the simple plan string —
    // the expression participates in the generated stage instead of
    // forcing an eval boundary
    assert(plan.contains("*(1) Project"))
    assert(plan.contains("jaro_winkler_sim"))
    assert(!plan.contains("ScalaUDF"))
    // and the generated path computes the same values as eval
    val vals = df.collect().map(_.getDouble(0))
    assert(vals.head === JaroWinkler.similarity("martha0", "marhta0"))
  }
}
