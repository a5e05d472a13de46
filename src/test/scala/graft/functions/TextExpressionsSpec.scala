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

  // reference reimplementations of the FORMER Scala-UDF kernels the
  // native JaroPartsSim/OfacSim expressions replaced (r14) — semantics
  // parity is asserted against these, token list by token list
  private def jaroPartsRef(q: Seq[String], r: Seq[String]): Double = {
    val qd = q.distinct
    val rd = r.distinct
    if (qd.isEmpty) 0.0
    else {
      val sims = qd.map { p =>
        rd.map(o => JaroWinkler.similarity(p, o))
          .filter(_ > 0.5).maxOption.getOrElse(0.0)
      }
      sims.sum / math.max(1.0, sims.length.toDouble)
    }
  }

  private def ofacRef(q: Seq[String], r: Seq[String]): Double = {
    val qn = q.mkString(" ")
    val rn = r.mkString(" ")
    val whole =
      if (qn.isEmpty || rn.isEmpty || qn.head != rn.head) 0.0
      else JaroWinkler.simmetrics(qn, rn)
    val kept0 = q.filter(_.length > 2)
    val kept = if (kept0.nonEmpty) kept0 else q
    val per =
      if (kept.isEmpty || r.isEmpty) 0.0
      else kept.map { p =>
        val best = r.map(o => JaroWinkler.simmetrics(p, o))
          .maxOption.getOrElse(0.0)
        if (best >= 0.5) best else 0.0
      }.sum / kept.length
    math.max(whole, per)
  }

  private val tokenPairs: Seq[(Seq[String], Seq[String])] = Seq(
    (Seq("john", "smith"), Seq("jon", "smith")),
    (Seq("acme", "corp", "ltd"), Seq("acme", "corporation")),
    (Seq.empty[String], Seq("x")),
    (Seq("ab"), Seq("ab")), // all tokens ≤ 2 chars: the kept0 fallback
    (Seq("dup", "dup", "co"), Seq("dup", "company")), // distinct matters
    (Seq("zz"), Seq.empty[String]),
    (Seq("maria", "de", "la", "cruz"), Seq("maria", "cruz", "extra")))

  test("JaroPartsSim and OfacSim match the former UDF kernels exactly") {
    val df = tokenPairs.toDF("q", "r")
      .select(col("q"), col("r"),
        TextExpressions.jaroParts(col("q"), col("r")).as("jp"),
        TextExpressions.ofacName(col("q"), col("r")).as("of"))
    df.collect().foreach { row =>
      val q = row.getSeq[String](0)
      val r = row.getSeq[String](1)
      assert(row.getDouble(2) === jaroPartsRef(q, r),
        s"jaroParts($q, $r)")
      assert(row.getDouble(3) === ofacRef(q, r), s"ofac($q, $r)")
    }
    // null arrays yield null (nullIntolerant), not a crash
    val n = Seq((Some(Seq("a")), None: Option[Seq[String]]))
      .toDF("q", "r")
      .select(TextExpressions.jaroParts(col("q"), col("r")).as("jp"))
      .collect()
    assert(n(0).isNullAt(0))
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
