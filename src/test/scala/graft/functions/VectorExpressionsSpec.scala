package graft.functions

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The native dot product against the HOF composition it replaces:
  * bit-identical values (same sequential double sum), the same null
  * algebra (unequal lengths / null elements / null arrays → null), and
  * codegen participation.
  */
class VectorExpressionsSpec extends AnyFunSuite {
  import SparkSpec.spark
  import spark.implicits._

  private def hofDot(a: org.apache.spark.sql.Column,
      b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  test("bit-identical to the HOF composition on random vectors") {
    val df = spark.range(200).select(
      transform(sequence(lit(0), lit(63)),
        i => sin(col("id") * 31 + i)).as("a"),
      transform(sequence(lit(0), lit(63)),
        i => cos(col("id") * 17 + i)).as("b"))
    val out = df.select(
      VectorExpressions.dot(col("a"), col("b")).as("native"),
      hofDot(col("a"), col("b")).as("hof")).collect()
    out.foreach(r => assert(r.getDouble(0) === r.getDouble(1)))
  }

  test("null algebra matches zip_with padding") {
    val df = Seq(
      (Seq(1.0, 2.0), Seq(3.0, 4.0, 5.0)), // unequal → null
      (Seq(1.0, 2.0), Seq(3.0, 4.0))) // 1*3+2*4 = 11
      .toDF("a", "b")
    val out = df.select(
      VectorExpressions.dot(col("a"), col("b")).as("native"),
      hofDot(col("a"), col("b")).as("hof")).collect()
    assert(out(0).isNullAt(0) && out(0).isNullAt(1))
    assert(out(1).getDouble(0) === 11.0 && out(1).getDouble(1) === 11.0)
    val withNullElem = spark.sql(
      "SELECT array(1.0d, CAST(NULL AS DOUBLE)) a, array(2.0d, 3.0d) b")
      .select(VectorExpressions.dot(col("a"), col("b")).as("native"),
        hofDot(col("a"), col("b")).as("hof")).head
    assert(withNullElem.isNullAt(0) && withNullElem.isNullAt(1))
  }

  test("long dot and l2sq match their HOF compositions") {
    val df = Seq((Seq(3L, -2L, 7L), Seq(4L, 5L, -1L))).toDF("a", "b")
    val la = df.select(
      VectorExpressions.dotL(col("a"), col("b")).as("native"),
      aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
        lit(0L), (acc, x) => acc + x).as("hof")).head
    assert(la.getLong(0) === -5L && la.getLong(1) === -5L)
    val dd = Seq((Seq(1.0, 2.0, 4.0), Seq(3.0, 2.0, 1.5))).toDF("a", "b")
    val l2 = dd.select(
      VectorExpressions.l2sq(col("a"), col("b")).as("native"),
      aggregate(zip_with(col("a"), col("b"),
        (x, y) => (x - y) * (x - y)), lit(0.0), (acc, x) => acc + x)
        .as("hof")).head
    assert(l2.getDouble(0) === l2.getDouble(1) && l2.getDouble(0) === 10.25)
    // unequal lengths → null, like zip_with padding
    val un = Seq((Seq(1L), Seq(1L, 2L))).toDF("a", "b")
      .select(VectorExpressions.dotL(col("a"), col("b"))).head
    assert(un.isNullAt(0))
  }

  test("one-pass minhash equals the k array_min(transform) branches") {
    val hs = Seq(
      (1L, Seq(12345L, 98765L, 31415L)),
      (2L, Seq(271828L)),
      (3L, Seq.empty[Long])).toDF("id", "hs")
    val k = 8
    val composed = hs.select(col("id"), array((0 until k).map(j =>
      array_min(transform(col("hs"),
        h => graft.functions.Hashing.permute(h, j)))): _*).as("sig"))
    val native = hs.select(col("id"),
      VectorExpressions.minhashSig(col("hs"), k).as("sig"))
    val c = composed.collect().map(r => r.getLong(0) -> r.getSeq[Any](1))
      .toMap
    val n = native.collect().map(r => r.getLong(0) -> r.getSeq[Any](1))
      .toMap
    assert(n === c)
    // empty input → k null minima, like array_min of an empty array
    assert(n(3L).forall(_ == null) && n(3L).size === k)
  }

  test("participates in WholeStageCodegen") {
    val df = spark.range(50).select(
      transform(sequence(lit(0), lit(7)), i => i.cast("double")).as("a"))
      .select(VectorExpressions.dot(col("a"), col("a")).as("d"))
    val plan = df.queryExecution.executedPlan.toString
    // the dot projection is inside a codegen stage (`*(N) Project`);
    // the HOF `transform` building the input is NOT — the exact
    // boundary this expression removes from the scoring paths
    assert("""\*\(\d+\) Project \[dot_product""".r.findFirstIn(plan).isDefined)
    assert(df.collect().forall(_.getDouble(0) === 140.0))
  }
}
