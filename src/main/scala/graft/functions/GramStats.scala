package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, LongType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass n-gram multiplicity statistics over a document's word
  * array: `(total, top, dup)` = gram count, the most frequent gram's
  * count, and the total count of grams occurring more than once — the
  * Gopher repetition-profile numerators/denominators.
  *
  * Counting gram multiplicities is strictly DOC-LOCAL, but the
  * composed form had to explode (doc, gram) STRING rows and aggregate
  * them twice corpus-wide: per n-gram order one explode + two hash
  * aggregations + a final join — five shuffles moving every gram of
  * the corpus, to compute per-row facts. This expression counts inside
  * the row (a hash map over the grams, built exactly like `concat_ws`
  * builds them — null words skipped), so the repetition profile plans
  * as ONE map-only projection with no exchange at any corpus size.
  */
case class GramStats(child: Expression, n: Int) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("total", LongType, nullable = false),
    StructField("top", LongType, nullable = false),
    StructField("dup", LongType, nullable = false)))
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "gram_stats"

  protected override def nullSafeEval(input: Any): Any =
    GramStatsKernel.compute(input.asInstanceOf[ArrayData], n)

  protected override def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a =>
      s"graft.functions.GramStatsKernel.compute($a, $n)")

  protected override def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}

object GramStats {
  def of(w: Column, n: Int): Column =
    Bridge.column(GramStats(Bridge.expression(w), n))
}

object GramStatsKernel {
  private val Space = UTF8String.fromString(" ")

  /** Static kernel (called from generated code): hash-map gram counts
    * in one pass. Unreachable-short inputs (fewer than n words) report
    * zeros; callers filter them out exactly as the composed form's
    * base filter did.
    */
  def compute(w: ArrayData, n: Int): InternalRow = {
    val m = w.numElements()
    val total = m - n + 1
    if (total <= 0)
      return new GenericInternalRow(Array[Any](0L, 0L, 0L))
    val counts = new java.util.HashMap[UTF8String, Integer](total * 2)
    var i = 0
    while (i < total) {
      val parts = new Array[UTF8String](n)
      var k = 0
      while (k < n) { parts(k) = w.getUTF8String(i + k); k += 1 }
      // concatWs skips nulls — identical to the concat_ws gram builder
      val g = UTF8String.concatWs(Space, parts: _*)
      counts.merge(g, 1, (a, b) => a + b)
      i += 1
    }
    var top = 0L
    var dup = 0L
    val it = counts.values().iterator()
    while (it.hasNext) {
      val c = it.next().intValue()
      if (c > top) top = c
      if (c > 1) dup += c
    }
    new GenericInternalRow(Array[Any](total.toLong, top, dup))
  }
}
