package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Dot product of two double-array columns as a NATIVE Catalyst
  * expression. The composed form — `aggregate(zip_with(a, b, _*_),
  * 0.0, _+_)` — runs through INTERPRETED higher-order functions
  * (lambda evaluation per element, no codegen), and the brute-force
  * cosine paths push queries×corpus×dim element-lambdas through it.
  * This expression generates one tight fused loop.
  *
  * Semantics replicate the HOF composition exactly, element order and
  * all (the double sum is sequential left-to-right from 0.0, so
  * results stay bit-identical to the DuckDB oracle's `list_sum`):
  * unequal lengths → null (zip_with pads with null, null product
  * nullifies the aggregate), a null element on either side → null.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  // can return null from NON-null children (unequal lengths, null
  // elements) — the inherited children-based nullability would let the
  // engine skip the null slot entirely and read garbage
  override def nullable: Boolean = true
  override def prettyName: String = "dot_product"

  protected override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    acc
  }

  protected override def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
        |int $n = $a.numElements();
        |if ($n != $b.numElements()) {
        |  ${ev.isNull} = true;
        |} else {
        |  double $acc = 0.0;
        |  for (int $i = 0; $i < $n; $i++) {
        |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
        |    $acc += $a.getDouble($i) * $b.getDouble($i);
        |  }
        |  if (!${ev.isNull}) { ${ev.value} = $acc; }
        |}
      """.stripMargin
    })

  protected override def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Column-API entry points for the native vector expressions. */
object VectorExpressions {
  def dot(a: Column, b: Column): Column =
    Bridge.column(DotProduct(Bridge.expression(a), Bridge.expression(b)))
}
