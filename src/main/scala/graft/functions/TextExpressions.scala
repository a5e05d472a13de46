package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

/** Jaro-Winkler similarity as a NATIVE Catalyst expression — the
  * comparator on the engine's hottest scoring path (the blocker-pair
  * feature table, `matching/MatchingQueries.features`). A Scala UDF
  * here pays the catalyst→external row conversion and breaks the
  * WholeStageCodegen span around the feature projection; this
  * expression stays inside generated code ([[doGenCode]] emits a
  * direct static call on the two UTF8String operands), evaluates
  * null-intolerantly like the built-in `levenshtein`, and reuses the
  * exact [[graft.text.JaroWinkler]] kernel the oracle parity was
  * verified against (DuckDB `jaro_winkler_similarity`, 1528-pair
  * sample, 0 mismatches).
  */
case class JaroWinklerSim(left: Expression, right: Expression)
    extends BinaryExpression {

  // no ExpectsInputTypes: its inputTypes signature names the
  // private[sql] AbstractDataType; both call sites bind string columns
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "jaro_winkler_sim"

  protected override def nullSafeEval(a: Any, b: Any): Any =
    graft.text.JaroWinkler.similarity(
      a.asInstanceOf[UTF8String].toString,
      b.asInstanceOf[UTF8String].toString)

  protected override def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.text.JaroWinkler.similarity($a.toString(), $b.toString())")

  protected override def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Column-API entry points for the native text expressions. */
object TextExpressions {
  def jaroWinkler(a: Column, b: Column): Column =
    Bridge.column(JaroWinklerSim(
      Bridge.expression(a), Bridge.expression(b)))
}
