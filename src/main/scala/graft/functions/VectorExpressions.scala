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

/** Integer dot product over long-array columns — the int8-quantized
  * scoring kernel ([[DotProduct]]'s LongType sibling, same null
  * algebra; exact integer sum, so overflow-free for |x| ≤ 2^15 at any
  * realistic dimension).
  */
case class DotProductL(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true
  override def prettyName: String = "dot_product_l"

  protected override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0L
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += x.getLong(i) * y.getLong(i)
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
        |  long $acc = 0L;
        |  for (int $i = 0; $i < $n; $i++) {
        |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
        |    $acc += $a.getLong($i) * $b.getLong($i);
        |  }
        |  if (!${ev.isNull}) { ${ev.value} = $acc; }
        |}
      """.stripMargin
    })

  protected override def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Squared L2 distance `Σ (x−y)²` — the PQ assignment/ADC kernel
  * ([[DotProduct]] with a different fused arithmetic, same sequential
  * sum order and null algebra).
  */
case class L2Sq(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true
  override def prettyName: String = "l2_sq"

  protected override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val d = x.getDouble(i) - y.getDouble(i)
      acc += d * d
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
      val d = ctx.freshName("d")
      s"""
        |int $n = $a.numElements();
        |if ($n != $b.numElements()) {
        |  ${ev.isNull} = true;
        |} else {
        |  double $acc = 0.0;
        |  for (int $i = 0; $i < $n; $i++) {
        |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
        |    double $d = $a.getDouble($i) - $b.getDouble($i);
        |    $acc += $d * $d;
        |  }
        |  if (!${ev.isNull}) { ${ev.value} = $acc; }
        |}
      """.stripMargin
    })

  protected override def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** MinHash signature in ONE pass: k universal-hash minima over a
  * long-array column. The composed form — k separate
  * `array_min(transform(hs, permute_j))` branches — walks the array k
  * times through interpreted lambdas; this walks it once, updating all
  * k minima per element. Semantics match the composition exactly:
  * null elements are skipped, and an empty (or all-null) input yields
  * k NULL minima (`array_min` of an empty array).
  */
case class MinHashSig(child: Expression, k: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.ArrayType(
    org.apache.spark.sql.types.LongType, containsNull = true)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "minhash_sig"

  private val P = Hashing.MinHashPrime

  protected override def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val n = hs.numElements()
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var any = false
    var i = 0
    while (i < n) {
      if (!hs.isNullAt(i)) {
        any = true
        val hp = hs.getLong(i) % P
        var j = 0
        while (j < k) {
          val v = (hp * (2L * j + 1) + (j.toLong * j + 7)) % P
          if (v < mins(j)) mins(j) = v
          j += 1
        }
      }
      i += 1
    }
    if (any) new org.apache.spark.sql.catalyst.util.GenericArrayData(mins)
    else new org.apache.spark.sql.catalyst.util.GenericArrayData(
      new Array[Any](k))
  }

  protected override def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val gad = classOf[org.apache.spark.sql.catalyst.util.GenericArrayData]
      .getName
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val hp = ctx.freshName("hp")
      val v = ctx.freshName("v")
      val mins = ctx.freshName("mins")
      val any = ctx.freshName("any")
      s"""
        |int $n = $a.numElements();
        |long[] $mins = new long[$k];
        |java.util.Arrays.fill($mins, Long.MAX_VALUE);
        |boolean $any = false;
        |for (int $i = 0; $i < $n; $i++) {
        |  if (!$a.isNullAt($i)) {
        |    $any = true;
        |    long $hp = $a.getLong($i) % ${P}L;
        |    for (int $j = 0; $j < $k; $j++) {
        |      long $v = ($hp * (2L * $j + 1) + ((long) $j * $j + 7)) % ${P}L;
        |      if ($v < $mins[$j]) $mins[$j] = $v;
        |    }
        |  }
        |}
        |${ev.value} = $any ? new $gad($mins) : new $gad(new Object[$k]);
      """.stripMargin
    })
  }

  protected override def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}

/** Column-API entry points for the native vector expressions. */
object VectorExpressions {
  def dot(a: Column, b: Column): Column =
    Bridge.column(DotProduct(Bridge.expression(a), Bridge.expression(b)))

  def dotL(a: Column, b: Column): Column =
    Bridge.column(DotProductL(Bridge.expression(a), Bridge.expression(b)))

  def l2sq(a: Column, b: Column): Column =
    Bridge.column(L2Sq(Bridge.expression(a), Bridge.expression(b)))

  def minhashSig(hashes: Column, k: Int): Column =
    Bridge.column(MinHashSig(Bridge.expression(hashes), k))
}
