package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst squared L2 distance over two double arrays — the PQ
  * codeword-assignment kernel (the [[DotProduct]] argument applied to the
  * other hot vector reduction): `aggregate(zip_with(a, b, (x,y) =>
  * (x-y)*(x-y)), 0d, _+_)` allocates a 64-element intermediate array and
  * evaluates two closures per candidate, and codeword assignment runs it
  * n·m·ksub times per training/encode pass. This compiles to a tight
  * primitive loop inside whole-stage codegen. Summation order is the same
  * sequential fold, so results are bit-identical to the built-in form (and
  * to the oracle's `list_sum(list_transform(range(d), ...))` replay).
  *
  * NULL semantics match the declarative form exactly (round-8 advice —
  * `graft_l2sq` is a registered PUBLIC SQL function, so the semantic must
  * not fork from the form it documents itself as replacing): mismatched
  * lengths → NULL (zip_with pads with null, poisoning the fold) and any
  * NULL element → NULL. Internal call sites always pass equal-length
  * non-null dsub slices, so the hot loop pays only a bitset probe.
  */
case class L2Sq(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val d = x.getDouble(i) - y.getDouble(i)
      s += d * d
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("l2N")
      val acc = ctx.freshName("l2Acc")
      val i = ctx.freshName("l2I")
      val d = ctx.freshName("l2D")
      val bad = ctx.freshName("l2Bad")
      s"""
         |int $n = $x.numElements();
         |if ($n != $y.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  boolean $bad = false;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($x.isNullAt($i) || $y.isNullAt($i)) { $bad = true; break; }
         |    double $d = $x.getDouble($i) - $y.getDouble($i);
         |    $acc += $d * $d;
         |  }
         |  if ($bad) { ${ev.isNull} = true; } else { ${ev.value} = $acc; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): L2Sq =
    copy(left = newLeft, right = newRight)
}

object L2Sq {
  val name = "graft_l2sq"

  /** Shared by [[register]] and [[graft.GraftExtensions]]. */
  val builder: Seq[Expression] => Expression = exprs => {
    require(exprs.length == 2, s"$name expects 2 arguments, got ${exprs.length}")
    val arrD = org.apache.spark.sql.types.ArrayType(DoubleType)
    L2Sq(
      org.apache.spark.sql.catalyst.expressions.Cast(exprs(0), arrD),
      org.apache.spark.sql.catalyst.expressions.Cast(exprs(1), arrD))
  }

  /** Register in the session's function registry (also exposes the function
    * to SQL: `SELECT graft_l2sq(a, b)`). Idempotent.
    */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, builder, "built-in")

  /** Column API (requires [[register]] on the session first). */
  def l2sq(a: Column, b: Column): Column = call_function(name, a, b)
}
