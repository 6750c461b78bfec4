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
  */
case class L2Sq(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
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
      s"""
         |int $n = Math.min($x.numElements(), $y.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $d = $x.getDouble($i) - $y.getDouble($i);
         |  $acc += $d * $d;
         |}
         |${ev.value} = $acc;
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
