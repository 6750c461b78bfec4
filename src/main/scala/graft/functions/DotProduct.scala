package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst dot product over two double arrays.
  *
  * Why a custom Expression (SURVEY.md §7.4): the built-in formulation
  * `aggregate(zip_with(a, b, _*_), 0d, _+_)` allocates an intermediate
  * 64-element array and evaluates two lambda closures per pair — in an ANN
  * cross/bucket join that runs millions of times per task. This expression
  * compiles to a tight primitive loop inside whole-stage codegen: no
  * allocation, no boxing. Summation order is the same sequential fold, so
  * results are bit-identical to the built-in form (and to the DuckDB
  * oracle's list_inner_product).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  // Inputs must be array<double> — the Column API below is the only
  // entry point and casts are applied upstream (VectorOps.toDouble).
  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      // freshName: this expression can occur several times in one codegen
      // scope (e.g. dot(v,v) for a norm next to dot(a,b)) — fixed local
      // names would collide and fail Janino compilation.
      val n = ctx.freshName("dpN")
      val acc = ctx.freshName("dpAcc")
      val i = ctx.freshName("dpI")
      s"""
         |int $n = Math.min($x.numElements(), $y.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $x.getDouble($i) * $y.getDouble($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object DotProduct {
  val name = "graft_dot"

  /** Shared by [[register]] and [[graft.GraftExtensions]]. */
  val builder: Seq[Expression] => Expression = exprs => {
    require(exprs.length == 2, s"$name expects 2 arguments, got ${exprs.length}")
    // Coerce numeric arrays so SQL callers get analysis-time errors
    // instead of runtime ClassCastExceptions.
    val arrD = org.apache.spark.sql.types.ArrayType(DoubleType)
    DotProduct(
      org.apache.spark.sql.catalyst.expressions.Cast(exprs(0), arrD),
      org.apache.spark.sql.catalyst.expressions.Cast(exprs(1), arrD))
  }

  /** Register in the session's function registry (also exposes the function
    * to SQL: `SELECT graft_dot(a, b)`). Idempotent.
    */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, builder, "built-in")

  /** Column API (requires [[register]] on the session first — the vector
    * query entry points do this).
    */
  def dot_product(a: Column, b: Column): Column = call_function(name, a, b)
}
