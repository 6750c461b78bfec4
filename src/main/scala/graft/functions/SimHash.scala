package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native 60-bit SimHash over a word array.
  *
  * Semantics are identical to the declarative form in [[graft.dedup.Dedup]]
  * (word hash = first 15 hex chars of md5 as an integer; per-bit majority
  * vote weighted by occurrence) and to the DuckDB oracle — pinned by the
  * d5_simhash oracle check. A native expression because Spark's higher-order
  * functions (transform/aggregate) evaluate their lambdas interpreted, and
  * the declarative form is a 60-pass nested fold per row; this is one pass
  * with primitive arrays (~5x at sf0.1).
  *
  * Codegen emits a static call to [[SimHash.compute]] (the md5 loop
  * dominates; what matters is keeping the enclosing Project inside
  * whole-stage codegen — a CodegenFallback expression would force the
  * whole operator onto the interpreted row-at-a-time path, CodegenSpec).
  */
case class SimHash(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override protected def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(SimHash.compute(input.asInstanceOf[ArrayData]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHash.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash =
    copy(child = newChild)
}

object SimHash {
  val name = "graft_simhash"

  /** The per-row kernel, static so generated code can call it directly. */
  def compute(words: ArrayData): Long = {
    val votes = new Array[Int](60)
    val md = MessageDigest.getInstance("MD5")
    var w = 0
    val n = words.numElements()
    while (w < n) {
      val word = words.get(w, StringType).asInstanceOf[UTF8String]
      if (word != null) {
        md.reset()
        val digest = md.digest(word.getBytes)
        // First 15 hex chars = high 60 bits of the first 8 bytes, dropping
        // the low nibble of byte 7 (hex char 16).
        var h = 0L
        var i = 0
        while (i < 8) { h = (h << 8) | (digest(i) & 0xffL); i += 1 }
        h = h >>> 4 // keep 60 bits = 15 hex chars
        var b = 0
        while (b < 60) {
          votes(b) += (if (((h >> b) & 1L) == 1L) 1 else -1)
          b += 1
        }
      }
      w += 1
    }
    var out = 0L
    var b = 0
    while (b < 60) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  /** Shared by [[register]] and [[graft.GraftExtensions]]. */
  val builder: Seq[Expression] => Expression = exprs => {
    require(exprs.length == 1, s"$name expects 1 argument, got ${exprs.length}")
    SimHash(exprs.head)
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, builder, "built-in")

  /** Column API (requires [[register]] on the session first). */
  def simhash(words: Column): Column = call_function(name, words)
}
