package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native winnowing fingerprint over a WORD array: build word `shingleN`-gram
  * shingles, hash each (first 15 md5 hex chars), take the minimum hash of
  * every length-`window` sliding window (monotonic deque, O(n)), return the
  * sorted distinct minima joined by '|'.
  *
  * Semantics identical to the declarative tx5 form
  * (`transform(sequence(...), i -> array_min(slice(...)))` over
  * `Dedup.shingles`) and its DuckDB oracle. Shingling is fused in because it
  * was the actual hot spot: building millions of intermediate shingle
  * strings through interpreted transform/concat_ws lambdas cost more than
  * the window scan itself.
  */
case class Winnow(child: Expression, shingleN: Int, window: Int)
    extends UnaryExpression {

  override def dataType: DataType = StringType

  override protected def nullSafeEval(input: Any): Any =
    Winnow.compute(input.asInstanceOf[ArrayData], shingleN, window)

  // Static-call codegen: the md5 + deque kernel dominates; what matters is
  // keeping the enclosing Project inside whole-stage codegen (CodegenSpec —
  // a CodegenFallback expression forces the whole operator onto the
  // interpreted row-at-a-time path).
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.Winnow.compute($c, $shingleN, $window)")

  override protected def withNewChildInternal(newChild: Expression): Winnow =
    copy(child = newChild)
}

object Winnow {
  val name = "graft_winnow"

  /** The per-row kernel, static so generated code can call it directly. */
  def compute(words: ArrayData, shingleN: Int, window: Int): UTF8String = {
    val nWords = words.numElements()
    val n = nWords - shingleN + 1 // shingle count
    if (n < window) return UTF8String.fromString("")
    val md = MessageDigest.getInstance("MD5")
    val hex = "0123456789abcdef".toCharArray
    val hashes = new Array[String](n)
    val sbShingle = new java.lang.StringBuilder(64)
    var i = 0
    while (i < n) {
      sbShingle.setLength(0)
      var j = 0
      while (j < shingleN) {
        if (j > 0) sbShingle.append(' ')
        val w = words.get(i + j, StringType).asInstanceOf[UTF8String]
        if (w != null) sbShingle.append(w.toString)
        j += 1
      }
      md.reset()
      val dg = md.digest(sbShingle.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      // first 15 hex chars = first 7 bytes + high nibble of byte 8
      val sb = new java.lang.StringBuilder(15)
      var b = 0
      while (b < 7) {
        sb.append(hex((dg(b) >> 4) & 0xf)); sb.append(hex(dg(b) & 0xf)); b += 1
      }
      sb.append(hex((dg(7) >> 4) & 0xf))
      hashes(i) = sb.toString
      i += 1
    }
    // monotonic deque of indices; front = min of current window
    val mins = new java.util.TreeSet[String]()
    val deque = new java.util.ArrayDeque[Int]()
    i = 0
    while (i < n) {
      while (!deque.isEmpty && hashes(deque.peekLast()) >= hashes(i)) deque.pollLast()
      deque.addLast(i)
      if (deque.peekFirst() <= i - window) deque.pollFirst()
      if (i >= window - 1) mins.add(hashes(deque.peekFirst()))
      i += 1
    }
    UTF8String.fromString(String.join("|", mins))
  }

  /** Shared by [[register]] and [[graft.GraftExtensions]]. */
  val builder: Seq[Expression] => Expression = exprs => {
    require(exprs.length == 3,
      s"$name expects (words, shingleN, window), got ${exprs.length} args")
    def intLit(e: Expression, what: String): Int = e match {
      case Literal(v: Int, _) => v
      case other => throw new IllegalArgumentException(
        s"$name $what must be an integer literal, got $other")
    }
    val sn = intLit(exprs(1), "shingleN")
    val w = intLit(exprs(2), "window")
    require(sn >= 1 && w >= 1, s"$name shingleN/window must be >= 1, got $sn/$w")
    Winnow(exprs.head, sn, w)
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, builder, "built-in")

  def winnow(words: Column, shingleN: Int, window: Int): Column =
    call_function(name, words, lit(shingleN), lit(window))
}
