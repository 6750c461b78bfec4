package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed custom aggregations (the UDAF surface SURVEY §2.9 reserved).
  *
  * Both participate in Catalyst's two-phase aggregation: reduce() runs
  * map-side per partition, merge() combines partials after the shuffle — so
  * only bounded buffers cross the wire, never the raw groups.
  */
object Aggregators {

  /** Bounded top-k by (score desc, id asc): the scale-right per-key k-best
    * reduction. A window `row_number() <= k` materializes and sorts EVERY
    * row of a key on one reducer; this keeps at most k (score, id) pairs per
    * partition and merges heaps — O(n log k) map-side, k rows shuffled per
    * (key, partition).
    */
  class TopK(k: Int) extends Aggregator[(Double, Long), mutable.PriorityQueue[(Double, Long)], Seq[(Double, Long)]] {
    // PriorityQueue dequeues its MAX; make "max" = the worst kept element
    // (lowest score, then highest id) so exceeding k evicts the worst.
    private def heapOrd: Ordering[(Double, Long)] =
      Ordering.Tuple2(Ordering.Double.TotalOrdering.reverse, Ordering.Long)

    override def zero: mutable.PriorityQueue[(Double, Long)] =
      mutable.PriorityQueue.empty(heapOrd)

    override def reduce(b: mutable.PriorityQueue[(Double, Long)], a: (Double, Long)) = {
      b.enqueue(a)
      if (b.size > k) b.dequeue()
      b
    }

    override def merge(x: mutable.PriorityQueue[(Double, Long)], y: mutable.PriorityQueue[(Double, Long)]) = {
      y.foreach { e => x.enqueue(e); if (x.size > k) x.dequeue() }
      x
    }

    /** Best-first output: (score desc, id asc). */
    override def finish(b: mutable.PriorityQueue[(Double, Long)]): Seq[(Double, Long)] =
      b.toSeq.sortBy { case (s, i) => (-s, i) }

    override def bufferEncoder: Encoder[mutable.PriorityQueue[(Double, Long)]] =
      Encoders.kryo[mutable.PriorityQueue[(Double, Long)]]
    override def outputEncoder: Encoder[Seq[(Double, Long)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
  }

  /** MySQL GROUP_CONCAT(DISTINCT ... SEPARATOR sep) with
    * group_concat_max_len-style truncation (SURVEY §2.6 A1). Documented
    * deviation: MySQL's budget is BYTES; this truncates at `maxLen`
    * CHARACTERS (matching engine-portable substr semantics — on multibyte
    * text the byte count can exceed maxLen). Elements deduped and sorted
    * for cross-run determinism (the reference's order is
    * implementation-defined and semantically irrelevant — the string is
    * immediately re-split, src/index.mjs:43).
    *
    * Buffer = a SORTED, DISTINCT Seq[String] under the product/array
    * encoder: partials cross the shuffle as a plain Catalyst string array
    * (earlier revisions used a TreeSet, which kryo cannot decode in Spark
    * 4.1 and Java serialization ships with ObjectOutputStream overhead per
    * partial). Dedup happens map-side on every insert, so a partial never
    * exceeds the group's distinct-value count.
    */
  class GroupConcatDistinct(sep: String, maxLen: Int)
      extends Aggregator[String, Seq[String], String] {

    override def zero: Seq[String] = Vector.empty

    /** Binary-search insertion index of `a` in sorted `b` (lower bound). */
    private def lowerBound(b: Seq[String], a: String): Int = {
      var lo = 0
      var hi = b.length
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (b(mid).compareTo(a) < 0) lo = mid + 1 else hi = mid
      }
      lo
    }

    override def reduce(b: Seq[String], a: String): Seq[String] =
      if (a == null) b
      else {
        val i = lowerBound(b, a)
        if (i < b.length && b(i) == a) b
        else (b.take(i) :+ a) ++ b.drop(i)
      }

    /** Classic sorted-distinct two-pointer merge. */
    override def merge(x: Seq[String], y: Seq[String]): Seq[String] =
      if (x.isEmpty) y
      else if (y.isEmpty) x
      else {
        val out = Vector.newBuilder[String]
        var i = 0
        var j = 0
        while (i < x.length && j < y.length) {
          val c = x(i).compareTo(y(j))
          if (c < 0) { out += x(i); i += 1 }
          else if (c > 0) { out += y(j); j += 1 }
          else { out += x(i); i += 1; j += 1 }
        }
        while (i < x.length) { out += x(i); i += 1 }
        while (j < y.length) { out += y(j); j += 1 }
        out.result()
      }

    override def finish(b: Seq[String]): String = {
      val full = b.mkString(sep)
      if (full.length <= maxLen) full else full.substring(0, maxLen)
    }

    override def bufferEncoder: Encoder[Seq[String]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[String]]()
    override def outputEncoder: Encoder[String] = Encoders.STRING
  }
}
