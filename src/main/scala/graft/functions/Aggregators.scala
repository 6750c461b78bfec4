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
    */
  class GroupConcatDistinct(sep: String, maxLen: Int)
      extends Aggregator[String, mutable.TreeSet[String], String] {

    override def zero: mutable.TreeSet[String] = mutable.TreeSet.empty[String]

    override def reduce(b: mutable.TreeSet[String], a: String) = {
      if (a != null) b += a
      b
    }

    override def merge(x: mutable.TreeSet[String], y: mutable.TreeSet[String]) = x ++= y

    override def finish(b: mutable.TreeSet[String]): String = {
      val full = b.mkString(sep)
      if (full.length <= maxLen) full else full.substring(0, maxLen)
    }

    // javaSerialization, not kryo: kryo fails to decode TreeSet (its
    // Ordering field doesn't survive the round-trip -> EXPRESSION_DECODING_FAILED).
    override def bufferEncoder: Encoder[mutable.TreeSet[String]] =
      Encoders.javaSerialization[mutable.TreeSet[String]]
    override def outputEncoder: Encoder[String] = Encoders.STRING
  }
}
