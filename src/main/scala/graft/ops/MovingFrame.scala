package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, StructField, StructType}

import graft.ops.Checkpoints.TrackedOps

/** Moving-frame HOLISTIC aggregates over LOW-CARDINALITY window partitions
  * — the plan shape Spark's window operator cannot give.
  *
  * `percentile(x, 0.5) OVER (PARTITION BY flag ORDER BY ... ROWS 9
  * PRECEDING)` with a 3-value `flag` puts each flag's ENTIRE run into one
  * window partition = ONE task: a 100 TB table sorts in 3 single-threaded,
  * spilling tasks regardless of cluster size (w5 measured r10 = 6.31 for
  * exactly this — the sort is n·log n per task and 29 of 32 cores idle).
  * The frame only ever needs `frame` CONSECUTIVE rows, though, so the
  * global per-flag order can be a RANGE partitioning instead:
  *
  *   1. `repartitionByRange(part +: order)` + `sortWithinPartitions` —
  *      a parallel range sort over ALL partitions (flag-major order, so
  *      each flag's run is contiguous across partition boundaries);
  *   2. a TAIL pass collects each partition's last `frame − 1`
  *      (flag, value) pairs — numPartitions × (frame−1) tuples, bounded
  *      by the shuffle-partition CONFIG, never the data (the bounded
  *      driver-scalar class, like the Lloyd/BPE collects);
  *   3. the frame pass streams each partition once, seeding each flag's
  *      sliding deque from the broadcast prefix tails, and computes the
  *      interpolated median per row.
  *
  * Boundary correctness: range partitions are non-overlapping in the sort
  * order, so only a partition's LEADING flag-run can extend backwards,
  * and its missing history is exactly the trailing rows of that flag in
  * the preceding partitions' tails (a partition with fewer than frame−1
  * rows contributes ALL its rows to its tail, so concatenating preceding
  * tails in order and keeping the last frame−1 per flag reconstructs the
  * history even across tiny partitions). Flags that first appear inside a
  * partition have no tail entries and correctly start a fresh frame.
  *
  * Determinism: rows tied on the full sort key may land in either order
  * (and either side of a partition boundary), but callers must end
  * `order` in the VALUE column itself — then tied rows are duplicates of
  * that value and any tie order yields the same frame MULTISET, hence
  * the same median (w5's documented contract, unchanged).
  *
  * The median matches `percentile(v, 0.5)` / DuckDB `quantile_cont`
  * exactly: sort the ≤ frame values, pos = 0.5·(n−1),
  * v = v(⌊pos⌋) + (v(⌈pos⌉) − v(⌊pos⌋))·(pos − ⌊pos⌋) — the same IEEE
  * ops on the same doubles.
  *
  * mapPartitions (the documented last resort) is justified here: the
  * built-in window operator structurally CANNOT parallelize a 3-value
  * PARTITION BY, and no composition of declarative ops carries a sliding
  * frame across a shuffle boundary.
  */
object MovingFrame {

  /** Interpolated moving median of `valueCol` (must be DoubleType) over
    * the last `frame` rows per `partCol` group in `orderCols` order.
    * Returns every input column plus `out` (double, unrounded — callers
    * round). `orderCols` must end in `valueCol` (see determinism note).
    */
  def movingMedian(df: DataFrame, partCol: String, orderCols: Seq[String],
      valueCol: String, frame: Int, out: String): DataFrame = {
    require(frame > 0, "frame must be positive")
    require(orderCols.lastOption.contains(valueCol),
      s"orderCols must end in $valueCol so sort-key ties share the value " +
        "(frame multiset invariance)")
    val spark = df.sparkSession
    val sortCols = (partCol +: orderCols).map(col)
    // scale the range-partition count with the INPUT, not just the core
    // count: at 100x the fixture, 32 partitions means 32 sorts of ~2M rows
    // each (spill-bound); following the scan's split count keeps per-task
    // sorts cache-sized while the tail exchange stays partition-count-
    // bounded (a few hundred (flag, value) pairs, never data-sized)
    val nParts = math.max(spark.sparkContext.defaultParallelism,
      df.queryExecution.toRdd.getNumPartitions)
    // pin ONE partitioning for both passes (tail collection and the frame
    // pass must see identical boundaries) and pay the range sort once
    val sorted = df.repartitionByRange(nParts, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
      .trackedCheckpoint()
    val schema = sorted.schema
    val pIdx = schema.fieldIndex(partCol)
    val vIdx = schema.fieldIndex(valueCol)
    require(schema(vIdx).dataType == DoubleType,
      s"$valueCol must be double (cast before calling)")
    val keep = frame - 1
    // pass 1: per-partition tails — (partition, flag, value), bounded by
    // the partition COUNT, not the data. External-row RDD: the flag value
    // doubles as a broadcast map key and must be the same representation
    // in both passes.
    val tails: Array[(Int, Any, Double)] = sorted.rdd
      .mapPartitionsWithIndex { (i, it) =>
        val buf = new scala.collection.mutable.ArrayDeque[(Int, Any, Double)]()
        it.foreach { r =>
          buf.append((i, r.get(pIdx), r.getDouble(vIdx)))
          if (buf.length > keep) buf.removeHead()
        }
        buf.iterator
      }.collect()
    // prefix history per partition: for partition i, the last `keep`
    // values PER FLAG across all tails of partitions < i, in order. ONE
    // forward fold over partitions in index order, maintaining a running
    // per-flag deque capped at `keep` and snapshotting it before folding
    // in partition i's own tail — O(P·flags·frame) driver work total.
    // (The per-`i` re-scan of all prior tails this replaces was
    // O(P²·frame): harmless at a few hundred partitions, but P follows
    // the scan's split count, and a 100 TB input has 10⁵–10⁶ splits —
    // a quadratic driver stall in exactly the regime the operator was
    // re-shaped for.)
    val byPartition = tails.groupBy(_._1)
    val maxPid = if (tails.isEmpty) -1 else tails.map(_._1).max
    val running = scala.collection.mutable.LinkedHashMap
      .empty[Any, scala.collection.mutable.ArrayDeque[Double]]
    val prefix: Map[Int, Map[Any, Seq[Double]]] =
      (0 to maxPid + 1).map { i =>
        val snap = i -> running.map { case (f, d) => f -> d.toSeq }.toMap
        byPartition.getOrElse(i, Array.empty[(Int, Any, Double)])
          .foreach { case (_, flag, v) =>
            val d = running.getOrElseUpdate(flag,
              new scala.collection.mutable.ArrayDeque[Double]())
            d.append(v)
            if (d.length > keep) d.removeHead()
          }
        snap
      }.toMap
    val bPrefix = spark.sparkContext.broadcast(prefix)

    def median(values: Seq[Double]): Double = {
      val s = values.sorted
      val pos = 0.5 * (s.length - 1)
      val lo = math.floor(pos).toInt
      val hi = math.ceil(pos).toInt
      s(lo) + (s(hi) - s(lo)) * (pos - lo)
    }

    val outSchema = StructType(schema.fields :+ StructField(out, DoubleType))
    val rows = sorted.rdd.mapPartitionsWithIndex { (i, it) =>
      val seed = bPrefix.value.getOrElse(i, Map.empty[Any, Seq[Double]])
      val deques = scala.collection.mutable.Map.empty[Any,
        scala.collection.mutable.ArrayDeque[Double]]
      it.map { r =>
        val flag = r.get(pIdx)
        val dq = deques.getOrElseUpdate(flag, {
          val d = new scala.collection.mutable.ArrayDeque[Double]()
          seed.get(flag).foreach(d.appendAll)
          d
        })
        dq.append(r.getDouble(vIdx))
        if (dq.length > frame) dq.removeHead()
        Row.fromSeq(r.toSeq :+ median(dq.toSeq))
      }
    }
    spark.createDataFrame(rows, outSchema)
  }
}
