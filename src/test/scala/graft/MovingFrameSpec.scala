package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.MovingFrame

/** [[MovingFrame.movingMedian]] — the parallel re-shape of a moving-frame
  * holistic window over a low-cardinality PARTITION BY — must equal the
  * window operator row for row, including across range-partition
  * boundaries and partitions smaller than the frame.
  */
class MovingFrameSpec extends SparkSpec {
  import spark.implicits._

  private def windowed(df: DataFrame, frame: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("flag")
      .orderBy(col("k1"), col("k2"), col("v"))
      .rowsBetween(-(frame - 1), 0)
    df.select(col("flag"), col("k1"), col("k2"), col("v"),
      expr("percentile(v, 0.5)").over(w).as("med"))
  }

  private def reshaped(df: DataFrame, frame: Int): DataFrame =
    MovingFrame.movingMedian(df, "flag", Seq("k1", "k2", "v"), "v",
      frame, "med")
      .select(col("flag"), col("k1"), col("k2"), col("v"), col("med"))

  private def canon(df: DataFrame) =
    df.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
      r.getDouble(3), r.getDouble(4))).sortBy(t => (t._1, t._2, t._3, t._4, t._5))

  test("equals the window operator on randomized data with duplicate sort keys") {
    val rnd = new scala.util.Random(18)
    // 3 flags, deliberately duplicated (k1, k2) pairs, values with ties —
    // the w5 fixture pathology in miniature, across 32 range partitions
    val rows = (0 until 5000).map { i =>
      (Seq("A", "B", "C")(rnd.nextInt(3)),
        rnd.nextInt(200).toLong, rnd.nextInt(4).toLong,
        rnd.nextInt(50).toDouble)
    }
    val df = rows.toDF("flag", "k1", "k2", "v")
    assert(canon(reshaped(df, 10)) === canon(windowed(df, 10)))
  }

  test("boundary history survives partitions smaller than the frame") {
    // defaultParallelism at local[32] makes 32 range partitions over only
    // 40 rows of one flag: most partitions hold 1-2 rows, far below the
    // 10-row frame, so nearly every row's history crosses MULTIPLE
    // partition tails — the concatenated-tails reconstruction is the
    // thing under test, not an edge it skips
    val df = (0 until 40).map(i => ("A", i.toLong, 0L, (i % 7).toDouble))
      .toDF("flag", "k1", "k2", "v")
    assert(canon(reshaped(df, 10)) === canon(windowed(df, 10)))
  }

  test("a flag starting mid-partition opens a fresh frame (no cross-flag bleed)") {
    val df = ((0 until 30).map(i => ("A", i.toLong, 0L, i.toDouble)) ++
      (0 until 30).map(i => ("B", i.toLong, 0L, (100 + i).toDouble)))
      .toDF("flag", "k1", "k2", "v")
    val got = canon(reshaped(df, 10))
    assert(got === canon(windowed(df, 10)))
    // B's first row must see only itself: median = its own value
    val bFirst = got.filter(t => t._1 == "B" && t._2 == 0L).head
    assert(bFirst._5 == 100.0)
  }

  test("many more range partitions than rows-per-partition (linear prefix fold)") {
    // force a partition count far above the data's natural split count so
    // the prefix map is built across HUNDREDS of mostly-tiny partitions —
    // the regime the O(P·flags·frame) forward fold replaced the quadratic
    // per-i re-scan in. Values/medians must be identical to the window.
    val rnd = new scala.util.Random(19)
    val rows = (0 until 3000).map { _ =>
      (Seq("A", "B")(rnd.nextInt(2)), rnd.nextInt(400).toLong,
        rnd.nextInt(3).toLong, rnd.nextInt(20).toDouble)
    }
    val df = rows.toDF("flag", "k1", "k2", "v").repartition(257)
    assert(canon(reshaped(df, 10)) === canon(windowed(df, 10)))
  }

  test("interpolated median matches percentile on even and odd frames") {
    val df = (0 until 9).map(i => ("A", i.toLong, 0L, i.toDouble))
      .toDF("flag", "k1", "k2", "v")
    // frame 4 at row 3: values 0..3, pos 1.5 -> 1.5 (interpolated)
    val got = canon(reshaped(df, 4))
    assert(got === canon(windowed(df, 4)))
    assert(got.filter(_._2 == 3L).head._5 == 1.5)
  }
}
