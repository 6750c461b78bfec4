package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range join: point x joined to every interval [lo, hi) containing it —
  * another operator Spark has no native strategy for (a raw theta-join
  * becomes BroadcastNestedLoopJoin, i.e. a cross product).
  *
  * Scale shape: quantize the axis into grid cells of `cellSize`; an interval
  * is registered in every cell it overlaps, a point lives in exactly one
  * cell, and the join becomes an EQUI-join on cell id plus an exact residual
  * filter. Cost is |intervals| x avg-span/cellSize replicated rows instead
  * of |points| x |intervals|. No duplicate pairs: each point matches an
  * interval only in the point's single cell.
  */
object RangeJoin {

  /** @param points    must carry `xCol`
    * @param intervals must carry `loCol`, `hiCol` (lo inclusive, hi exclusive)
    * @param cellSize  grid pitch; pick ~= typical interval span
    */
  def grid(
      points: DataFrame, intervals: DataFrame,
      xCol: String, loCol: String, hiCol: String,
      cellSize: Double): DataFrame = {
    val cellOf: Column => Column = c => floor(c / cellSize).cast("bigint")
    val cells = intervals.withColumn("__cell",
      explode(sequence(cellOf(col(loCol)), cellOf(col(hiCol) - lit(1e-9)))))
    points.withColumn("__cell", cellOf(col(xCol)))
      .join(cells, "__cell")
      .filter(col(xCol) >= col(loCol) && col(xCol) < col(hiCol))
      .drop("__cell")
  }
}
