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

  /** MINIMUM-RESOLUTION CONTRACT (both [[grid]] and [[overlap]]): the
    * half-open upper bound is realized by registering an interval only up
    * to `cellOf(hi − 1e-9)` — an ABSOLUTE epsilon. Callers must therefore
    * feed data whose granularity is ≫ 1e-9 (dates, timestamps, prices,
    * integer axes all qualify by many orders of magnitude): an interval or
    * overlap narrower than 1e-9, or a `lo` within 1e-9 below another
    * side's `hi` across a cell boundary, is treated as empty and dropped.
    * A relative epsilon would need to ride into every SQL oracle replaying
    * the cell registration; the absolute form is what the rj1/iv1 oracles
    * pin, and the contract here is the price of that exactness.
    */
  val Epsilon = 1e-9

  /** @param points    must carry `xCol`
    * @param intervals must carry `loCol`, `hiCol` (lo inclusive, hi exclusive)
    * @param cellSize  grid pitch; pick ~= typical interval span (must be > 0
    *                  and ≫ [[Epsilon]] — see the resolution contract above)
    */
  def grid(
      points: DataFrame, intervals: DataFrame,
      xCol: String, loCol: String, hiCol: String,
      cellSize: Double): DataFrame = {
    require(cellSize > 0, s"cellSize must be > 0, got $cellSize")
    val cellOf: Column => Column = c => floor(c / cellSize).cast("bigint")
    val cells = intervals.withColumn("__cell",
      explode(sequence(cellOf(col(loCol)), cellOf(col(hiCol) - lit(Epsilon)))))
    points.withColumn("__cell", cellOf(col(xCol)))
      .join(cells, "__cell")
      .filter(col(xCol) >= col(loCol) && col(xCol) < col(hiCol))
      .drop("__cell")
  }

  /** INTERVAL-OVERLAP join: every pair of intervals `[aLo, aHi)` × `[bLo,
    * bHi)` with a non-empty intersection — the two-sided generalization of
    * [[grid]] (sessions × promotion windows, shifts × incidents, any
    * temporal-overlap question; subject to the same resolution contract —
    * see [[Epsilon]]). Same grid recipe, both sides registered in
    * every cell they span; a pair sharing several cells is emitted EXACTLY
    * ONCE without a distinct: only the cell containing the overlap's start
    * (`greatest(aLo, bLo)` — a cell both sides registered by construction)
    * emits it, so the dedup is a map-side filter, never a shuffle.
    *
    * Scale shape: each side costs |rows| × avg-span/cellSize replicated
    * rows, the join is an equi-join on cell id, and the residual
    * overlap/start-cell filters are map-side. Column names must be
    * disjoint across the two inputs (the usual join contract).
    */
  def overlap(
      a: DataFrame, b: DataFrame,
      aLo: String, aHi: String, bLo: String, bHi: String,
      cellSize: Double): DataFrame = {
    require(cellSize > 0, s"cellSize must be > 0, got $cellSize")
    val cellOf: Column => Column = c => floor(c / cellSize).cast("bigint")
    // empty intervals ([x, x) or inverted) are dropped up front: the
    // standard overlap predicate lo1 < hi2 AND lo2 < hi1 assumes non-empty
    // inputs — fed an empty [5, 5) it happily "overlaps" [4, 6), and the
    // cell sequence would even run BACKWARDS (sequence(c, c-1) descends).
    // An empty set intersects nothing; make that true by construction.
    def spanned(df: DataFrame, lo: String, hi: String) =
      df.filter(col(lo) < col(hi)).withColumn("__cell",
        explode(sequence(cellOf(col(lo)), cellOf(col(hi) - lit(Epsilon)))))
    spanned(a, aLo, aHi).join(spanned(b, bLo, bHi), "__cell")
      .filter(col(aLo) < col(bHi) && col(bLo) < col(aHi))
      .filter(col("__cell") === greatest(cellOf(col(aLo)), cellOf(col(bLo))))
      .drop("__cell")
  }
}
