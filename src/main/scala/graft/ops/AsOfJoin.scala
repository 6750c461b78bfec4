package graft.ops

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each probe row, attach the latest snapshot row with the
  * same key and snapshot time <= probe time. The classic time-series join
  * (rates, dimension snapshots, feature freshness) that Spark has no native
  * operator for.
  *
  * Composition instead of a custom SparkPlan (preference order SURVEY §7.4 /
  * spark guide: compose built-ins first): tag and union both sides, sort
  * within key by (ts, side), carry the last non-null snapshot value forward
  * with an ignoreNulls window, keep probe rows. ONE shuffle on the key —
  * same exchange count as a hand-built range-merge join, and the window's
  * running `last` is O(rows) per partition, so it scales as a sort-merge
  * pass at 100 TB.
  */
object AsOfJoin {

  /** @param probes     left side; keeps all its columns
    * @param snapshots  right side; must have `key`, `ts`, and `valueCols`
    * @param valueCols  snapshot columns carried onto probe rows (null when
    *                   no snapshot precedes the probe). Null snapshot values
    *                   are treated as absent (carried over by the previous
    *                   non-null one).
    */
  def asof(
      probes: DataFrame, snapshots: DataFrame,
      key: String, ts: String, valueCols: Seq[String]): DataFrame = {
    require(valueCols.nonEmpty, "asof needs at least one snapshot value column")
    val snapTypes = valueCols.map(c => c -> snapshots.schema(c).dataType).toMap

    val probeTagged = valueCols.foldLeft(probes.withColumn("__snap", lit(0))) {
      (d, c) => d.withColumn(c, lit(null).cast(snapTypes(c)))
    }
    val probeOnly = probes.columns.filterNot(c => c == key || c == ts)
    val snapTagged = probeOnly.foldLeft(
      snapshots.select((Seq(col(key), col(ts)) ++ valueCols.map(col)): _*)
        .withColumn("__snap", lit(1))) {
      (d, c) => d.withColumn(c, lit(null).cast(probes.schema(c).dataType))
    }

    // Snapshots sort before probes at equal ts: `<=` semantics.
    val w = Window.partitionBy(col(key))
      .orderBy(col(ts).asc, col("__snap").desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val carried = valueCols.map(c => (last(col(c), ignoreNulls = true).over(w), c))
    carried.foldLeft(probeTagged.unionByName(snapTagged)) {
        case (d, (expr, name)) => d.withColumn(name, expr)
      }
      .filter(col("__snap") === 0)
      .drop("__snap")
  }
}
