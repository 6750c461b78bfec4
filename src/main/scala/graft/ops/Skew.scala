package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation: two-phase salted aggregation.
  *
  * A single hot key funnels its whole group through one reducer; salting
  * spreads it over `salts` partial groups (map-side stays combinable), then
  * a second, tiny aggregation merges partials. Results are identical to the
  * direct groupBy (checked by the sk1 oracle); the cost is one extra
  * exchange over `keys x salts` partial rows — negligible next to a skewed
  * straggler at 100 TB. AQE's skew-join handling covers joins; this covers
  * aggregations, which AQE does not rebalance.
  */
object Skew {

  /** Salted sum/count over `keys`. The salt is derived from the input
    * partition id — DETERMINISTIC under task retry (a random/row-id salt can
    * lose or duplicate partials when a map stage is partially recomputed
    * after reducers have fetched, the SPARK-23207 failure class) and it
    * spreads a hot key across however many partitions carry it, which is
    * exactly the skew being mitigated.
    */
  def saltedSumCount(
      df: DataFrame, keys: Seq[String], valueCol: String,
      salts: Int = 16): DataFrame = {
    val keyCols: Seq[Column] = keys.map(col)
    df.withColumn("__salt", pmod(spark_partition_id(), lit(salts)))
      .groupBy((keyCols :+ col("__salt")): _*)
      .agg(sum(col(valueCol)).as("__psum"), count(lit(1)).as("__pcnt"))
      .groupBy(keyCols: _*)
      .agg(sum(col("__psum")).as("sum_value"), sum(col("__pcnt")).as("n"))
  }

  /** Salted equi-join for a skewed big side: big rows get a random salt,
    * the small side is replicated across all salts, and the join key
    * becomes (key, salt) — a hot key's rows now land on `salts` reducers.
    * Results identical to the plain join (checked by the sk2 oracle);
    * cost is `salts`x replication of the SMALL side only. AQE's skew-join
    * split handles sort-merge cases adaptively; explicit salting also
    * covers hash-partitioned writes and deterministic layouts.
    */
  def saltedJoin(
      big: DataFrame, small: DataFrame, key: String,
      salts: Int = 16): DataFrame = {
    // Partition-id salt: deterministic under retry (see saltedSumCount).
    // A hot key confined to one input partition keeps one salt — acceptable,
    // since a single input partition is already one task's worth of rows.
    val saltedBig = big.withColumn("__salt", pmod(spark_partition_id(), lit(salts)))
    val saltedSmall = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedBig.join(saltedSmall, Seq(key, "__salt")).drop("__salt")
  }
}
