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

  /** Salted sum/count over `keys`. The salt must be uniform but need not be
    * deterministic across runs — partial sums merge to the same totals.
    */
  def saltedSumCount(
      df: DataFrame, keys: Seq[String], valueCol: String,
      salts: Int = 16): DataFrame = {
    val keyCols: Seq[Column] = keys.map(col)
    df.withColumn("__salt", pmod(hash(monotonically_increasing_id()), lit(salts)))
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
    val saltedBig = big.withColumn("__salt",
      pmod(hash(monotonically_increasing_id()), lit(salts)))
    val saltedSmall = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedBig.join(saltedSmall, Seq(key, "__salt")).drop("__salt")
  }
}
