package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Measures the division of labor SCALE.md claims between AQE's skew-join
  * handling and the manual salting operators (ops/Skew.scala):
  *
  *   - JOIN skew: AQE detects and splits a skewed sort-merge join at
  *     runtime — no salt needed, and the spec proves the split fires
  *     (`skew=true` in the final adaptive plan) and returns exactly the
  *     salted join's rows.
  *   - AGGREGATION skew: AQE has no rebalance for a skewed groupBy — the
  *     hot key still funnels its whole group through one reducer. The
  *     partition-share measurement below is the mechanism: the salt is
  *     what spreads the hot group, so Skew.saltedSumCount stays necessary.
  */
class SkewSpec extends SparkSpec {

  // ~70% of rows share key 0 — one reducer's worth of hot key. 16 input
  // partitions so the partition-id salt has room to spread (the local[4]
  // default of 4 splits would cap it at 4 distinct salts; real inputs have
  // hundreds)
  private def skewedBig: DataFrame = spark.range(60000).repartition(16).select(
    when(col("id") % 10 < 7, 0L).otherwise(col("id") % 100).as("k"),
    concat(lit("payload_"), col("id")).as("payload"))

  private def dim: DataFrame = spark.range(100).select(
    col("id").as("k"), concat(lit("dim_"), col("id")).as("attr"))

  private val aqeConf = Map(
    "spark.sql.adaptive.enabled" -> "true",
    "spark.sql.adaptive.skewJoin.enabled" -> "true",
    // test-sized thresholds (defaults are 256 MB-scale): a skewed partition
    // is >2x the median and >64 KB; splits aim at 16 KB
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64k",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16k",
    "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
    // skew split only applies to shuffle joins — keep the dim from broadcasting
    "spark.sql.autoBroadcastJoinThreshold" -> "-1")

  private def withAqeConf[T](body: => T): T = {
    val saved = aqeConf.keys.map(k => k -> spark.conf.getOption(k)).toMap
    aqeConf.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("aqe splits the skewed join at runtime — no manual salt needed for joins") {
    withAqeConf {
      val joined = skewedBig.join(dim, "k")
      val rows = joined.count()
      // re-execute to read the FINAL adaptive plan of the same frame
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE did not mark/split the skewed sort-merge join:\n$plan")
      // and the adaptive split returns exactly the salted join's answer
      val salted = graft.ops.Skew.saltedJoin(skewedBig, dim, "k")
      assert(salted.count() == rows)
      def checksum(df: DataFrame): Long = df
        .select(crc32(concat_ws("|", col("k"), col("payload"), col("attr"))).as("c"))
        .agg(sum(col("c"))).head.getLong(0)
      assert(checksum(salted) == checksum(joined),
        "salted and AQE-split joins must return identical rows")
    }
  }

  test("aqe does NOT rebalance aggregation skew — the salted two-phase agg stays necessary") {
    withAqeConf {
      val agg = skewedBig.groupBy("k").agg(sum(length(col("payload"))).as("s"))
      agg.collect()
      val plan = agg.queryExecution.executedPlan.toString
      assert(!plan.contains("skew=true"),
        s"unexpected: AQE claimed to rebalance an aggregation:\n$plan")
      // the mechanism, measured: share of rows the busiest post-shuffle
      // partition carries under the agg's hash distribution
      def maxShare(parts: Column*): Double = {
        val counts = skewedBig.repartition(4, parts: _*)
          .select(spark_partition_id().as("p"))
          .groupBy("p").count().collect().map(_.getLong(1))
        counts.max.toDouble / counts.sum
      }
      val direct = maxShare(col("k"))
      // the same partition-id salt saltedSumCount uses
      val salted = maxShare(col("k"), pmod(spark_partition_id(), lit(16)))
      assert(direct >= 0.7,
        f"fixture should be skewed: busiest partition carries $direct%.2f")
      assert(salted <= direct / 2,
        f"salt should spread the hot group: direct=$direct%.2f salted=$salted%.2f")
    }
  }
}
