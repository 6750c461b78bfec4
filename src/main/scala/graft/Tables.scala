package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Fixture-table loading (TESTDATA.md). One parquet file per table under
  * `sfDir`. Parquet scans are Catalyst sources: column pruning and predicate
  * pushdown reach the scan automatically, so callers just `select`/`filter`
  * and let the optimizer prune (reference did this by hand: queries.mjs:6-7).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  /** events.ts normalization. The fixture generator has shipped this column
    * three ways across rounds: TIMESTAMP(NANOS) (arrives as a nanos-epoch
    * long under `spark.sql.legacy.parquet.nanosAsLong=true`),
    * timestamp[us] without timezone (arrives as TIMESTAMP_NTZ), and plain
    * TIMESTAMP. All are the same instants; every downstream operator
    * (windows, unix_micros, watermarks) is written against TIMESTAMP, so
    * normalize here. Sessions run UTC, so the NTZ→TZ cast is a lossless
    * relabeling, and `ts div 1000` is integer div, NOT `/`: ns epochs
    * exceed double's 2^53 mantissa, so float division drifts by ±1us.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    val raw = load(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case _ => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
