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
  /** events.ts is TIMESTAMP(NANOS) in parquet, which Spark lacks; with
    * `spark.sql.legacy.parquet.nanosAsLong=true` it arrives as a nanos-epoch
    * long and is converted here (fixture values are exact microseconds, so
    * truncation is lossless — see TESTDATA probe).
    */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.{expr, timestamp_micros}
    import org.apache.spark.sql.types.LongType
    val raw = load(s, d, "events")
    // Integer `div`, NOT `/`: ns epochs exceed double's 2^53 mantissa, so
    // float division drifts by ±1us.
    if (raw.schema("ts").dataType == LongType)
      raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else raw
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
