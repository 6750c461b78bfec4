package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** CSV corpus edge — the interchange format every relational migration
  * eventually meets (dumps, spreadsheet exports, legacy loaders). Same
  * design stance as [[JsonlCorpus]]: schema-explicit reads (inference is
  * a silent-drift machine), FAILFAST as the ingest gate, shard count
  * chosen at write time.
  *
  * Dialect: RFC 4180 — fields quoted when needed, embedded quotes DOUBLED
  * (`escape` set to the quote char; Spark's default `\`-escaping is not
  * what other tools emit), embedded newlines kept inside quotes.
  *
  * THE CSV scale trap (pinned in CsvCorpusSpec): reading quoted multiline
  * records requires `multiLine=true`, and then a file cannot be split on
  * record boundaries the parser can't find without scanning — each file
  * is ONE read task regardless of split size, exactly like a gzip shard.
  * Newline-free CSV splits fine without `multiLine`. So: shard multiline
  * exports at WRITE time (the read parallelism is fixed there), or
  * guarantee newline-free fields and read with `multiLine=false`.
  */
object CsvCorpus {

  def write(df: DataFrame, dir: String, shards: Int): Unit =
    df.repartition(shards).write.mode("overwrite")
      .option("header", "true")
      .option("escape", "\"")
      .csv(dir)

  /** Fail-fast, schema-explicit, multiline-capable read (see scale trap
    * above; use only on write-time-sharded exports).
    */
  def readStrict(spark: SparkSession, dir: String, schema: StructType): DataFrame =
    spark.read.schema(schema)
      .option("header", "true")
      .option("escape", "\"")
      .option("multiLine", "true")
      .option("mode", "FAILFAST")
      .csv(dir)

  /** Splittable read for corpora KNOWN newline-free per field — the shape
    * to prefer when the writer can guarantee it.
    */
  def readSplittable(spark: SparkSession, dir: String, schema: StructType): DataFrame =
    spark.read.schema(schema)
      .option("header", "true")
      .option("escape", "\"")
      .option("mode", "FAILFAST")
      .csv(dir)
}
