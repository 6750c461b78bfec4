package graft.sources

import org.apache.spark.sql.DataFrame

/** Storage-layout operators — the at-rest half of the scale story.
  *
  * The reference's only layout op is `CLUSTER ... USING pkey`
  * (src/queries.mjs:17, covered by Migration.writeClustered). A 100 TB
  * lakehouse needs two more:
  *
  *   - bucketing: pre-shuffle both sides of a recurring join into the same
  *     bucket layout so the join itself needs NO exchange (verified by plan
  *     in StorageSpec);
  *   - partitioned layout: directory-level pruning so predicates on the
  *     partition column skip whole files before any I/O.
  */
object Storage {

  /** Bucketed, per-bucket-sorted table: repeated joins/aggs on `bucketCol`
    * skip their shuffle. Table metadata lives in the session catalog.
    */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String, buckets: Int): Unit =
    df.write
      .bucketBy(buckets, bucketCol)
      .sortBy(bucketCol)
      .mode("overwrite")
      .saveAsTable(table)

  /** Hive-style directory partitioning: one directory per `partCol` value. */
  def writePartitioned(df: DataFrame, path: String, partCol: String): Unit =
    df.write.partitionBy(partCol).mode("overwrite").parquet(path)
}
