package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

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

  /** [[writeBucketed]] with REPLACE semantics across sessions: `overwrite`
    * only replaces a table the CURRENT catalog knows about, so a fresh
    * in-memory-catalog session whose warehouse directory still holds the
    * previous session's files fails with LOCATION_ALREADY_EXISTS. Drop the
    * catalog entry AND clear the orphaned location first.
    */
  def replaceBucketed(df: DataFrame, table: String, bucketCol: String, buckets: Int): Unit = {
    dropWithOrphanedLocation(df, table)
    writeBucketed(df, table, bucketCol, buckets)
  }

  /** Plain (unbucketed) catalog table with the same REPLACE semantics as
    * [[replaceBucketed]] — for small sidecar tables that ride along with a
    * bucketed index (codebooks, centroid sets): broadcast-sized, so bucket
    * layout buys nothing, but cross-session replacement still needs the
    * orphan-location cleanup.
    */
  def replaceTable(df: DataFrame, table: String): Unit = {
    dropWithOrphanedLocation(df, table)
    df.write.mode("overwrite").saveAsTable(table)
  }

  private def dropWithOrphanedLocation(df: DataFrame, table: String): Unit = {
    val spark = df.sparkSession
    // DROP deletes a managed table's own files; what it can't clear is an
    // ORPHAN directory from a previous session's catalog. Resolve where a
    // new managed table will land via the catalog itself (handles db
    // qualifiers and the current database — a hand-built
    // <warehouse>/<name> path would miss both) and clear that.
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val ident = spark.sessionState.sqlParser.parseTableIdentifier(table)
    val loc = new org.apache.hadoop.fs.Path(
      spark.sessionState.catalog.defaultTablePath(ident))
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
  }

  /** Hive-style directory partitioning: one directory per `partCol` value. */
  def writePartitioned(df: DataFrame, path: String, partCol: String): Unit =
    df.write.partitionBy(partCol).mode("overwrite").parquet(path)

  /** Morton (Z-order) code from two 16-bit quantized dimensions: interleave
    * the bits so file ranges stay tight in BOTH dimensions — parquet min/max
    * skipping then prunes on either predicate, where a single-column sort
    * only prunes on the sort key. Pure bit arithmetic, codegen'd.
    */
  def mortonCode(qx: Column, qy: Column): Column =
    (0 until 16).foldLeft(lit(0L)) { (acc, b) =>
      val xb = shiftrightunsigned(qx.cast("long"), b).bitwiseAND(1)
      val yb = shiftrightunsigned(qy.cast("long"), b).bitwiseAND(1)
      acc
        .bitwiseOR(shiftleft(xb, 2 * b))
        .bitwiseOR(shiftleft(yb, 2 * b + 1))
    }

  /** Z-ordered layout over two numeric dimensions: quantize each to 16 bits
    * against its global range (two scalars collected — a metadata-sized
    * action), range-partition + sort by the interleaved code. The multi-D
    * generalization of Migration.writeClustered; locality proof in
    * StorageSpec (a box predicate touches fewer files than under a
    * single-column sort).
    */
  /** Small-file COMPACTION — the table-maintenance op every long-lived
    * 100 TB lakehouse table needs: streaming sinks and incremental appends
    * shed thousands of KB-sized part files, and each one costs an open +
    * a footer read + a task per query forever after. Rewrites `dir` into
    * ceil(bytes / targetBytes) files:
    *   - `sortCols` empty: `coalesce` — a shuffle-FREE merge of existing
    *     splits (compaction shouldn't pay a shuffle to glue files);
    *   - `sortCols` given: range-partition + in-partition sort, restoring
    *     K4's clustered layout (min/max skipping) in the same rewrite.
    * The rewrite lands in a sibling temp dir first and swaps in by rename,
    * so a crash mid-compact leaves the original intact (never a
    * half-written table); readers racing the swap see old-or-new, not a
    * mix. Returns the output file count.
    */
  def compact(spark: SparkSession, dir: String, targetBytes: Long = 128L << 20,
      sortCols: Seq[String] = Nil): Int = {
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val bytes = fs.listStatus(path).filter(_.isFile)
      .filter(_.getPath.getName.startsWith("part-")).map(_.getLen).sum
    val n = math.max(1L, (bytes + targetBytes - 1) / targetBytes).toInt
    val df = spark.read.parquet(dir)
    val out =
      if (sortCols.isEmpty) df.coalesce(n)
      else df.repartitionByRange(n, sortCols.map(col): _*)
        .sortWithinPartitions(sortCols.map(col): _*)
    val tmp = new org.apache.hadoop.fs.Path(dir + ".compacting")
    val old = new org.apache.hadoop.fs.Path(dir + ".precompact")
    if (fs.exists(tmp)) fs.delete(tmp, true)
    out.write.mode("overwrite").parquet(tmp.toString)
    if (fs.exists(old)) fs.delete(old, true)
    if (!fs.rename(path, old)) sys.error(s"compact: cannot move $path aside")
    if (!fs.rename(tmp, path)) {
      // restore the original before failing — the table must stay readable
      fs.rename(old, path)
      sys.error(s"compact: cannot move $tmp into place; original restored")
    }
    fs.delete(old, true)
    n
  }

  def writeZOrdered(df: DataFrame, cx: String, cy: String, path: String,
      files: Int = 32): Unit = {
    val b = df.agg(
      min(col(cx)).cast("double"), max(col(cx)).cast("double"),
      min(col(cy)).cast("double"), max(col(cy)).cast("double")).collect().head
    def quant(c: Column, lo: Double, hi: Double): Column =
      if (hi <= lo) lit(0)
      else least(floor((c.cast("double") - lo) / (hi - lo) * 65535), lit(65535.0)).cast("int")
    df.withColumn("__z",
        mortonCode(quant(col(cx), b.getDouble(0), b.getDouble(1)),
          quant(col(cy), b.getDouble(2), b.getDouble(3))))
      .repartitionByRange(files, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }
}
