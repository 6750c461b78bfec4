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
    * Hive-partitioned layouts (`k=v` subdirectories instead of flat part
    * files) compact PER LEAF PARTITION — each leaf is its own
    * self-contained flat table (the partition column lives in the
    * directory name, not the files), so each gets its own size pass,
    * rewrite, and swap, and a crash touches at most one partition. A dir
    * with neither part files nor partition subdirectories fails loudly —
    * silently coalescing an unrecognized layout into one file is the
    * pathological rewrite this op exists to prevent.
    *
    * Durability contract (honest version): the rewrite lands in a staging
    * dir first and swaps in via TWO renames (path → .precompact, staging →
    * path), so a crash never leaves a half-written mix — but the swap is
    * NOT atomic: a reader racing it can observe a brief path-not-found
    * window between the renames, and a crash inside that window leaves the
    * data only under the `.precompact` name. The next compact() call
    * detects that state and restores it before proceeding (recovery is
    * automatic, not manual). A true old-or-new atomic flip needs a
    * metastore/manifest pointer, which plain directories don't have.
    * Returns the output file count (summed across partitions).
    */
  def compact(spark: SparkSession, dir: String, targetBytes: Long = 128L << 20,
      sortCols: Seq[String] = Nil): Int = {
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    compactDir(spark, fs, path, new org.apache.hadoop.fs.Path(dir + ".compacting"),
      new org.apache.hadoop.fs.Path(dir + ".precompact"), targetBytes, sortCols)
  }

  /** One directory level of [[compact]]: recovers a crashed swap, then
    * either compacts a flat part-file layout in place or recurses into
    * `k=v` partition subdirectories. Staging/backup names for leaf
    * partitions are DOT-PREFIXED siblings inside the parent (`.k=v.…`):
    * Hadoop/Spark readers ignore hidden paths, so a reader listing the
    * table root mid-compact never mistakes the staging dir for a partition
    * (a visible `k=v.compacting` sibling would parse as a partition value).
    */
  private def compactDir(spark: SparkSession, fs: org.apache.hadoop.fs.FileSystem,
      path: org.apache.hadoop.fs.Path, tmp: org.apache.hadoop.fs.Path,
      old: org.apache.hadoop.fs.Path, targetBytes: Long, sortCols: Seq[String]): Int = {
    // recovery-on-entry: a crash between the two swap renames left the data
    // only under the backup name — restore before doing anything else
    if (!fs.exists(path) && fs.exists(old)) {
      if (!fs.rename(old, path))
        sys.error(s"compact: cannot restore crashed swap $old -> $path")
    }
    val entries = fs.listStatus(path)
    // A streaming file sink's output carries a _spark_metadata transaction
    // log whose entries name the exact part files the sink committed —
    // readers of such a directory resolve files THROUGH the log, and the
    // running sink keeps appending to it. Rewriting the part files would
    // dangle every logged entry (and the swap would drop the log itself),
    // so this is the one layout compact must refuse while it looks
    // perfectly compactable: stop the stream and retire the log first, or
    // compact a downstream table instead. (Plain directories have no such
    // pointer, hence the documented non-atomic-window contract below.)
    if (entries.exists(e => e.isDirectory && e.getPath.getName == "_spark_metadata"))
      sys.error(s"compact: $path is a streaming file-sink output " +
        "(_spark_metadata present) — compacting would dangle the sink's " +
        "transaction log; stop the stream and retire the log first")
    val partFiles = entries.filter(e =>
      e.isFile && e.getPath.getName.startsWith("part-"))
    // visible leaf partitions, plus crashed-swap leaves that exist only as
    // hidden backups (the visible name vanished mid-swap)
    val leafNames = (entries.collect {
      case e if e.isDirectory && e.getPath.getName.contains("=") => e.getPath.getName
    } ++ entries.collect {
      case e if e.isDirectory && e.getPath.getName.startsWith(".") &&
        e.getPath.getName.endsWith(".precompact") &&
        e.getPath.getName.contains("=") =>
        e.getPath.getName.stripPrefix(".").stripSuffix(".precompact")
    }).distinct.sorted
    if (partFiles.nonEmpty) {
      compactFlat(spark, fs, path, tmp, old, partFiles.map(_.getLen).sum,
        targetBytes, sortCols)
    } else if (leafNames.nonEmpty) {
      leafNames.map { name =>
        val leaf = new org.apache.hadoop.fs.Path(path, name)
        // The partition column lives in the directory NAME, not the leaf
        // files — a leaf read never has it, so sorting by it would throw
        // AnalysisException mid-table (after some leaves already swapped).
        // It is constant within a leaf anyway: stripping it preserves the
        // requested order exactly.
        val pcol = name.takeWhile(_ != '=')
        compactDir(spark, fs, leaf,
          new org.apache.hadoop.fs.Path(path, s".$name.compacting"),
          new org.apache.hadoop.fs.Path(path, s".$name.precompact"),
          targetBytes, sortCols.filterNot(_.equalsIgnoreCase(pcol)))
      }.sum
    } else {
      sys.error(s"compact: $path has no part-* files and no k=v partition " +
        "subdirectories — refusing to rewrite an unrecognized layout")
    }
  }

  private def compactFlat(spark: SparkSession, fs: org.apache.hadoop.fs.FileSystem,
      path: org.apache.hadoop.fs.Path, tmp: org.apache.hadoop.fs.Path,
      old: org.apache.hadoop.fs.Path, bytes: Long, targetBytes: Long,
      sortCols: Seq[String]): Int = {
    val n = math.max(1L, (bytes + targetBytes - 1) / targetBytes).toInt
    val df = spark.read.parquet(path.toString)
    val out =
      if (sortCols.isEmpty) df.coalesce(n)
      else df.repartitionByRange(n, sortCols.map(col): _*)
        .sortWithinPartitions(sortCols.map(col): _*)
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
