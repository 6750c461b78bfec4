package graft.sources

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Manifest-based ATOMIC snapshot commits for parquet tables — the gap
  * between "crash-safe" ([[Storage.compact]]'s rename-swap, which has a
  * documented not-found window) and "ACID against concurrent readers",
  * which a 100 TB pipeline hits the moment two jobs touch one table.
  * The reference's store gives single-statement atomicity per engine
  * (`src/index.mjs` batch INSERTs); a directory of parquet files gives
  * none — this supplies the table-level commit those statements rode on.
  *
  * Layout (all inside the table directory):
  * {{{
  *   data/<version>-<uuid>-part-*.parquet   immutable, never rewritten
  *   _manifests/v%08d.manifest              snapshot = schema + file list
  * }}}
  *
  * The COMMIT POINT is one filesystem metadata operation publishing the
  * manifest from its dot-prefixed staging name to `v%08d.manifest` —
  * rename on HDFS (the NameNode refuses an existing destination
  * atomically), hard-link on local filesystems (POSIX rename(2) silently
  * replaces, link(2) refuses — see [[publishAtomic]]) — so:
  *
  *   - a READER resolves "current" by listing `_manifests` and taking the
  *     max version; it then reads EXACTLY that manifest's files. Data
  *     files are immutable and staged files are unreferenced, so every
  *     read is a consistent snapshot — old-or-new, never a mix — with no
  *     reader/writer lock. A reader holding version N is untouched by any
  *     number of later commits (including a compaction rewrite of the
  *     same rows: new files, new manifest, N's files still on disk).
  *   - a WRITER stages data files under `data/` (invisible: no manifest
  *     references them), writes the manifest sideways, and renames. Crash
  *     before the rename leaves staging residue and the OLD version
  *     readable — the [[JdbcExactlyOnce]] stage-then-publish ledger,
  *     applied to storage.
  *   - two writers from the same base race to the same destination name;
  *     exactly one rename wins, the loser gets a conflict error
  *     (optimistic concurrency, no coordinator). `expectedBase` lets a
  *     read-modify-write job assert its base is still current and fail
  *     BEFORE staging work instead of at publish.
  *
  * Version semantics: commits append (v0, v1, …); [[read]] of version N
  * is time travel; [[diffable]] versions stay readable until [[vacuum]]
  * deletes files no surviving manifest references.
  *
  * 100 TB posture: the manifest is O(files-per-snapshot) text read once
  * per query planning, and "current" is one directory listing — no scan
  * of data. At production file counts manifests would be chunked and
  * checkpointed the way log-structured table formats do; the COMMIT
  * PROTOCOL (immutable data + atomic single-rename publish + monotonic
  * version names) is the part that carries unchanged.
  */
/** A commit lost the optimistic race (stale base or raced publish) — the
  * ONLY failure [[SnapshotStore.commitRetry]] retries. A dedicated type,
  * not message matching: a schema-mismatch or I/O error whose message
  * happens to contain "conflict" (e.g. a table path) must propagate, not
  * spin the retry loop.
  */
final class SnapshotConflictException(message: String)
  extends RuntimeException(message)

object SnapshotStore {
  private val ManifestDir = "_manifests"
  private val DataDir = "data"

  private def fsOf(spark: SparkSession, dir: String): (FileSystem, Path) = {
    val p = new Path(dir)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  private def manifestName(v: Long) = f"v$v%08d.manifest"

  private def parseVersion(name: String): Option[Long] =
    if (name.startsWith("v") && name.endsWith(".manifest"))
      name.stripPrefix("v").stripSuffix(".manifest").toLongOption
    else None

  /** Highest committed version, or None for an empty/uninitialized table.
    * One directory listing — never touches data files.
    */
  def currentVersion(spark: SparkSession, dir: String): Option[Long] = {
    val (fs, p) = fsOf(spark, dir)
    val md = new Path(p, ManifestDir)
    if (!fs.exists(md)) None
    else fs.listStatus(md).toSeq
      .flatMap(s => parseVersion(s.getPath.getName)).sorted.lastOption
  }

  /** Commit `df` as the next version (full-snapshot semantics: the new
    * manifest lists only the new files). Returns the committed version.
    *
    * @param expectedBase optimistic-concurrency assertion: fail before
    *        staging if the table has moved past this version (None = the
    *        table must be empty — a create). Callers that derived `df`
    *        from a read of version B pass Some(B); a blind overwrite can
    *        pass [[currentVersion]] directly.
    */
  def commit(spark: SparkSession, df: DataFrame, dir: String,
      expectedBase: Option[Long]): Long =
    commitCore(spark, df, dir, expectedBase, append = false, Map.empty)

  /** APPEND commit: the new version's manifest carries the base version's
    * file list forward and adds only `df`'s freshly staged files — the
    * DATA plane is O(|batch|) however large the table, the ingest shape
    * full-snapshot [[commit]] (which would rewrite the world per
    * micro-batch) cannot provide. The METADATA plane still copies the
    * carried file-name list (O(table files) text per commit) — at
    * production file counts that list gets chunked/checkpointed like any
    * log-structured table format (the header's disclaimer); the commit
    * protocol is what carries unchanged. Readers see no difference: a
    * version is always just a file list. `tags` land in the manifest as
    * `#k=v` lines (see [[versionTags]]) — the hook
    * [[appendBatchExactlyOnce]] uses to make replayed streaming batches
    * idempotent.
    */
  def commitAppend(spark: SparkSession, df: DataFrame, dir: String,
      expectedBase: Option[Long], tags: Map[String, String] = Map.empty): Long =
    commitCore(spark, df, dir, expectedBase, append = true, tags)

  private def commitCore(spark: SparkSession, df: DataFrame, dir: String,
      expectedBase: Option[Long], append: Boolean,
      tags: Map[String, String]): Long = {
    require(tags.keys.forall(k => !k.contains("=") && !k.contains("\n")) &&
      tags.values.forall(v => !v.contains("\n")), s"malformed tags: $tags")
    val (fs, p) = fsOf(spark, dir)
    val base = currentVersion(spark, dir)
    if (base != expectedBase)
      throw new SnapshotConflictException(
        s"snapshot commit conflict at $dir: expected base $expectedBase but " +
          s"current is $base — re-read and retry")
    val next = base.map(_ + 1).getOrElse(0L)
    // the stream's replay watermark is TABLE state, not commit-local: any
    // commit kind (full snapshot, upsert via commitRetry, compaction)
    // inherits it from its base, or vacuum + an untagged head commit
    // would erase it and let a crash-replayed batch double-apply
    val allTags = base.map(v => versionTags(spark, dir, v)
      .filter { case (k, _) => k == BatchTag }).getOrElse(Map.empty) ++ tags
    // carried files (append only): the base manifest's list, verbatim —
    // data files are immutable, so carrying references is free. Schema
    // agreement is modulo nullability/metadata: reading files back marks
    // every column nullable (Spark's file-relation contract), so a
    // compacted version would otherwise refuse all further appends.
    val carried = if (!append) Nil else base.toSeq.flatMap { v =>
      val lines = manifestLines(fs, new Path(p, ManifestDir), v)
      val stored = org.apache.spark.sql.types.DataType.fromJson(lines.head)
      require(normalized(stored) == normalized(df.schema),
        s"commitAppend schema mismatch at $dir v$v: appended frame's " +
          s"columns/types must match the stored schema (${lines.head})")
      dataFileNames(lines)
    }

    // stage: write through Spark into a hidden sibling, then move the part
    // files under data/ with version-unique names. Staged files are
    // UNREFERENCED until the manifest rename — readers cannot see them.
    val stage = new Path(p, s".stage-${java.util.UUID.randomUUID}")
    df.write.parquet(stage.toString)
    val dataDir = new Path(p, DataDir)
    fs.mkdirs(dataDir)
    val moved = fs.listStatus(stage).toSeq
      .filter(s => s.isFile && s.getPath.getName.startsWith("part-"))
      .sortBy(_.getPath.getName)
      .map { s =>
        val name = f"$next%08d-${s.getPath.getName}"
        val dest = new Path(dataDir, name)
        if (!fs.rename(s.getPath, dest))
          sys.error(s"snapshot commit: cannot stage ${s.getPath} -> $name")
        // anchor mtime at MOVE time: rename preserves the write-time
        // mtime, so a multi-hour parquet write would land files already
        // "older" than vacuum's orphan horizon and eligible for deletion
        // before this commit's manifest publishes
        fs.setTimes(dest, System.currentTimeMillis(), -1)
        name
      }
    fs.delete(stage, true)

    // manifest: line 1 = schema JSON (an empty snapshot stays readable),
    // optional `#k=v` tag lines, then one data/ file name per line.
    // Written sideways (dot-prefixed = hidden to readers), published by
    // ONE atomic metadata op — the commit point.
    val md = new Path(p, ManifestDir)
    fs.mkdirs(md)
    val tmp = new Path(md, s".${manifestName(next)}.tmp-${java.util.UUID.randomUUID}")
    val out = fs.create(tmp, false)
    val tagLines = allTags.toSeq.sorted.map { case (k, v) => s"#$k=$v" }
    try out.write((df.schema.json +: (tagLines ++ carried ++ moved))
      .mkString("\n").getBytes(StandardCharsets.UTF_8))
    finally out.close()
    val fin = new Path(md, manifestName(next))
    if (!publishAtomic(fs, tmp, fin)) {
      fs.delete(tmp, false)
      // the loser's freshly staged files are referenced by nothing and its
      // retry will stage anew — reclaim now rather than leaving one
      // batch-sized orphan set per lost race for vacuum's horizon
      moved.foreach(n => fs.delete(new Path(dataDir, n), false))
      throw new SnapshotConflictException(
        s"snapshot commit conflict at $dir: version $next was " +
          "published concurrently — re-read and retry")
    }
    next
  }

  /** Publish `tmp` as `fin` with EXACTLY-ONE-WINS semantics. On HDFS,
    * `rename` refuses an existing destination atomically in the NameNode,
    * so the rename IS the arbiter. On the local filesystem Hadoop's rename
    * bottoms out in POSIX rename(2), which silently REPLACES an existing
    * destination — a check-then-rename there is a TOCTOU hole where the
    * second of two racing committers overwrites the first's published
    * manifest (lost commit). Local paths therefore publish via link(2)
    * (`Files.createLink`): hard-linking to an existing destination fails
    * atomically in the kernel, so exactly one racer's link succeeds.
    * Returns false for the loser (destination already present).
    */
  // private[graft]: SnapshotStoreSpec pins the exactly-one-wins semantics
  private[graft] def publishAtomic(fs: FileSystem, tmp: Path, fin: Path): Boolean = {
    val scheme = Option(fin.toUri.getScheme).getOrElse(
      fs.getUri.getScheme)
    if (scheme == "file") {
      val t = java.nio.file.Paths.get(tmp.toUri.getPath)
      val f = java.nio.file.Paths.get(fin.toUri.getPath)
      try {
        java.nio.file.Files.createLink(f, t)
        // delete tmp through the Hadoop fs, not NIO: LocalFileSystem is a
        // ChecksumFileSystem, and only fs.delete removes the .crc sibling
        // fs.create wrote for the tmp name (NIO would leak one per commit)
        fs.delete(tmp, false)
        true
      } catch {
        case _: java.nio.file.FileAlreadyExistsException => false
      }
    } else !fs.exists(fin) && fs.rename(tmp, fin)
  }

  private def dataFileNames(manifest: Seq[String]): Seq[String] =
    manifest.tail.filterNot(_.startsWith("#"))

  // structural schema identity: nullability and field metadata erased at
  // every nesting level (names + types are what the files actually pin)
  private def normalized(dt: org.apache.spark.sql.types.DataType): org.apache.spark.sql.types.DataType = {
    import org.apache.spark.sql.types._
    dt match {
      case s: StructType => StructType(s.fields.map(f => f.copy(
        dataType = normalized(f.dataType), nullable = true,
        metadata = Metadata.empty)))
      case a: ArrayType =>
        a.copy(elementType = normalized(a.elementType), containsNull = true)
      case m: MapType => m.copy(keyType = normalized(m.keyType),
        valueType = normalized(m.valueType), valueContainsNull = true)
      case other => other
    }
  }

  /** The `#k=v` tags a version was committed with (empty for untagged).
    * Tags sit immediately after the schema line, so this reads the
    * manifest HEAD only — never the (O(files)) file list a watermark
    * probe has no use for.
    */
  def versionTags(spark: SparkSession, dir: String, v: Long): Map[String, String] = {
    val (fs, p) = fsOf(spark, dir)
    val in = fs.open(new Path(new Path(p, ManifestDir), manifestName(v)))
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
      .drop(1).takeWhile(_.startsWith("#"))
      .map(_.drop(1).split("=", 2)).collect { case Array(k, v2) => k -> v2 }
      .toMap
    finally in.close()
  }

  private def manifestLines(fs: FileSystem, md: Path, v: Long): Seq[String] = {
    val in = fs.open(new Path(md, manifestName(v)))
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList
    finally in.close()
  }

  /** Read a PINNED snapshot: version `v`, or current when None. The plan
    * references exactly the manifest's files, so the frame keeps reading
    * version `v` however many commits land afterwards.
    */
  def read(spark: SparkSession, dir: String, version: Option[Long] = None): DataFrame = {
    val (fs, p) = fsOf(spark, dir)
    val v = version.orElse(currentVersion(spark, dir)).getOrElse(
      sys.error(s"snapshot read: $dir has no committed version"))
    val lines = manifestLines(fs, new Path(p, ManifestDir), v)
    val schema = org.apache.spark.sql.types.DataType.fromJson(lines.head)
      .asInstanceOf[StructType]
    val files = dataFileNames(lines).map(n => new Path(new Path(p, DataDir), n).toString)
    if (files.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else spark.read.schema(schema).parquet(files: _*)
  }

  /** Optimistic READ-MODIFY-WRITE: re-read the current version, apply
    * `transform` (None = the table doesn't exist yet — the create case),
    * and commit on that base; on a commit conflict (another writer landed
    * first) re-read and retry, up to `maxAttempts`. This is the loop
    * every "two jobs touch one table" workload actually runs — appenders,
    * upserters, compactors — and it is lock-free: progress is guaranteed
    * because a conflict means someone ELSE committed. Any non-conflict
    * failure propagates immediately.
    */
  def commitRetry(spark: SparkSession, dir: String,
      transform: Option[DataFrame] => DataFrame, maxAttempts: Int = 10): Long =
    retryConflicts(maxAttempts, dir) {
      val base = currentVersion(spark, dir)
      commit(spark, transform(base.map(v => read(spark, dir, Some(v)))), dir, base)
    }

  /** Run `attempt`, retrying ONLY [[SnapshotConflictException]] (a lost
    * optimistic race — progress is guaranteed: a conflict means someone
    * else committed). Every other failure propagates on first occurrence.
    */
  private def retryConflicts[T](maxAttempts: Int, dir: String)(attempt: => T): T = {
    var last: Throwable = null
    (1 to maxAttempts).foreach { _ =>
      try return attempt
      catch { case e: SnapshotConflictException => last = e }
    }
    throw new IllegalStateException(
      s"snapshot commit: $maxAttempts attempts all conflicted at $dir", last)
  }

  private val BatchTag = "stream_batch_id"

  /** The most recent version carrying a `stream_batch_id` tag, walking
    * newest-first (usually the first probe; interleaved non-stream commits
    * — a compactor, a backfill — just walk past).
    */
  private def lastBatchId(spark: SparkSession, dir: String): Option[Long] = {
    val (fs, p) = fsOf(spark, dir)
    val md = new Path(p, ManifestDir)
    if (!fs.exists(md)) return None
    fs.listStatus(md).toSeq
      .flatMap(s => parseVersion(s.getPath.getName)).sorted.reverse
      .iterator
      .flatMap(v => versionTags(spark, dir, v).get(BatchTag))
      .flatMap(_.toLongOption).nextOption()
  }

  /** EXACTLY-ONCE streaming ingest: apply one foreachBatch micro-batch as
    * an append commit, idempotent under Structured Streaming's replay
    * contract (after a crash the sink re-receives the last batch with the
    * SAME batchId). The batch id rides the manifest as a tag — state and
    * data publish in the SAME atomic operation, the [[JdbcExactlyOnce]]
    * ledger idea with the ledger folded INTO the commit — so there is no
    * crash window between "rows landed" and "batch recorded". A replayed
    * (already-applied) batch returns None and writes nothing; a publish
    * race with another writer retries on a fresh base. Wire as:
    * {{{
    *   stream.writeStream.foreachBatch { (b: DataFrame, id: Long) =>
    *     SnapshotStore.appendBatchExactlyOnce(spark, b, dir, id); ()
    *   }
    * }}}
    */
  def appendBatchExactlyOnce(spark: SparkSession, batch: DataFrame,
      dir: String, batchId: Long, maxAttempts: Int = 10): Option[Long] =
    retryConflicts(maxAttempts, dir) {
      if (lastBatchId(spark, dir).exists(_ >= batchId)) None
      else Some(commitAppend(spark, batch, dir, currentVersion(spark, dir),
        Map(BatchTag -> batchId.toString)))
    }

  /** EXACTLY-ONCE streaming MERGE: [[appendBatchExactlyOnce]] covers
    * append-only ingest; this is the read-modify-write shape — upserts,
    * SCD1 dimension maintenance, incremental golden records — where a
    * micro-batch must both ADD and RETIRE rows of the standing table.
    * `transform` receives the current snapshot (None = the table doesn't
    * exist yet — the first batch creates it) and returns the full next
    * snapshot, committed with the batch id riding the manifest: a crash
    * anywhere re-delivers the batch, the watermark probe sees the id
    * already applied, and the replay is a no-op — state and data still
    * publish in ONE atomic operation, so there is no window where the
    * merge landed but the batch is unrecorded (or vice versa). A publish
    * race with a concurrent writer (a compactor, another stream) loses the
    * rename, re-reads the NEW base, re-runs `transform` on it, and
    * retries — the merge is re-derived, never replayed onto a stale base.
    * Wire as:
    * {{{
    *   stream.writeStream.foreachBatch { (b: DataFrame, id: Long) =>
    *     val batch = b.localCheckpoint() // transform may run twice on conflict
    *     SnapshotStore.transformBatchExactlyOnce(spark, dir, id) { cur =>
    *       merge(cur, batch)
    *     }; ()
    *   }
    * }}}
    */
  def transformBatchExactlyOnce(spark: SparkSession, dir: String,
      batchId: Long, maxAttempts: Int = 10)(
      transform: Option[DataFrame] => DataFrame): Option[Long] =
    retryConflicts(maxAttempts, dir) {
      if (lastBatchId(spark, dir).exists(_ >= batchId)) None
      else {
        val base = currentVersion(spark, dir)
        Some(commitCore(spark,
          transform(base.map(v => read(spark, dir, Some(v)))), dir, base,
          append = false, Map(BatchTag -> batchId.toString)))
      }
    }

  /** Small-file compaction as a SNAPSHOT COMMIT — [[Storage.compact]]'s
    * maintenance job made safe against concurrent readers: the current
    * version's rows are rewritten into ceil(bytes/targetBytes) files and
    * published as a NEW version, so a reader pinned on the old version
    * never observes the documented rename-swap not-found window (the old
    * files are immutable until [[vacuum]]'s horizon passes). coalesce,
    * not repartition: gluing files must not pay a shuffle. Returns the
    * committed version. Fails (optimistic conflict) if a writer lands
    * between the read and the publish — compaction retries harmlessly,
    * it owns no data.
    */
  def compactSnapshot(spark: SparkSession, dir: String,
      targetBytes: Long = 128L << 20): Long = {
    val (fs, p) = fsOf(spark, dir)
    val base = currentVersion(spark, dir).getOrElse(
      sys.error(s"compactSnapshot: $dir has no committed version"))
    val md = new Path(p, ManifestDir)
    // size from ONE data/ listing (per-file getFileStatus would be
    // O(files) sequential namenode round-trips at production file counts)
    val names = dataFileNames(manifestLines(fs, md, base)).toSet
    val bytes = fs.listStatus(new Path(p, DataDir)).toSeq
      .filter(s => names.contains(s.getPath.getName)).map(_.getLen).sum
    val n = math.max(1L, (bytes + targetBytes - 1) / targetBytes).toInt
    // tags carry forward: a compactor between stream batches must not
    // erase the stream_batch_id watermark replay idempotence reads
    commitCore(spark, read(spark, dir, Some(base)).coalesce(n), dir,
      Some(base), append = false, versionTags(spark, dir, base))
  }

  /** Delete data files referenced by NO manifest with version >= `keepFrom`
    * (and drop the older manifests) — the cleanup that makes time travel a
    * retention policy instead of a leak. Never touches files a surviving
    * version references, so pinned readers at or above `keepFrom` are
    * safe; callers choose `keepFrom` by their own reader-lease horizon.
    *
    * Files referenced by NO manifest at all are a special case: they are
    * either crash residue (safe to delete) or an IN-FLIGHT commit that has
    * staged its files into data/ but not yet published its manifest —
    * deleting those would make a commit that then succeeds permanently
    * unreadable. Never-referenced files are therefore reclaimed only past
    * `orphanMinAgeMs` (default 1 h — generous against any real staging
    * window), the mtime-horizon rule log-structured table formats use.
    * Returns the number of data files deleted.
    */
  def vacuum(spark: SparkSession, dir: String, keepFrom: Long,
      orphanMinAgeMs: Long = 3600000L): Int = {
    val (fs, p) = fsOf(spark, dir)
    val md = new Path(p, ManifestDir)
    val versions = fs.listStatus(md).toSeq
      .flatMap(s => parseVersion(s.getPath.getName)).sorted
    val (drop, keep) = versions.partition(_ < keepFrom)
    require(keep.nonEmpty, s"vacuum would drop every version of $dir")
    val live = keep.flatMap(v => dataFileNames(manifestLines(fs, md, v))).toSet
    val retired = drop.flatMap(v => dataFileNames(manifestLines(fs, md, v))).toSet
    val horizon = System.currentTimeMillis() - orphanMinAgeMs
    val dataDir = new Path(p, DataDir)
    val dead = fs.listStatus(dataDir).toSeq.filter { s =>
      val n = s.getPath.getName
      s.isFile && !live.contains(n) &&
        // retired = was committed once, its manifest is being dropped now;
        // a pure orphan must age past the in-flight-commit horizon first
        (retired.contains(n) || s.getModificationTime < horizon)
    }
    dead.foreach(s => fs.delete(s.getPath, false))
    drop.foreach(v => fs.delete(new Path(md, manifestName(v)), false))
    // crash residue OUTSIDE data/: a writer that died mid-write leaves a
    // full-size .stage-<uuid> directory at the table root, and one that
    // died between manifest write and publish leaves a hidden .tmp in
    // _manifests — both invisible to readers but unbounded disk if crashes
    // repeat. Same horizon rule: an in-flight commit's stage dir is
    // necessarily younger than it.
    val residue =
      fs.listStatus(p).toSeq.filter(s => s.isDirectory &&
          s.getPath.getName.startsWith(".stage-") &&
          s.getModificationTime < horizon) ++
        fs.listStatus(md).toSeq.filter(s => s.isFile &&
          s.getPath.getName.startsWith(".") &&
          s.getPath.getName.contains(".tmp-") &&
          s.getModificationTime < horizon)
    residue.foreach(s => fs.delete(s.getPath, true))
    dead.size
  }
}
