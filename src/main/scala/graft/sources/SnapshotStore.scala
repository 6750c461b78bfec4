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
  * of data. Past `chunkInlineThreshold` carried files, append commits
  * ROLL the carried list into immutable chunk files and reference them
  * as `@chunk:` lines (manifest-of-manifests — the log-structured-format
  * move), so per-commit manifest text is O(batch + files/threshold)
  * however long the table lives; the COMMIT PROTOCOL (immutable data +
  * atomic single-rename publish + monotonic version names) carries
  * unchanged.
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
    * micro-batch) cannot provide. The METADATA plane rolls the carried
    * list into chunk files past `chunkInlineThreshold` names (see the
    * chunked-manifests section), so it is O(batch + files/threshold)
    * text per commit, not O(table files). Readers see no difference: a
    * version is always just a file list. `tags` land in the manifest as
    * `#k=v` lines (see [[versionTags]]) — the hook
    * [[appendBatchExactlyOnce]] uses to make replayed streaming batches
    * idempotent.
    */
  def commitAppend(spark: SparkSession, df: DataFrame, dir: String,
      expectedBase: Option[Long], tags: Map[String, String] = Map.empty): Long =
    commitCore(spark, df, dir, expectedBase, append = true, tags)

  /** A commit staged to the brink of its publish: data files moved under
    * `data/` (unreferenced, invisible), manifest written at its hidden
    * `tmp` name — everything except the atomic `tmp -> fin` metadata op.
    * [[commitCore]] publishes immediately; [[commitGroup]] stages every
    * member table first and lets ONE group-manifest publish decide them
    * all.
    */
  private case class StagedCommit(fs: FileSystem, next: Long, tmp: Path,
      fin: Path, dataDir: Path, moved: Seq[String],
      chunkWritten: Option[Path] = None) {
    /** Discard a staged commit that will never publish (lost race). */
    def abandon(): Unit = {
      fs.delete(tmp, false)
      moved.foreach(n => fs.delete(new Path(dataDir, n), false))
      chunkWritten.foreach(c => fs.delete(c, false))
    }
  }

  private def commitCore(spark: SparkSession, df: DataFrame, dir: String,
      expectedBase: Option[Long], append: Boolean,
      tags: Map[String, String]): Long = {
    val st = stageCore(spark, df, dir, expectedBase, append, tags)
    if (!publishAtomic(st.fs, st.tmp, st.fin)) {
      // the loser's freshly staged files are referenced by nothing and its
      // retry will stage anew — reclaim now rather than leaving one
      // batch-sized orphan set per lost race for vacuum's horizon
      st.abandon()
      throw new SnapshotConflictException(
        s"snapshot commit conflict at $dir: version ${st.next} was " +
          "published concurrently — re-read and retry")
    }
    st.next
  }

  private def stageCore(spark: SparkSession, df: DataFrame, dir: String,
      expectedBase: Option[Long], append: Boolean,
      tags: Map[String, String]): StagedCommit = {
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
    val (carried, chunkWritten) = if (!append) (Nil, None) else {
      val body = base.toSeq.flatMap { v =>
        val lines = manifestLines(fs, new Path(p, ManifestDir), v)
        val stored = org.apache.spark.sql.types.DataType.fromJson(lines.head)
        require(normalized(stored) == normalized(df.schema),
          s"commitAppend schema mismatch at $dir v$v: appended frame's " +
            s"columns/types must match the stored schema (${lines.head})")
        bodyLines(lines)
      }
      // manifest-of-manifests: roll the inline carried names into an
      // immutable chunk file once they cross the threshold, and carry the
      // chunk REFERENCES — per-commit manifest text stays
      // O(batch + files/threshold) however long the table lives. The
      // chunk is unreferenced until the manifest publishes (crash = an
      // orphan reclaimed by vacuum's horizon; a lost race deletes it in
      // abandon()).
      val (refs, inline) = body.partition(_.startsWith(ChunkRef))
      if (inline.size < chunkInlineThreshold) (body, None)
      else {
        val cd = new Path(new Path(p, ManifestDir), ChunkDir)
        fs.mkdirs(cd)
        val cname = f"c-$next%08d-${java.util.UUID.randomUUID}.chunk"
        val cpath = new Path(cd, cname)
        val cout = fs.create(cpath, false)
        try cout.write(inline.mkString("\n").getBytes(StandardCharsets.UTF_8))
        finally cout.close()
        (refs :+ s"$ChunkRef$cname", Some(cpath))
      }
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
    StagedCommit(fs, next, tmp, new Path(md, manifestName(next)), dataDir,
      moved, chunkWritten)
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

  // ---- chunked manifests (manifest-of-manifests) ----
  //
  // An append commit carries the base version's file list forward, so a
  // long-lived ingest table pays O(table files) manifest TEXT per commit
  // even though its data plane is O(batch). Past `chunkInlineThreshold`
  // inline names, the carried list ROLLS into an immutable CHUNK file
  // (`_manifests/chunks/c-*.chunk`, one file name per line) and the
  // manifest references it as one `@chunk:<name>` line — the
  // manifest-of-manifests move every log-structured table format makes.
  // Subsequent appends carry the chunk REFERENCES (O(chunks) lines) plus
  // the inline tail; the tail re-rolls when it crosses the threshold
  // again, so per-commit manifest text is O(batch + files/threshold).
  // Chunks are immutable and shared across versions; vacuum deletes a
  // chunk only when no surviving manifest references it (same orphan
  // horizon as data files).

  private val ChunkDir = "chunks"
  private val ChunkRef = "@chunk:"

  /** Inline carried-file names roll into a chunk past this count.
    * private[graft] var: the chunked-manifest spec lowers it to drive the
    * roll with small batches; production default 1000 keeps manifests a
    * few KB up to ~megafile tables.
    */
  private[graft] var chunkInlineThreshold: Int = 1000

  private def chunkLines(fs: FileSystem, md: Path, name: String): Seq[String] = {
    val in = fs.open(new Path(new Path(md, ChunkDir), name))
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList
    finally in.close()
  }

  /** A manifest's BODY lines (after schema + tags): `@chunk:` references
    * and inline data-file names, unexpanded.
    */
  private def bodyLines(manifest: Seq[String]): Seq[String] =
    manifest.tail.filterNot(_.startsWith("#"))

  /** The full data-file list of a manifest, chunk references expanded. */
  private def dataFileNames(fs: FileSystem, md: Path,
      manifest: Seq[String]): Seq[String] =
    bodyLines(manifest).flatMap { l =>
      if (l.startsWith(ChunkRef)) chunkLines(fs, md, l.stripPrefix(ChunkRef))
      else Seq(l)
    }

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
    val md = new Path(p, ManifestDir)
    val lines = manifestLines(fs, md, v)
    val schema = org.apache.spark.sql.types.DataType.fromJson(lines.head)
      .asInstanceOf[StructType]
    val files = dataFileNames(fs, md, lines).map(n => new Path(new Path(p, DataDir), n).toString)
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
    * race with another writer retries on a fresh base. One stream per
    * table: see the single-writer-stream contract on
    * [[transformBatchExactlyOnce]]. Wire as:
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
    * race with a concurrent writer loses the rename, re-reads the NEW
    * base, re-runs `transform` on it, and retries — the merge is
    * re-derived, never replayed onto a stale base.
    *
    * SINGLE-WRITER-STREAM CONTRACT (same as [[appendBatchExactlyOnce]]):
    * the replay watermark is ONE per-table scalar (the manifest's batch
    * tag), so exactly one STREAM may tag batches into a table. Safe
    * concurrent writers are the NON-TAGGING kind — compaction, vacuum, a
    * batch backfill — which the retry loop handles. A second stream
    * committing its own batch ids into the same table would advance the
    * watermark past this stream's ids and its batches would be silently
    * swallowed by the `lastBatchId >= batchId` probe; fan-in across
    * streams needs one table per stream (or a composite tag) plus a
    * downstream union — which is what the golden-record lifecycle does.
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
    val names = dataFileNames(fs, md, manifestLines(fs, md, base)).toSet
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
    val live = keep.flatMap(v => dataFileNames(fs, md, manifestLines(fs, md, v))).toSet
    val retired = drop.flatMap(v => dataFileNames(fs, md, manifestLines(fs, md, v))).toSet
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
    //
    // GROUP-MEMBER exception (round-17 advice): when this table is a
    // commit-group member, a PUBLISHED group manifest may still reference
    // a member's staged tmp manifest by name — the crash window between
    // group publish and per-table promotion that repairGroup heals from
    // exactly that tmp file. It is committed state, not residue, however
    // old it gets: deleting it makes that group version's member state
    // permanently unrecoverable. Tmp names recorded in ANY surviving
    // group manifest are excluded (promotion makes the tmp meaningless
    // but the group record keeps the name; sparing a handful of tiny
    // already-promoted tmp files is the safe side of the race).
    val groupPinnedTmp: Set[String] = {
      val parent = p.getParent
      if (parent == null) Set.empty
      else {
        val gd = new Path(parent, GroupDir)
        if (!fs.exists(gd)) Set.empty
        else {
          val tbl = p.getName
          fs.listStatus(gd).toSeq
            .flatMap(s => parseGroupVersion(s.getPath.getName))
            .flatMap(g => groupMembers(spark, parent.toString, g).get(tbl))
            .map(_._2).filter(_.nonEmpty).toSet
        }
      }
    }
    val residue =
      fs.listStatus(p).toSeq.filter(s => s.isDirectory &&
          s.getPath.getName.startsWith(".stage-") &&
          s.getModificationTime < horizon) ++
        fs.listStatus(md).toSeq.filter(s => s.isFile &&
          s.getPath.getName.startsWith(".") &&
          s.getPath.getName.contains(".tmp-") &&
          !groupPinnedTmp.contains(s.getPath.getName) &&
          s.getModificationTime < horizon)
    residue.foreach(s => fs.delete(s.getPath, true))
    // chunk retention: a chunk is immutable and SHARED across versions —
    // delete it only when no surviving manifest references it. Same
    // retired-or-horizon rule as data files (a never-referenced chunk may
    // be an in-flight commit's roll; see the orphan note above).
    val cd = new Path(md, ChunkDir)
    if (fs.exists(cd)) {
      def refsOf(vs: Seq[Long]): Set[String] = vs.flatMap(v =>
        bodyLines(manifestLines(fs, md, v))
          .filter(_.startsWith(ChunkRef)).map(_.stripPrefix(ChunkRef))).toSet
      // drop manifests are already deleted; their refs were read above via
      // retired file expansion, so recompute from what SURVIVES
      val liveChunks = refsOf(keep)
      fs.listStatus(cd).toSeq
        .filter(c => c.isFile && !liveChunks.contains(c.getPath.getName) &&
          c.getModificationTime < horizon)
        .foreach(c => fs.delete(c.getPath, false))
    }
    dead.size
  }

  // ------------------------- COMMIT GROUPS -------------------------
  //
  // One ATOMIC commit spanning N tables — the primitive the streaming
  // golden-record lifecycle previously approximated by committing five
  // tables in reverse dependency order and re-deriving on crash. A group
  // lives at `groupDir`, member tables at `groupDir/<table>` as ordinary
  // SnapshotStore tables, and a GROUP MANIFEST (`_group/g%08d.group`)
  // pins (table -> table version) for every member:
  //
  //   - each member's next snapshot is STAGED to the brink (data files
  //     moved, per-table manifest at its hidden tmp name — stageCore);
  //   - ONE publishAtomic of the group manifest is the commit point for
  //     all of them: it records each member's pinned version AND its tmp
  //     manifest name;
  //   - the per-table manifests are then PROMOTED tmp -> public
  //     (best-effort: a crash mid-promotion is repaired by the next
  //     group read or commit, which re-runs the promotion from the tmp
  //     names the group manifest recorded — promotion is idempotent
  //     because publishAtomic refuses an existing destination).
  //
  // Old-or-new across ALL tables, never a mix, holds for GROUP readers
  // ([[readGroup]] resolves the group version first, then reads each
  // member at its pinned version). A plain per-table [[read]] still sees
  // consistent PER-TABLE snapshots (possibly one promotion behind until
  // repair). Tables written through a group must take writes ONLY
  // through [[commitGroup]] (the single-writer-group contract — the
  // group allocates member versions optimistically, and an independent
  // per-table commit would race the promotion names).

  private val GroupDir = "_group"
  private val GroupBatchTag = "batch"
  private def groupManifestName(g: Long) = f"g$g%08d.group"
  private def parseGroupVersion(name: String): Option[Long] =
    if (name.startsWith("g") && name.endsWith(".group"))
      name.stripPrefix("g").stripSuffix(".group").toLongOption
    else None

  /** Highest committed group version (one directory listing). */
  def groupVersion(spark: SparkSession, groupDir: String): Option[Long] = {
    val (fs, p) = fsOf(spark, groupDir)
    val gd = new Path(p, GroupDir)
    if (!fs.exists(gd)) None
    else fs.listStatus(gd).toSeq
      .flatMap(s => parseGroupVersion(s.getPath.getName)).sorted.lastOption
  }

  /** A group manifest's member lines: table -> (version, tmpManifestName).
    * The tmp name is carried for crash repair; it is empty once meaningless
    * (carried-forward members keep the name their writing group recorded).
    */
  def groupMembers(spark: SparkSession, groupDir: String,
      g: Long): Map[String, (Long, String)] = {
    val (fs, p) = fsOf(spark, groupDir)
    val lines = {
      val in = fs.open(new Path(new Path(p, GroupDir), groupManifestName(g)))
      try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList
      finally in.close()
    }
    lines.filterNot(_.startsWith("#")).map { l =>
      val Array(t, v, tmp) = l.split("=", 3)
      t -> (v.toLong, tmp)
    }.toMap
  }

  private def groupTags(spark: SparkSession, groupDir: String,
      g: Long): Map[String, String] = {
    val (fs, p) = fsOf(spark, groupDir)
    val in = fs.open(new Path(new Path(p, GroupDir), groupManifestName(g)))
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
      .takeWhile(_.startsWith("#"))
      .map(_.drop(1).split("=", 2)).collect { case Array(k, v) => k -> v }
      .toMap
    finally in.close()
  }

  // private[graft]: VectorIndexStore.applyTakedownBatch asserts its
  // single-writer id-space contract against it (round-20 advice)
  private[graft] def lastGroupBatchId(spark: SparkSession, groupDir: String): Option[Long] = {
    val (fs, p) = fsOf(spark, groupDir)
    val gd = new Path(p, GroupDir)
    if (!fs.exists(gd)) return None
    fs.listStatus(gd).toSeq
      .flatMap(s => parseGroupVersion(s.getPath.getName)).sorted.reverse
      .iterator
      .flatMap(g => groupTags(spark, groupDir, g).get(GroupBatchTag))
      .flatMap(_.toLongOption).nextOption()
  }

  /** Finish a group version's per-table manifest promotions (idempotent:
    * an already-public manifest is skipped; a missing one is published
    * from the tmp name the group manifest recorded). Called by readers and
    * committers so a crash between group publish and promotion heals on
    * the next touch.
    */
  private def repairGroup(spark: SparkSession, groupDir: String, g: Long): Unit =
    groupMembers(spark, groupDir, g).foreach { case (t, (v, tmpName)) =>
      val (fs, p) = fsOf(spark, s"$groupDir/$t")
      val md = new Path(p, ManifestDir)
      val fin = new Path(md, manifestName(v))
      if (!fs.exists(fin)) {
        val tmp = new Path(md, tmpName)
        if (tmpName.isEmpty || !fs.exists(tmp))
          sys.error(s"commit group $groupDir g$g: member $t v$v has neither " +
            "a public manifest nor its staged tmp — unrecoverable")
        publishAtomic(fs, tmp, fin)
        ()
      }
    }

  /** A member table's write inside one [[commitGroup]]: full-snapshot
    * semantics ([[GroupFull]] — the transform receives the table's current
    * pinned snapshot, None = doesn't exist yet, and returns the complete
    * next one: labels, golden records, any read-modify-write state) or
    * append semantics ([[GroupAppend]] — the staged manifest carries the
    * base file list forward and adds only the batch's files, keeping the
    * data plane O(batch) however large the table: fact logs, band
    * indexes, pair stores).
    */
  sealed trait GroupWrite
  final case class GroupFull(transform: Option[DataFrame] => DataFrame)
    extends GroupWrite
  final case class GroupAppend(batch: DataFrame) extends GroupWrite

  /** One ATOMIC commit across member tables — [[transformBatchExactlyOnce]]
    * lifted to N tables with a single commit point. Members of the previous
    * group NOT written this time are carried forward at their pinned
    * versions, so every group version resolves every member table.
    * `batchId` makes the whole group exactly-once under streaming replay:
    * a replayed id is a no-op returning None — EITHER all N tables
    * advanced, or none (there is no per-table replay window, which is
    * precisely what the reverse-dependency-order workaround could not
    * say).
    *
    * Returns the committed group version (None = replay no-op). A publish
    * race abandons every staged member and retries on the fresh base.
    */
  def commitGroup(spark: SparkSession, groupDir: String,
      writes: Map[String, GroupWrite],
      batchId: Option[Long] = None, maxAttempts: Int = 10): Option[Long] =
    commitGroupImpl(spark, groupDir, writes, batchId, maxAttempts,
      promote = true)

  /** TEST SEAM (spec-only): commit the group manifest but "crash" before
    * any per-table promotion — reproducing the exact window
    * [[repairGroup]] exists for, so the crash matrix can pin old-or-new
    * across ALL members rather than trusting the comment.
    */
  private[graft] def commitGroupCrashBeforePromotion(spark: SparkSession,
      groupDir: String, writes: Map[String, GroupWrite],
      batchId: Option[Long] = None): Option[Long] =
    commitGroupImpl(spark, groupDir, writes, batchId, maxAttempts = 10,
      promote = false)

  private def commitGroupImpl(spark: SparkSession, groupDir: String,
      writes: Map[String, GroupWrite], batchId: Option[Long],
      maxAttempts: Int, promote: Boolean): Option[Long] = {
    require(writes.nonEmpty, "commitGroup: empty writes")
    writes.keys.foreach(t => require(
      !t.contains("=") && !t.contains("\n") && !t.contains("/"),
      s"malformed table name: $t"))
    retryConflicts(maxAttempts, groupDir) {
      val prevG = groupVersion(spark, groupDir)
      // heal any unpromoted members first: bases below must be readable
      prevG.foreach(g => repairGroup(spark, groupDir, g))
      if (batchId.exists(id => lastGroupBatchId(spark, groupDir).exists(_ >= id))) None
      else {
        val prev = prevG.map(g => groupMembers(spark, groupDir, g))
          .getOrElse(Map.empty)
        val nextG = prevG.map(_ + 1).getOrElse(0L)
        // stage every member to the brink — nothing is visible yet
        val staged = writes.toSeq.sortBy(_._1).map { case (t, w) =>
          val dir = s"$groupDir/$t"
          val base = currentVersion(spark, dir)
          val st = w match {
            case GroupFull(transform) =>
              val df = transform(base.map(v => read(spark, dir, Some(v))))
              stageCore(spark, df, dir, base, append = false, Map.empty)
            case GroupAppend(batch) =>
              stageCore(spark, batch, dir, base, append = base.isDefined,
                Map.empty)
          }
          (t, st)
        }
        val (fs, p) = fsOf(spark, groupDir)
        val gd = new Path(p, GroupDir)
        fs.mkdirs(gd)
        val tagLines = batchId.toSeq.map(id => s"#$GroupBatchTag=$id")
        val written = staged.map { case (t, st) =>
          t -> ((st.next, st.tmp.getName))
        }.toMap
        val lines = (prev ++ written).toSeq.sortBy(_._1)
          .map { case (t, (v, tmp)) => s"$t=$v=$tmp" }
        val gtmp = new Path(gd,
          s".${groupManifestName(nextG)}.tmp-${java.util.UUID.randomUUID}")
        val out = fs.create(gtmp, false)
        try out.write((tagLines ++ lines).mkString("\n")
          .getBytes(StandardCharsets.UTF_8))
        finally out.close()
        // THE commit point: all members become the group's truth here
        if (!publishAtomic(fs, gtmp, new Path(gd, groupManifestName(nextG)))) {
          fs.delete(gtmp, false)
          staged.foreach(_._2.abandon())
          throw new SnapshotConflictException(
            s"commit group conflict at $groupDir: g$nextG was published " +
              "concurrently — re-read and retry")
        }
        // promotion (best-effort; crash here is healed by repairGroup)
        if (promote)
          staged.foreach { case (_, st) => publishAtomic(st.fs, st.tmp, st.fin) }
        Some(nextG)
      }
    }
  }

  /** Read member `table` at group version `g` (current when None) — the
    * cross-table-consistent read: every member resolved through ONE group
    * manifest, old-or-new across all of them, never a mix.
    */
  def readGroup(spark: SparkSession, groupDir: String, table: String,
      g: Option[Long] = None): DataFrame = {
    val gv = g.orElse(groupVersion(spark, groupDir)).getOrElse(
      sys.error(s"readGroup: $groupDir has no committed group"))
    repairGroup(spark, groupDir, gv)
    val (v, _) = groupMembers(spark, groupDir, gv).getOrElse(table,
      sys.error(s"readGroup: table $table is not a member of $groupDir g$gv"))
    read(spark, s"$groupDir/$table", Some(v))
  }

  /** Drop group manifests below `keepFromGroup` and vacuum each member
    * table down to the oldest version any SURVIVING group references —
    * the group-level retention policy (time travel across group versions
    * >= keepFromGroup stays intact). Returns data files deleted.
    */
  def vacuumGroup(spark: SparkSession, groupDir: String, keepFromGroup: Long,
      orphanMinAgeMs: Long = 3600000L): Int = {
    val (fs, p) = fsOf(spark, groupDir)
    val gd = new Path(p, GroupDir)
    val groups = fs.listStatus(gd).toSeq
      .flatMap(s => parseGroupVersion(s.getPath.getName)).sorted
    val (drop, keep) = groups.partition(_ < keepFromGroup)
    require(keep.nonEmpty, s"vacuumGroup would drop every group of $groupDir")
    keep.foreach(g => repairGroup(spark, groupDir, g))
    val floors = keep.flatMap(g => groupMembers(spark, groupDir, g).toSeq)
      .groupMapReduce(_._1)(_._2._1)(math.min)
    val deleted = floors.toSeq.sortBy(_._1).map { case (t, v) =>
      vacuum(spark, s"$groupDir/$t", v, orphanMinAgeMs)
    }.sum
    drop.foreach(g => fs.delete(new Path(gd, groupManifestName(g)), false))
    deleted
  }
}
