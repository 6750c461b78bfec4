package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** INCREMENTAL near-dup detection — the streaming face of the batch
  * MinHash/LSH pipeline (d3/d6/d7): documents arrive in micro-batches, and
  * candidate pairs are emitted AS THEY BECOME KNOWN instead of re-running
  * the all-data pair generation per refresh.
  *
  * Split of labor (the production shape): signature + band-key computation
  * is STATELESS per-row work on the stream (the same
  * Dedup.withMinhashSig / lshBandKeys expressions run unchanged on a
  * streaming frame); the only STATE is per band key — the set of doc ids
  * seen in that bucket — so a new document pays exactly |bucket| pair
  * emissions, never a corpus rescan. Cluster resolution (connected
  * components) stays a periodic batch pass over the accumulated pair set:
  * transitive closure is global by nature and has no bounded-state
  * streaming form, while pair generation — the expensive stage — is fully
  * incremental. Equivalence to the batch pipeline is pinned in
  * StreamingSpec: accumulated stream pairs == batch candidatePairs, and
  * survivors derived from them == the d7 registry answer.
  *
  * State sizing at 100 TB: state is one member set per band key, total =
  * corpus band rows (docs × bands) — the same cardinality the batch
  * shuffle moves; the r>=2 banding keeps buckets bounded (SCALE.md), and
  * the SKEW GUARD (the streaming mirror of Dedup.candidatePairs') bounds
  * the pathological bucket a real crawl has: past `maxBucket` members a
  * bucket COLLAPSES its state to the running min id and every later
  * arrival emits one star pair against it — state and per-arrival
  * emission both O(1) from then on, connectivity through the bucket
  * preserved (the property cluster resolution needs). Below the cap,
  * behavior is byte-identical to the unguarded form. Two documented
  * trades above the cap: re-delivered members can re-emit their star pair
  * (membership was dropped — downstream `.distinct()` absorbs it, exactly
  * like cross-band duplicates), and the transition batch's earlier
  * members keep their already-emitted all-pairs (a superset of the batch
  * guard's star set — still bucket-internal, still linear from the
  * collapse on).
  *
  * For sliding-corpus semantics [[candidatePairsStreamTtl]] bounds state
  * in TIME too: a bucket expires `ttl` past its last arrival (event-time
  * timeout against the watermark — deterministic under reprocessing,
  * unlike a wall-clock TTL), so state size tracks the live window, not
  * corpus history. Expiry/bounded-state behavior is pinned in
  * StreamingSpec.
  */
object StreamingDedup {
  case class BandRow(band_key: String, doc_id: Long)
  case class TimedBandRow(band_key: String, doc_id: Long, ts: java.sql.Timestamp)
  case class CandPair(a: Long, b: Long)

  /** Per-band-key state: the member set while the bucket is small; once
    * `total` crosses the cap, `members` drops to empty and `minId` alone
    * carries the bucket (the star anchor). `total` keeps the true
    * member count so the overflow decision is monotone.
    */
  case class BucketState(members: Set[Long], minId: Long, total: Long)

  private val emptyState = BucketState(Set.empty, Long.MaxValue, 0L)

  /** Shared emission step: exact all-pairs below the cap, star emission to
    * the running min above it. Returns (pairs, next state).
    */
  private def step(st: BucketState, incoming: Set[Long], maxBucket: Int)
      : (Seq[CandPair], BucketState) = {
    val out = Seq.newBuilder[CandPair]
    // Known-member dedup: below the cap `members` carries everyone; after
    // a collapse only the anchor is still recognizable (minId ∉ members
    // then, and subtracting it is a no-op below the cap where it is one).
    val fresh = ((incoming -- st.members) - st.minId).toArray.sorted
    if (st.total + fresh.length <= maxBucket) {
      // exact path — unchanged semantics below the cap
      var i = 0
      while (i < fresh.length) {
        val n = fresh(i)
        st.members.foreach(o => out += CandPair(math.min(n, o), math.max(n, o)))
        var j = i + 1
        while (j < fresh.length) { out += CandPair(n, fresh(j)); j += 1 }
        i += 1
      }
      val members = st.members ++ fresh
      val mn =
        if (fresh.isEmpty) st.minId
        else if (st.minId == Long.MaxValue) fresh.head
        else math.min(st.minId, fresh.head)
      (out.result(), BucketState(members, mn, st.total + fresh.length))
    } else {
      // overflow: collapse to the star anchor. Membership is gone, so
      // re-deliveries re-emit their star pair — downstream distinct
      // absorbs them like cross-band duplicates.
      var mn = st.minId
      // the transition batch: members already in the set got their exact
      // pairs earlier; arrivals from here connect via the running min
      fresh.foreach { n =>
        if (mn != Long.MaxValue && n != mn)
          out += CandPair(math.min(mn, n), math.max(mn, n))
        mn = if (mn == Long.MaxValue) n else math.min(mn, n)
      }
      (out.result(), BucketState(Set.empty, mn, st.total + fresh.length))
    }
  }

  /** Streaming candidate pairs from a streaming (band_key, doc_id) frame.
    * Emits each cross-batch and within-batch bucket pair once per band
    * (downstream dedups across bands, exactly like the batch
    * candidatePairs' distinct). `maxBucket` is the skew guard's collapse
    * threshold — see the object doc.
    */
  def candidatePairsStream(bandKeys: DataFrame,
      maxBucket: Int = graft.dedup.Dedup.DefaultMaxBucket): Dataset[CandPair] = {
    import bandKeys.sparkSession.implicits._
    bandKeys.select(col("band_key"), col("doc_id")).as[BandRow]
      .groupByKey(_.band_key)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: String, rows: Iterator[BandRow], state: GroupState[BucketState]) =>
          val st = state.getOption.getOrElse(emptyState)
          val (pairs, next) = step(st, rows.map(_.doc_id).toSet, maxBucket)
          if (next.total != st.total) state.update(next)
          pairs.iterator
      }
  }

  /** [[candidatePairsStream]] with a sliding corpus window: band-key state
    * expires `ttlMs` (event time) after the bucket's LAST arrival, so a
    * document only pairs against the live window and state stays bounded
    * by window size instead of growing with corpus history.
    *
    * `bandKeys` must carry the event-time column `ts` WITH a watermark
    * (`withWatermark`) — expiry rides the watermark, which makes it
    * deterministic: replaying the same micro-batches expires the same
    * buckets at the same points, where a processing-time TTL would depend
    * on wall-clock scheduling.
    */
  def candidatePairsStreamTtl(bandKeys: DataFrame, ttlMs: Long,
      maxBucket: Int = graft.dedup.Dedup.DefaultMaxBucket): Dataset[CandPair] = {
    import bandKeys.sparkSession.implicits._
    bandKeys.select(col("band_key"), col("doc_id"), col("ts")).as[TimedBandRow]
      .groupByKey(_.band_key)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (_: String, rows: Iterator[TimedBandRow], state: GroupState[BucketState]) =>
          if (state.hasTimedOut) {
            // the watermark passed this bucket's deadline: drop the state —
            // future arrivals see an empty bucket (the sliding window)
            state.remove()
            Iterator.empty
          } else {
            val st = state.getOption.getOrElse(emptyState)
            var maxTs = Long.MinValue
            val incoming = rows.map { r =>
              maxTs = math.max(maxTs, r.ts.getTime); r.doc_id
            }.toSet
            val (pairs, next) = step(st, incoming, maxBucket)
            if (next.total != st.total) state.update(next)
            if (state.exists)
              // deadline = last arrival + ttl, clamped above the watermark
              // (Spark rejects a timeout at/below it)
              state.setTimeoutTimestamp(
                math.max(maxTs + ttlMs, state.getCurrentWatermarkMs + 1))
            pairs.iterator
          }
      }
  }
}
