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
  * State sizing at 100 TB: state is one Set[Long] per band key, total =
  * corpus band rows (docs × bands) — the same cardinality the batch
  * shuffle moves; the r>=2 banding keeps buckets bounded (SCALE.md). For
  * sliding-corpus semantics [[candidatePairsStreamTtl]] bounds that state
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

  /** Streaming candidate pairs from a streaming (band_key, doc_id) frame.
    * Emits each cross-batch and within-batch bucket pair once per band
    * (downstream dedups across bands, exactly like the batch
    * candidatePairs' distinct).
    */
  def candidatePairsStream(bandKeys: DataFrame): Dataset[CandPair] = {
    import bandKeys.sparkSession.implicits._
    bandKeys.select(col("band_key"), col("doc_id")).as[BandRow]
      .groupByKey(_.band_key)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: String, rows: Iterator[BandRow], state: GroupState[Set[Long]]) =>
          val seen = state.getOption.getOrElse(Set.empty[Long])
          // sorted for deterministic emission order; Set dedups re-deliveries
          val fresh = (rows.map(_.doc_id).toSet -- seen).toArray.sorted
          val out = Seq.newBuilder[CandPair]
          var i = 0
          while (i < fresh.length) {
            val n = fresh(i)
            seen.foreach(o => out += CandPair(math.min(n, o), math.max(n, o)))
            var j = i + 1
            while (j < fresh.length) { out += CandPair(n, fresh(j)); j += 1 }
            i += 1
          }
          if (fresh.nonEmpty) state.update(seen ++ fresh)
          out.result().iterator
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
  def candidatePairsStreamTtl(bandKeys: DataFrame, ttlMs: Long): Dataset[CandPair] = {
    import bandKeys.sparkSession.implicits._
    bandKeys.select(col("band_key"), col("doc_id"), col("ts")).as[TimedBandRow]
      .groupByKey(_.band_key)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (_: String, rows: Iterator[TimedBandRow], state: GroupState[Set[Long]]) =>
          if (state.hasTimedOut) {
            // the watermark passed this bucket's deadline: drop the state —
            // future arrivals see an empty bucket (the sliding window)
            state.remove()
            Iterator.empty
          } else {
            val seen = state.getOption.getOrElse(Set.empty[Long])
            var maxTs = Long.MinValue
            val incoming = rows.map { r =>
              maxTs = math.max(maxTs, r.ts.getTime); r.doc_id
            }.toSet
            val fresh = (incoming -- seen).toArray.sorted
            val out = Seq.newBuilder[CandPair]
            var i = 0
            while (i < fresh.length) {
              val n = fresh(i)
              seen.foreach(o => out += CandPair(math.min(n, o), math.max(n, o)))
              var j = i + 1
              while (j < fresh.length) { out += CandPair(n, fresh(j)); j += 1 }
              i += 1
            }
            if (fresh.nonEmpty) state.update(seen ++ fresh)
            if (state.exists)
              // deadline = last arrival + ttl, clamped above the watermark
              // (Spark rejects a timeout at/below it)
              state.setTimeoutTimestamp(
                math.max(maxTs + ttlMs, state.getCurrentWatermarkMs + 1))
            out.result().iterator
          }
      }
  }
}
