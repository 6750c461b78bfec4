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
  * shuffle moves; the r>=2 banding keeps buckets bounded (SCALE.md), and a
  * production deployment would add state TTL for sliding-corpus semantics.
  */
object StreamingDedup {
  case class BandRow(band_key: String, doc_id: Long)
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
}
