package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types.StructType

/** Streaming operators over the events table (SURVEY.md §2.10 — the
  * reference is batch-only; these are the north-star stream surface).
  *
  * Every transform here is written against a plain DataFrame so the SAME
  * builder serves both the batch oracle queries (EventQueries) and real
  * Structured Streaming graphs (`readStream`/MemoryStream in tests):
  * `withWatermark` is a no-op on a batch DataFrame, so batch results are the
  * streaming results with all data on time — which is exactly what the
  * DuckDB oracle can check.
  *
  * Scale posture: tumbling/sliding aggs are hash aggregations keyed by
  * (window, event_type) — map-side partial agg then one shuffle; session
  * windows shuffle by user_id. Watermarks bound state size at 100 TB stream
  * scale.
  */
object EventStreams {

  /** Schema of the events table, for readStream (streaming needs an explicit
    * schema; ts already converted to microseconds by Tables.events for batch).
    */
  val eventSchema: StructType = StructType.fromDDL(
    "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING, " +
      "value DOUBLE, props STRING")

  /** Tumbling 10-minute counts + sums per event type. */
  def tumblingStats(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "20 minutes")
      .groupBy(window(col("ts"), "10 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 6).as("total_value"))
      .select(col("window.start").as("w_start"), col("event_type"),
        col("n"), col("total_value"))

  /** Sliding windows (default 30-minute windows every 10 minutes: each event
    * lands in 3). `windowDur`/`slideDur`/`lateness` are parameters so the
    * same builder serves the st2 oracle face and lateness-policy tests at
    * other granularities.
    */
  def slidingStats(events: DataFrame, windowDur: String = "30 minutes",
      slideDur: String = "10 minutes", lateness: String = "20 minutes"): DataFrame =
    events
      .withWatermark("ts", lateness)
      .groupBy(window(col("ts"), windowDur, slideDur), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("w_start"), col("event_type"), col("n"))

  /** Session windows: a session closes after a 30-minute silence per user.
    * Output avoids the gap-padded session end (min/max/count are
    * oracle-checkable; the padded end is a Spark implementation detail).
    */
  def sessionStats(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "30 minutes")
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n"),
        min(col("ts")).as("first_ts"), max(col("ts")).as("last_ts"))
      .select(col("user_id"), col("first_ts"), col("last_ts"), col("n"))

  /** Within-watermark dedup: distinct (user, type, 10-minute bucket) —
    * the batch equivalent of streaming `dropDuplicates` bounded by watermark.
    */
  def dedupWithinWindow(events: DataFrame): DataFrame =
    events
      .select(col("user_id"), col("event_type"),
        window(col("ts"), "10 minutes").getField("start").as("w_start"))
      .distinct()

  /** Real streaming source over a parquet directory (file micro-batching). */
  def readEventStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(eventSchema).parquet(dir)

  // ----- custom state (flatMapGroupsWithState) -----

  case class EventRow(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
      event_type: String, value: Double, props: String)
  case class UserState(n: Long, total: Double)
  case class UserTotals(user_id: Long, n: Long, total: Double)

  /** Per-user running totals with explicit state — the custom-state escape
    * hatch for semantics windows can't express. Each micro-batch emits the
    * updated cumulative row per user seen in that batch; state persists in
    * the state store across batches. Works identically on a batch Dataset
    * (one group call, empty initial state), which is what the batch oracle
    * face checks.
    */
  def runningUserTotals(events: DataFrame): Dataset[UserTotals] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.selectExpr("event_id", "ts", "user_id", "event_type", "value", "props")
      .as[EventRow]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (uid: Long, it: Iterator[EventRow], state: GroupState[UserState]) => {
          val prev = state.getOption.getOrElse(UserState(0L, 0.0))
          var n = prev.n
          var total = prev.total
          it.foreach { e => n += 1; total += e.value }
          state.update(UserState(n, total))
          Iterator(UserTotals(uid, n, total))
        })
  }

  // ----- session sequences (the ev6 operator, batch + streaming faces) -----

  /** One event in sessionization order; ts carried as unix MICROS so the gap
    * compare is exact long arithmetic — the same `unix_micros` the ev6 batch
    * window form and its DuckDB oracle compute, no ms truncation at a
    * boundary-exact 1800s gap.
    */
  case class SessEv(user_id: Long, ts_us: Long, event_id: Long, event_type: String)

  /** One emitted session example: ordered event-type sequence + terminal
    * label — identical schema to the ev6 registry query.
    */
  case class SessionRow(user_id: Long, sess_idx: Long, n_events: Long,
      seq: String, label: String)

  /** Streaming state per user: the next session index to assign plus the
    * not-yet-watermark-closed tail of events. The pending buffer is bounded
    * by (watermark horizon + open-session length); the index survives with
    * an empty buffer (a handful of bytes per ever-seen user) so later
    * sessions keep ev2's monotone numbering.
    */
  case class SessPending(nextIdx: Long, pending: Array[SessEv])

  private val sessionGapUs = 1800L * 1000000L

  /** Split a (ts_us, event_id)-sorted run of one user's events into sessions
    * by the STRICT > gap rule (gap == 1800s does NOT split — ev2/ev6's
    * semantics; note Spark's native session_window splits at >=, which is
    * why the custom-state route exists). Shared verbatim by the batch and
    * streaming faces, so the two cannot diverge at the boundary.
    *
    * `maxEvents` is the SPLIT-AT-N CAP (ev6c; ev6's documented production
    * mitigation for gapless bot traffic made an operator): a session that
    * reaches N events closes there and the next event — gap or no gap —
    * starts a new one, so within one gap-session the chunks are consecutive
    * groups of exactly N (only the last may be shorter). Buffer bounds
    * differ by face: batch/ev6b's open-session buffer is bounded by N even
    * under continuous activity, while the streaming face's pending state is
    * bounded by the watermark horizon, not N — emission stays
    * watermark-gated because an out-of-order event inside the watermark can
    * still sort into a full chunk, so chunks can't close early (the cap's
    * streaming win: a gapless user's state no longer grows without bound).
    * Default Int.MaxValue = uncapped (ev6/ev6b semantics unchanged).
    */
  private[streaming] def splitSessions(sorted: IndexedSeq[SessEv],
      gapUs: Long = sessionGapUs, maxEvents: Int = Int.MaxValue): Vector[Vector[SessEv]] = {
    val out = Vector.newBuilder[Vector[SessEv]]
    var cur = Vector.newBuilder[SessEv]
    var n = 0
    var lastTs = 0L
    sorted.foreach { e =>
      if (n > 0 && (e.ts_us - lastTs > gapUs || n == maxEvents)) {
        out += cur.result(); cur = Vector.newBuilder[SessEv]; n = 0
      }
      cur += e; n += 1; lastTs = e.ts_us
    }
    if (n > 0) out += cur.result()
    out.result()
  }

  private def sessionRow(uid: Long, idx: Long, s: Vector[SessEv]): SessionRow =
    SessionRow(uid, idx, s.length.toLong,
      s.map(_.event_type).mkString(" "), s.last.event_type)

  /** BATCH face of session-sequence construction (registry ev6b; same
    * oracle as ev6): one exchange on user_id, per-partition sort by
    * (user_id, ts_us, event_id) — the x1c secondary-sort route — then a
    * single forward pass holding exactly ONE session buffer at a time.
    * At 100 TB this never materializes a user's full history (the sort
    * spills through Spark's UnsafeExternalSorter; the only JVM-heap buffer
    * is the open session — same continuous-activity caveat as ev6: a
    * gapless firehose user is one unbounded session, cap upstream).
    */
  def sessionSequences(events: DataFrame,
      maxEvents: Int = Int.MaxValue): Dataset[SessionRow] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
        col("event_id"), col("event_type"))
      .as[SessEv]
      .repartition(col("user_id"))
      .sortWithinPartitions("user_id", "ts_us", "event_id")
      .mapPartitions(sessionRuns(_, maxEvents = maxEvents))
  }

  /** Per-partition pass of [[sessionSequences]]: input is consecutive user
    * runs each sorted by (ts_us, event_id); emits a session when the next
    * row proves its closing gap (or the run ends). The trailing `++` arm is
    * non-strict, so the final open session flushes only after the iterator
    * drains.
    */
  private[streaming] def sessionRuns(rows: Iterator[SessEv],
      gapUs: Long = sessionGapUs, maxEvents: Int = Int.MaxValue): Iterator[SessionRow] = {
    var curUser = Long.MinValue
    var sessIdx = 0L
    var lastTs = 0L
    var buf = Vector.newBuilder[SessEv]
    var n = 0
    def flush(): SessionRow = {
      val r = sessionRow(curUser, sessIdx, buf.result())
      buf = Vector.newBuilder[SessEv]; n = 0
      r
    }
    rows.flatMap { e =>
      val closed =
        if (e.user_id != curUser) {
          val r = if (n > 0) Some(flush()) else None
          curUser = e.user_id; sessIdx = 1L
          r
        } else if (e.ts_us - lastTs > gapUs || n == maxEvents) {
          // the cap split shares sessIdx numbering with gap splits: indices
          // stay the dense time-ordered count of emitted sessions per user
          val r = Some(flush())
          sessIdx += 1L
          r
        } else None
      buf += e; n += 1; lastTs = e.ts_us
      closed.iterator
    } ++ (if (n > 0) Iterator.single(flush()) else Iterator.empty)
  }

  // private[streaming], not private: a bytecode-private class breaks the
  // generated SafeProjection for its encoder
  private[streaming] case class SessInput(user_id: Long, ts: java.sql.Timestamp,
      ts_us: Long, event_id: Long, event_type: String)

  /** STREAMING face: flatMapGroupsWithState + EventTimeTimeout. A session
    * emits only once the watermark passes (last event + gap) — at that point
    * any event that could extend or bridge it would be later than the
    * watermark (delay = the gap) and dropped at the source, so emission is
    * exactly once and FINAL, with no speculative output to retract. New
    * events merge-sort into the pending tail (out-of-order arrival within
    * the watermark is fine); the timeout re-arms at (pending last + gap) so
    * an idle user's open session closes from the clock of the rest of the
    * stream. Batch equivalence: StreamingSpec drives this over MemoryStream
    * and pins its output to [[sessionSequences]] (= the ev6 oracle) on the
    * same rows.
    *
    * STATE RETENTION (`idleEvictAfter`): once a user's sessions all close,
    * what remains is SessPending(idx, empty) — a handful of bytes carrying
    * ev2's monotone session NUMBERING. By default (None) that row lives
    * forever: numbering continuity for returning users, at the cost of
    * state growing with ever-seen user CARDINALITY — unbounded on an
    * unbounded keyspace, so a production run over an open-ended user space
    * should set a TTL. With Some(d), an event-time alarm re-arms at
    * (watermark + d) whenever the pending buffer empties; if it fires with
    * nothing new, the state row is REMOVED — a user returning after d of
    * idleness restarts at sess_idx 1 (the documented trade-off; session
    * CONTENTS are unaffected either way, StreamingSpec pins both modes).
    */
  def sessionSequencesStream(events: DataFrame,
      idleEvictAfter: Option[java.time.Duration] = None,
      maxEvents: Int = Int.MaxValue): Dataset[SessionRow] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withWatermark("ts", "30 minutes")
      .select(col("user_id"), col("ts"), unix_micros(col("ts")).as("ts_us"),
        col("event_id"), col("event_type"))
      .as[SessInput]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (uid: Long, it: Iterator[SessInput], state: GroupState[SessPending]) => {
          val prev = state.getOption.getOrElse(SessPending(1L, Array.empty))
          val news = it.map(e => SessEv(uid, e.ts_us, e.event_id, e.event_type)).toArray
          val merged = (prev.pending ++ news)
            .sortBy(e => (e.ts_us, e.event_id)).toIndexedSeq
          val wmMs = state.getCurrentWatermarkMs()
          val wmUs = wmMs * 1000L
          // the SAME splitSessions as the batch faces (cap included), so the
          // routes cannot diverge. Re-splitting only the pending tail keeps
          // cap boundaries aligned: an emitted cap-chunk was exactly full,
          // so the remaining chunks' boundaries shift by exactly maxEvents.
          val sessions = splitSessions(merged, sessionGapUs, maxEvents)
          // sessions are time-ordered, so the closeable ones are a prefix
          val (closed, open) = sessions.span(s => s.last.ts_us + sessionGapUs < wmUs)
          var idx = prev.nextIdx
          val out = closed.map { s => val r = sessionRow(uid, idx, s); idx += 1L; r }
          val rest = open.flatten
          if (rest.nonEmpty) {
            state.update(SessPending(idx, rest.toArray))
            state.setTimeoutTimestamp(rest.last.ts_us / 1000L + sessionGapUs / 1000L + 1L)
          } else idleEvictAfter match {
            case Some(d) if news.isEmpty && closed.isEmpty =>
              // the idle alarm fired with nothing pending and nothing new:
              // evict — a returning user will restart at sess_idx 1
              state.remove()
            case Some(d) =>
              // buffer just emptied: keep the numbering but arm the idle
              // alarm (must be strictly past the current watermark)
              state.update(SessPending(idx, Array.empty))
              state.setTimeoutTimestamp(wmMs + 1L + d.toMillis)
            case None =>
              // retention-forever default: numbering continuity, state rows
              // accumulate with ever-seen user cardinality
              state.update(SessPending(idx, Array.empty))
          }
          out.iterator
        })
  }

  /** Streaming dedup bounded by watermark: duplicates of (user, type) within
    * the watermark horizon are dropped; state for expired keys is evicted.
    * Streaming-only (the batch face is dedupWithinWindow/st4).
    */
  def dedupedStream(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("user_id", "event_type")

  /** Stream-static enrichment join: the static dimension is re-read per
    * micro-batch (broadcast if small); no state store involved.
    */
  def enriched(events: DataFrame, userDim: DataFrame): DataFrame =
    events.join(broadcast(userDim), Seq("user_id"), "left")

  /** The full enrichment topology (st6): stream-static join INTO a
    * watermarked tumbling aggregation keyed by the JOINED dimension
    * attribute — the canonical "enrich then roll up by segment" pipeline.
    * Distinct from [[tumblingStats]] (no join) and the sj faces (state on
    * both sides): here the dimension costs no state at all — each
    * micro-batch broadcast-joins the static side and only the aggregation
    * keeps (window x segment) rows, so dimension size never touches the
    * state store. The watermark is declared on the source before the join
    * only because the aggregation needs a watermarked event-time column to
    * bound its state — it does NOT filter rows at the join
    * (EventTimeWatermark is a marker node; late data is discarded at the
    * stateful aggregation in update/append mode and kept in complete mode,
    * which the st6 spec's batch≡stream equality relies on). Unmatched
    * users keep the left-join null segment (grouped as its own bucket —
    * same as batch).
    */
  def enrichedWindowStats(events: DataFrame, userDim: DataFrame): DataFrame =
    enriched(events.withWatermark("ts", "20 minutes"), userDim)
      .groupBy(window(col("ts"), "1 hour"), col("segment"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 6).as("total_value"))
      .select(col("window.start").as("w_start"), col("segment"),
        col("n"), col("total_value"))

  /** STREAM-STREAM interval join: each purchase pairs with the same user's
    * signups from the preceding hour. Both sides carry watermarks and the
    * join condition bounds event-time distance, so the state store holds at
    * most (watermark + interval) of each side per key — the one streaming
    * join shape that needs state on BOTH sides. Works identically on batch
    * DataFrames (watermark is a no-op), which is what the sj1 oracle checks.
    */
  /** `joinType` "inner" (sj1) or "left_outer" (sj2): the outer form emits a
    * null-padded purchase once the watermark proves no in-interval signup
    * can still arrive — streaming-correct "no match" detection.
    */
  def purchasesWithRecentSignups(
      purchases: DataFrame, signups: DataFrame,
      joinType: String = "inner"): DataFrame = {
    val p = purchases.select(col("event_id").as("p_id"), col("user_id"),
      col("ts").as("p_ts")).withWatermark("p_ts", "30 minutes")
    val s = signups.select(col("event_id").as("s_id"),
      col("user_id").as("s_user_id"), col("ts").as("s_ts"),
      col("value").as("rate")).withWatermark("s_ts", "30 minutes")
    p.join(s,
      col("user_id") === col("s_user_id") &&
        col("s_ts") <= col("p_ts") &&
        col("s_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR"),
      joinType)
      .select(col("p_id"), col("user_id"), col("s_id"), col("rate"))
  }

  /** Batch-sink bridge: run any batch writer (JdbcEdges.writeAppend, a
    * clustered parquet write, ...) per micro-batch via foreachBatch — how a
    * stream feeds the migration's sinks. The writer sees a normal batch
    * DataFrame; exactly-once depends on the writer being idempotent per
    * batchId (e.g. K2's anti-join upsert), which is the caller's contract.
    */
  def sinkEachBatch(stream: DataFrame, writer: (DataFrame, Long) => Unit)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream.foreachBatch(writer)
}
