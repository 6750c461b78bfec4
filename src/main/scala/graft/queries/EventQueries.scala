package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.CommentLinks
import graft.streaming.EventStreams

/** Event-table queries: the X1 stateful linking operator (on synthesized
  * comment markers) and the batch-checkable faces of the streaming window
  * operators (SURVEY.md §2.7, §2.10).
  */
object EventQueries {
  private type Q = (SparkSession, String) => DataFrame

  /** Deterministic comment-synthesis from events (FIXTURES.md §A mapping):
    * id=event_id, video_id=user_id, created_at=ts; caret depth = event_id%4
    * baked into content; deleted_at: 'error' rows die at creation (always
    * skipped by later replies), 'click' rows die far in the future (never
    * skipped), everything else lives.
    */
  private def synthComments(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d).select(
      col("event_id").as("id"),
      col("user_id").as("video_id"),
      concat(expr("repeat('^', cast(event_id % 4 as int))"), lit("c")).as("content"),
      col("ts").as("created_at"),
      when(col("event_type") === "error", col("ts"))
        .when(col("event_type") === "click", col("ts") + expr("INTERVAL 1000 HOURS"))
        .otherwise(lit(null).cast("timestamp")).as("deleted_at"))

  val queries: Map[String, Q] = Map(
    // X1 — ordered, deletion-aware variable-lag linking via
    // groupByKey(video).flatMapGroups (SURVEY §2.7).
    "x1_response_linking" -> ((s, d) => {
      import s.implicits._
      CommentLinks.link(synthComments(s, d).as[CommentLinks.CommentRow])
    }),

    // X1b — SURVEY §2.7's option (b) under the driver's gate: the same
    // deletion-aware variable-lag semantics as a window expression
    // (collect visible predecessors, k-th from the end). Same oracle as
    // x1: both faithful routes stay pinned.
    "x1b_response_linking_window" -> ((s, d) =>
      CommentLinks.linkViaWindow(synthComments(s, d))),

    // X1c — the pathological-group streaming form: secondary sort on
    // (video_id, id) + bounded-history replay (history truncates behind
    // maxCaretDepth never-deleted markers, which no future backward scan
    // can cross). Same oracle again: all three routes must agree.
    "x1c_response_linking_streaming" -> ((s, d) => {
      import s.implicits._
      CommentLinks.linkStreaming(synthComments(s, d).as[CommentLinks.CommentRow])
    }),

    "st1_tumbling_window" -> ((s, d) =>
      EventStreams.tumblingStats(Tables.events(s, d))),

    "st2_sliding_window" -> ((s, d) =>
      EventStreams.slidingStats(Tables.events(s, d))),

    "st3_session_window" -> ((s, d) =>
      EventStreams.sessionStats(Tables.events(s, d))),

    "st4_window_dedup" -> ((s, d) =>
      EventStreams.dedupWithinWindow(Tables.events(s, d))),

    // ST6: stream-static enrichment into a windowed rollup — events pick up
    // their user's market segment from the customer dimension (broadcast,
    // zero state-store cost), then aggregate per (hour, segment). The
    // streaming face of j2's broadcast dimension join; StreamingSpec runs
    // the same operator through MemoryStream and pins batch ≡ stream.
    "st6_enriched_window" -> ((s, d) =>
      EventStreams.enrichedWindowStats(
        Tables.events(s, d).select(col("user_id"), col("ts"), col("value")),
        Tables.customer(s, d).select(col("c_custkey").as("user_id"),
          col("c_mktsegment").as("segment")))),

    // EV2: batch gap-sessionization via windows — new session when the
    // same user's gap exceeds 30 minutes; session id = running count of
    // session starts (lag + conditional + prefix sum, the manual form of
    // what session_window/st3 does natively). Order key (user_id, ts) is
    // verified unique in the fixtures, so frames are deterministic.
    "ev2_gap_sessions" -> ((s, d) => {
      val byUser = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy("ts")
      val runFrame = byUser.rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      Tables.events(s, d).select(col("user_id"), col("ts"))
        .withColumn("prev", lag(col("ts"), 1).over(byUser))
        .withColumn("new_sess",
          when(col("prev").isNull ||
            unix_micros(col("ts")) - unix_micros(col("prev")) > 1800L * 1000000L, 1L)
            .otherwise(0L))
        .withColumn("sess_idx", sum(col("new_sess")).over(runFrame))
        .groupBy("user_id", "sess_idx")
        .agg(count(lit(1)).as("n_events"),
          min(col("ts")).as("first_ts"), max(col("ts")).as("last_ts"))
    }),

    // AS1: as-of join — each purchase picks up the latest signup "rate"
    // at-or-before its timestamp per user. Oracle is DuckDB's native
    // ASOF LEFT JOIN; our implementation is the union+carry-forward
    // composition (ops.AsOfJoin).
    "as1_asof_join" -> ((s, d) => {
      val e = Tables.events(s, d)
      val probes = e.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      val snaps = e.filter(col("event_type") === "signup")
        .select(col("user_id"), col("ts"), col("value").as("rate"))
      graft.ops.AsOfJoin.asof(probes, snaps, "user_id", "ts", Seq("rate"))
        .select(col("event_id"), col("user_id"), col("rate"))
    }),

    // AS2: as-of join with a STALENESS BOUND — the feature-store variant
    // of as1: a snapshot only counts if it is fresh enough (here: signup
    // rate within 7 days of the purchase), else the feature is NULL while
    // the raw staleness is still reported for monitoring. Same one-shuffle
    // union+carry-forward composition as as1 with the snapshot timestamp
    // carried as a second value column; the bound compares integer epoch
    // milliseconds, so both engines agree exactly.
    "as2_asof_tolerance" -> ((s, d) => {
      val e = Tables.events(s, d)
      val probes = e.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      // rate and its snapshot time ride ONE struct value column, so the
      // carry-forward is atomic — per snapshot row, exactly the pair the
      // ASOF oracle picks (two independent value columns could pair an
      // older non-null rate with a newer snapshot's timestamp when a
      // snapshot's value is NULL)
      val snaps = e.filter(col("event_type") === "signup")
        .select(col("user_id"), col("ts"),
          struct(col("value").as("rate"), col("ts").as("sts")).as("snap"))
      val tolMs = 7L * 86400000L
      graft.ops.AsOfJoin.asof(probes, snaps, "user_id", "ts", Seq("snap"))
        .select(col("event_id"), col("user_id"),
          when(unix_millis(col("ts")) - unix_millis(col("snap.sts")) <= tolMs,
            col("snap.rate")).as("rate_fresh"),
          (unix_millis(col("ts")) - unix_millis(col("snap.sts")))
            .as("staleness_ms"))
    }),

    // ST5: batch face of the flatMapGroupsWithState custom-state operator —
    // in batch each user is one group call over empty state, so the emitted
    // cumulative rows equal the plain grouped totals.
    "st5_stateful_user_totals" -> ((s, d) =>
      EventStreams.runningUserTotals(Tables.events(s, d))
        .toDF()
        .select(col("user_id"), col("n"), round(col("total"), 6).as("total"))),

    // EV1: funnel analysis — per user, how far through view -> click ->
    // purchase IN ORDER. Staged min-timestamp chaining: each stage is a
    // keyed aggregate over rows after the previous stage's timestamp, so
    // the whole funnel is three filtered agg+joins on user_id (no
    // per-user event arrays materialize; at 100 TB the stage frames are
    // user-cardinality, not event-cardinality).
    // EV3: retention cohorts — the product-analytics table behind every
    // retention curve: users grouped by first-seen week, each later week's
    // activity expressed as a fraction of the cohort. Shapes: two keyed
    // aggregations (cohort assignment, distinct user-weeks) + one
    // broadcastable join on user, then a (cohort, offset)-keyed count —
    // no windows, nothing corpus²; at 100 TB the user-keyed aggregations
    // shuffle once each on their natural keys. Week truncation is ISO
    // Monday in both engines, so offsets replay exactly.
    "ev3_retention_cohorts" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .select(col("user_id"), date_trunc("week", col("ts")).as("wk"))
      val cohort = ev.groupBy("user_id").agg(min(col("wk")).as("cw"))
      val active = ev.distinct()
      val sizes = cohort.groupBy("cw").agg(count(lit(1)).as("n_users"))
      active.join(cohort, "user_id")
        .groupBy(col("cw"),
          floor(datediff(col("wk"), col("cw")) / 7).cast("bigint").as("week_offset"))
        .agg(count_distinct(col("user_id")).as("n_active"))
        .join(sizes, "cw")
        .select(col("cw").cast("date").as("cohort_week"), col("week_offset"),
          col("n_active"),
          round(col("n_active").cast("double") / col("n_users"), 6).as("retention"))
    }),

    // EV4: trailing-window SPIKE detection — the telemetry anomaly flag:
    // an event fires when its value exceeds 2x the max of the user's
    // previous 10 events. Deliberately built on ORDER STATISTICS (trailing
    // max), not mean/stddev: order statistics are engine-exact (same
    // parquet doubles, same comparisons), where a variance accumulates in
    // engine-specific order and can straddle any rounding boundary. One
    // user-keyed window — the ev2 shape; nothing corpus-wide.
    "ev4_spike_detection" -> ((s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        .rowsBetween(-10, -1)
      Tables.events(s, d)
        .withColumn("prev_max", max(col("value")).over(w))
        .filter(col("prev_max").isNotNull && col("value") > col("prev_max") * 2)
        .select(col("event_id"), col("user_id"),
          round(col("value"), 6).as("value"),
          round(col("prev_max"), 6).as("prev_max"))
    }),

    // EV5: Markov TRANSITION MATRIX over per-user event sequences — the
    // behavioral-model summary (and the sequence-dataset sanity check:
    // degenerate transition mass is how template/bot traffic shows up).
    // Shape: one user-keyed window (lead) to form (state, next) pairs, one
    // keyed aggregation over (from, to) — |states|² result rows, so the
    // normalizing window runs over a constant-size frame at any corpus
    // scale. Tie-break on event_id makes the sequence order total, hence
    // engine-exact.
    "ev5_transition_matrix" -> ((s, d) => {
      val byUser = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      val counts = Tables.events(s, d)
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
        .withColumn("to_state", lead(col("event_type"), 1).over(byUser))
        .filter(col("to_state").isNotNull)
        .groupBy(col("event_type").as("from_state"), col("to_state"))
        .agg(count(lit(1)).as("n"))
      val byFrom = org.apache.spark.sql.expressions.Window.partitionBy("from_state")
      counts.withColumn("p",
        round(col("n").cast("double") / sum(col("n")).over(byFrom), 6))
    }),

    // EV5b: per-cohort transition DIVERGENCE — the bot/template-traffic
    // detector ev5's comment gestures at: for each signup cohort (ev3's
    // first-seen ISO week), which transitions deviate most from the global
    // matrix. Emits the top-5 cells per cohort by chi-square CONTRIBUTION
    // (obs-exp)²/exp — deliberately per-cell, never a summed statistic: a
    // cross-cell double sum would hang engine-exactness on fp summation
    // order, while each cell here is a fixed three-op IEEE expression over
    // integer counts, identical in both engines (the ev4 order-statistics
    // principle applied to divergence). Shapes: one user-keyed lead window,
    // user-keyed cohort join, (cohort, from, to)-keyed agg; the global
    // matrix and its row totals are |states|²-sized broadcasts; the ranking
    // window partitions by cohort over |states|² rows — nothing corpus².
    "ev5b_transition_divergence" -> ((s, d) => {
      val byUser = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      val ev = Tables.events(s, d)
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type"),
          date_trunc("week", col("ts")).as("wk"))
      val cohort = ev.groupBy("user_id").agg(min(col("wk")).as("cohort_week"))
      val trans = ev
        .withColumn("to_state", lead(col("event_type"), 1).over(byUser))
        .filter(col("to_state").isNotNull)
        .select(col("user_id"), col("event_type").as("from_state"), col("to_state"))
      val cc = trans.join(cohort, "user_id")
        .groupBy("cohort_week", "from_state", "to_state")
        .agg(count(lit(1)).as("n"))
      val g = cc.groupBy("from_state", "to_state").agg(sum(col("n")).as("g_n"))
      val gf = g.groupBy("from_state").agg(sum(col("g_n")).as("g_from"))
      val cf = cc.groupBy("cohort_week", "from_state").agg(sum(col("n")).as("c_from"))
      // expression shapes mirror the oracle token for token:
      // exp = c_from * (g_n / g_from); contrib = (n - exp)² / exp
      val joined = cc
        .join(broadcast(g), Seq("from_state", "to_state"))
        .join(broadcast(gf), Seq("from_state"))
        .join(cf, Seq("cohort_week", "from_state"))
        .withColumn("exp_n",
          col("c_from").cast("double") * (col("g_n").cast("double") / col("g_from")))
      val diff = col("n").cast("double") - col("exp_n")
      val contrib = diff * diff / col("exp_n")
      val byCohort = org.apache.spark.sql.expressions.Window
        .partitionBy("cohort_week")
        .orderBy(contrib.desc, col("from_state"), col("to_state"))
      joined
        .withColumn("rk", row_number().over(byCohort).cast("bigint"))
        .filter(col("rk") <= 5)
        .select(col("cohort_week").cast("date").as("cohort_week"),
          col("from_state"), col("to_state"), col("n"),
          round(col("exp_n"), 6).as("expected_n"),
          round(contrib, 6).as("chi2_contrib"), col("rk"))
    }),

    // EV5c: INCREMENTAL transition-matrix maintenance — the daily-append
    // reality of ev5 at 100 TB: arrivals (ts >= the cutoff) must update the
    // standing (from, to) counts WITHOUT re-scanning history. Because the
    // cutoff is on event time, each user's arrivals are a strict suffix of
    // their sequence, so the only missing transitions are those whose TO
    // side is an arrival: lead over (arrivals + one boundary row per active
    // user — their last standing event, a semi-join-scoped keyed max_by,
    // the d12 scoping pattern) generates exactly that set. The standing
    // counts are recomputed here as the face's baseline; in production they
    // are the cdc2-style maintained aggregate, making the daily cost
    // O(batch), not O(history). Oracle = ev5's full recompute: the hash
    // match proves apply(standing, arrivals) ≡ recompute(all) — the
    // d12/d13 incremental contract.
    "ev5c_transition_incremental" -> ((s, d) => {
      val cut = lit("2024-01-28 00:00:00").cast("timestamp")
      val byUser = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      val ev = Tables.events(s, d)
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      val standing = ev.filter(col("ts") < cut)
      val arrivals = ev.filter(col("ts") >= cut)
      val oldCounts = standing
        .withColumn("to_state", lead(col("event_type"), 1).over(byUser))
        .filter(col("to_state").isNotNull)
        .groupBy(col("event_type").as("from_state"), col("to_state"))
        .agg(count(lit(1)).as("n"))
      val lastOld = standing
        .join(arrivals.select("user_id").distinct(), "user_id")
        .groupBy("user_id")
        .agg(max_by(struct(col("ts"), col("event_id"), col("event_type")),
          struct(col("ts"), col("event_id"))).as("m"))
        .select(col("user_id"), col("m.ts").as("ts"),
          col("m.event_id").as("event_id"), col("m.event_type").as("event_type"))
      val deltaCounts = arrivals.unionByName(lastOld)
        .withColumn("to_state", lead(col("event_type"), 1).over(byUser))
        .filter(col("to_state").isNotNull)
        .groupBy(col("event_type").as("from_state"), col("to_state"))
        .agg(count(lit(1)).as("n"))
      val total = oldCounts.unionByName(deltaCounts)
        .groupBy("from_state", "to_state").agg(sum(col("n")).as("n"))
      val byFrom = org.apache.spark.sql.expressions.Window.partitionBy("from_state")
      total.withColumn("p",
        round(col("n").cast("double") / sum(col("n")).over(byFrom), 6))
    }),

    // EV6: SESSION SEQUENCE construction — the behavioral-LM training-data
    // shape: each 30-minute-gap session (the ev2 assignment) becomes one
    // example: the ordered event-type sequence plus its terminal event as
    // the label. Order inside a group is made explicit (array_sort over
    // (ts, event_id, type) structs), never inherited from collect_list's
    // arrival order — the property that survives any re-partitioning; the
    // event_id tie-break makes the order TOTAL even if a user ever has two
    // events at one timestamp (the fixture happens to have unique
    // (user_id, ts), but determinism shouldn't lean on that). The sequence
    // is serialized to a space-joined string (repo convention for
    // list-valued results, cf. TextQueries tx4/ch1): a stable scalar the
    // comparison harness can sort and hash. Per-group buffer is bounded by
    // session length — which the gap rule bounds only when activity HAS
    // gaps; a source firing forever inside every 30-minute window (bot
    // traffic) yields one unbounded session, so a production run should cap
    // sequence length upstream (e.g. split sessions at N events) before
    // this collect. No silent cap is applied here.
    "ev6_session_sequences" -> ((s, d) => {
      val byUser = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      val runFrame = byUser.rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      Tables.events(s, d).select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
        .withColumn("prev", lag(col("ts"), 1).over(byUser))
        .withColumn("new_sess",
          when(col("prev").isNull ||
            unix_micros(col("ts")) - unix_micros(col("prev")) > 1800L * 1000000L, 1L)
            .otherwise(0L))
        .withColumn("sess_idx", sum(col("new_sess")).over(runFrame))
        .groupBy("user_id", "sess_idx")
        .agg(count(lit(1)).as("n_events"),
          expr("transform(array_sort(collect_list(struct(ts, event_id, event_type))), x -> x.event_type)")
            .as("seq_arr"))
        .select(col("user_id"), col("sess_idx"), col("n_events"),
          array_join(col("seq_arr"), " ").as("seq"),
          element_at(col("seq_arr"), -1).as("label"))
    }),

    // EV6b: the SAME session-sequence semantics through the secondary-sort
    // single-pass route (EventStreams.sessionSequences) — one exchange on
    // user_id, per-partition sorted scan, one open-session buffer; the
    // shape that survives a user history too large for a window frame.
    // Pinned to the identical oracle as ev6: two physical routes, one
    // semantics (the x1/x1b/x1c pattern). Its streaming sibling
    // (sessionSequencesStream, watermark-final emission) is proven
    // equivalent in StreamingSpec.
    "ev6b_session_sequences_stateful" -> ((s, d) =>
      EventStreams.sessionSequences(Tables.events(s, d)).toDF()),

    // EV6c: CAPPED session sequences — ev6's documented production
    // mitigation for gapless bot traffic (EventQueries ev6 comment: "split
    // sessions at N events") made an operator instead of a comment: a
    // session that reaches ev6CapN events closes there and the next event
    // starts a new one. Buffer bounds differ by route: the batch/ev6b
    // per-partition open-session buffer is bounded by the cap even under
    // continuous activity, while the STREAMING face's pending state is
    // bounded by the watermark horizon (~watermark delay + gap of events),
    // not by N — emission must stay watermark-gated because an out-of-order
    // event inside the watermark can still sort into a full chunk, so
    // chunks cannot be emitted early. The cap's win there is that a
    // gapless user's state no longer grows without bound across
    // micro-batches. Runs through the SAME
    // splitSessions/sessionRuns core as ev6b and the streaming face (one
    // cap parameter, three routes — they cannot diverge); sess_idx stays
    // the dense time-ordered per-user numbering, now counting cap splits
    // too. The oracle replays the cap relationally: within each gap
    // session, chunks are consecutive groups of exactly ev6CapN by
    // row_number, and the final index is a row_number over (gap session,
    // chunk) — the same dense numbering.
    "ev6c_session_sequences_capped" -> ((s, d) =>
      EventStreams.sessionSequences(Tables.events(s, d), maxEvents = ev6CapN).toDF()),

    // EV7: time-grid gap-fill with last-observation-carried-forward — the
    // resample step every downstream time-series consumer (feature
    // pipelines, dashboards, anomaly scoring) wants: one row per
    // (user, hour) from the user's first to last event, the hour's value
    // from its latest event, silent hours inheriting the previous value.
    // Shapes, scale-first:
    //   - observations: one keyed agg to (user, hour) — max_by(value, ts)
    //     is deterministic because (user_id, ts) is unique in the fixture
    //     (ev2's verified precondition);
    //   - the grid: sequence(first_hour, last_hour) exploded per user — a
    //     MAP-SIDE fan-out after a per-user min/max agg, no shuffle. The
    //     expansion factor is span/activity-bounded (~10x here); a grid
    //     over a sparse multi-year entity set would instead gap-fill only
    //     within sessions (ev2's boundaries) — same operator, tighter
    //     bounds;
    //   - LOCF: one window pass per user ordered by hour. No iteration,
    //     no self-join — carry-forward IS last(ignoreNulls) over a
    //     running frame.
    // First grid hour always has an observation (it's the min-ts hour),
    // so the filled column is never null.
    "ev7_gapfill_locf" -> ((s, d) => {
      val e = Tables.events(s, d).select(col("user_id"), col("ts"), col("value"))
      val obs = e.groupBy(col("user_id"), date_trunc("hour", col("ts")).as("h"))
        .agg(max_by(col("value"), col("ts")).as("v"),
          count(lit(1)).as("n_events"))
      val grid = e.groupBy("user_id")
        .agg(date_trunc("hour", min(col("ts"))).as("h0"),
          date_trunc("hour", max(col("ts"))).as("h1"))
        .select(col("user_id"),
          explode(sequence(col("h0"), col("h1"), expr("interval 1 hour"))).as("h"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy("h")
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      grid.join(obs, Seq("user_id", "h"), "left")
        .select(col("user_id"), col("h"),
          last(col("v"), ignoreNulls = true).over(w).as("value"),
          coalesce(col("n_events"), lit(0L)).as("n_events"))
    }),

    "ev1_funnel" -> ((s, d) => {
      val e = Tables.events(s, d)
      def stage(typ: String, prev: Option[DataFrame], prevTs: String, out: String) = {
        val base = e.filter(col("event_type") === typ)
          .select(col("user_id"), col("ts"))
        val scoped = prev match {
          case Some(p) => base.join(p, "user_id").filter(col("ts") > col(prevTs))
          case None => base
        }
        scoped.groupBy("user_id").agg(min(col("ts")).as(out))
      }
      val v = stage("view", None, "", "t_view")
      val c = stage("click", Some(v), "t_view", "t_click")
      val p = stage("purchase", Some(c), "t_click", "t_purchase")
      e.select("user_id").distinct()
        .join(v, Seq("user_id"), "left")
        .join(c, Seq("user_id"), "left")
        .join(p, Seq("user_id"), "left")
        .select(col("user_id"),
          when(col("t_purchase").isNotNull, 3L)
            .when(col("t_click").isNotNull, 2L)
            .when(col("t_view").isNotNull, 1L)
            .otherwise(0L).as("funnel_stage"))
    }),

    // SJ1: batch face of the STREAM-STREAM interval join (purchases ⋈
    // same-user signups within the preceding hour). The streaming graph is
    // identical code (watermarks are no-ops on batch); the double-sided
    // state bound is exercised in StreamingSpec.
    "sj1_stream_stream_join" -> ((s, d) => {
      val e = Tables.events(s, d)
      EventStreams.purchasesWithRecentSignups(
        e.filter(col("event_type") === "purchase"),
        e.filter(col("event_type") === "signup"))
    }),

    // SJ2: the LEFT OUTER stream-stream form — purchases with no in-interval
    // signup survive null-padded (in streaming, emitted once the watermark
    // proves no match can arrive; StreamingSpec drives that path).
    "sj2_stream_stream_left" -> ((s, d) => {
      val e = Tables.events(s, d)
      EventStreams.purchasesWithRecentSignups(
        e.filter(col("event_type") === "purchase"),
        e.filter(col("event_type") === "signup"),
        joinType = "left_outer")
    })
  )

  // Common synthesized-comments CTE for the X1 oracle (mirrors synthComments).
  private val commentsCte =
    """SELECT event_id AS id, user_id AS video_id, ts::TIMESTAMP AS created_at,
         (event_id % 4)::BIGINT AS k,
         CASE WHEN event_type = 'error' THEN ts::TIMESTAMP
              WHEN event_type = 'click' THEN ts::TIMESTAMP + INTERVAL 1000 HOUR
              ELSE NULL END AS deleted_at
       FROM events"""

  // The backward skip-scan replayed relationally: collect all previous
  // (id, deleted_at) per video, filter to the ones visible at reply time,
  // take the k-th from the end. Negative list index past the start -> NULL.
  // Shared by x1/x1b/x1c: three physical routes, one semantics.
  private lazy val x1Oracle =
    s"""WITH c AS ($commentsCte),
       w AS (
         SELECT id, video_id, created_at, k,
           list(struct_pack(pid := id, pdel := deleted_at))
             OVER (PARTITION BY video_id ORDER BY id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev
         FROM c)
       SELECT id, video_id,
         CASE WHEN k > 0 THEN
           list_filter(prev, x -> x.pdel IS NULL OR x.pdel >= created_at)[-k].pid
         ELSE NULL END AS response_to
       FROM w"""

  // Same lead-over-(ts, event_id) total order as the Spark side; the
  // normalizing window partitions the |states|² count rows, so it is
  // constant-size at any corpus scale in both engines. Shared by ev5 (full
  // recompute) and ev5c (incremental maintenance): the incremental face
  // must reproduce the recompute bit for bit.
  private lazy val ev5Oracle =
    """WITH p AS (
         SELECT event_type AS from_state,
           lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS to_state
         FROM events),
       c AS (
         SELECT from_state, to_state, count(*)::BIGINT AS n
         FROM p WHERE to_state IS NOT NULL GROUP BY 1, 2)
       SELECT from_state, to_state, n,
         round(n::DOUBLE / sum(n) OVER (PARTITION BY from_state), 6) AS p
       FROM c"""

  /** ev6c's split-at-N cap — ONE constant drives the Spark face and the
    * generated oracle SQL (the sp1Shards pattern). 2 binds on the fixture's
    * 3-event sessions while leaving the 1/2-event majority untouched.
    */
  val ev6CapN: Int = 2

  // ev6c's oracle: the cap replayed RELATIONALLY rather than sequentially —
  // gap boundaries don't depend on cap splits (the gap rule compares
  // consecutive-event timestamps only), so ev6's gap sessionization stands
  // unchanged, and within each gap session splitSessions' forward pass
  // produces consecutive chunks of exactly ev6CapN events (only the last
  // shorter) = (row_number - 1) // cap. The final sess_idx is the dense
  // time-ordered per-user numbering over (gap session, chunk) — exactly
  // sessionRuns' shared counter across gap and cap splits.
  private lazy val ev6cOracle =
    s"""WITH y AS (
           SELECT user_id, ts, event_id, event_type,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                  THEN 1 ELSE 0 END AS new_s
           FROM events
           WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
         z AS (
           SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS gidx
           FROM y),
         ch AS (
           SELECT *, (row_number() OVER (PARTITION BY user_id, gidx
               ORDER BY ts, event_id) - 1) // $ev6CapN AS chunk
           FROM z),
         g AS (
           SELECT user_id, gidx, chunk, count(*)::BIGINT AS n_events,
             array_to_string(list(event_type ORDER BY ts, event_id), ' ') AS seq,
             (list(event_type ORDER BY ts, event_id))[-1] AS label
           FROM ch GROUP BY user_id, gidx, chunk)
         SELECT user_id,
           row_number() OVER (PARTITION BY user_id ORDER BY gidx, chunk)::BIGINT AS sess_idx,
           n_events, seq, label
         FROM g"""

  // ev2's sessionization (strict > 1800s gap splits) with the (ts, event_id)
  // tie-break, then an ORDER BY inside list() replays the Spark side's
  // array_sort-over-structs order; array_to_string matches array_join(…, ' ')
  // and [-1] the element_at(…, -1) label. Shared by ev6 (window form) and
  // ev6b (secondary-sort single-pass form): two physical routes, one
  // semantics, one oracle.
  private lazy val ev6Oracle =
    """WITH y AS (
           SELECT user_id, ts, event_id, event_type,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                  THEN 1 ELSE 0 END AS new_s
           FROM events
           WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
         z AS (
           SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_idx
           FROM y)
         SELECT user_id, sess_idx::BIGINT AS sess_idx, count(*)::BIGINT AS n_events,
           array_to_string(list(event_type ORDER BY ts, event_id), ' ') AS seq,
           (list(event_type ORDER BY ts, event_id))[-1] AS label
         FROM z GROUP BY user_id, sess_idx"""

  val oracles: Map[String, String] = Map(
    "ev3_retention_cohorts" ->
      """WITH ev AS (SELECT user_id, date_trunc('week', ts) AS wk FROM events),
         cohort AS (SELECT user_id, min(wk) AS cw FROM ev GROUP BY user_id),
         active AS (SELECT DISTINCT user_id, wk FROM ev),
         sizes AS (SELECT cw, count(*)::BIGINT AS n_users FROM cohort GROUP BY cw),
         r AS (
           SELECT c.cw, (date_diff('day', c.cw, a.wk) // 7)::BIGINT AS week_offset,
             count(DISTINCT a.user_id)::BIGINT AS n_active
           FROM active a JOIN cohort c USING (user_id)
           GROUP BY 1, 2)
         SELECT r.cw::DATE AS cohort_week, r.week_offset, r.n_active,
           round(r.n_active::DOUBLE / s.n_users, 6) AS retention
         FROM r JOIN sizes s USING (cw)""",
    "ev4_spike_detection" ->
      """SELECT event_id, user_id, round(value, 6) AS value,
           round(prev_max, 6) AS prev_max
         FROM (
           SELECT event_id, user_id, value,
             max(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN 10 PRECEDING AND 1 PRECEDING) AS prev_max
           FROM events)
         WHERE prev_max IS NOT NULL AND value > prev_max * 2""",
    "x1_response_linking" -> x1Oracle,
    // identical semantics through the window route (option b)
    "x1b_response_linking_window" -> x1Oracle,
    // and through the bounded-history streaming route
    "x1c_response_linking_streaming" -> x1Oracle,
    "st1_tumbling_window" ->
      """SELECT make_timestamp((floor(epoch(ts) / 600) * 600)::BIGINT * 1000000) AS w_start,
           event_type, count(*)::BIGINT AS n, round(sum(value), 6) AS total_value
         FROM events GROUP BY 1, 2""",
    "st6_enriched_window" ->
      """SELECT make_timestamp((floor(epoch(ts) / 3600) * 3600)::BIGINT * 1000000) AS w_start,
           c.c_mktsegment AS segment, count(*)::BIGINT AS n,
           round(sum(e.value), 6) AS total_value
         FROM events e LEFT JOIN customer c ON e.user_id = c.c_custkey
         GROUP BY 1, 2""",
    "st2_sliding_window" ->
      """SELECT make_timestamp(((floor(epoch(ts) / 600) * 600)::BIGINT - off) * 1000000) AS w_start,
           event_type, count(*)::BIGINT AS n
         FROM events CROSS JOIN (VALUES (0), (600), (1200)) o(off)
         GROUP BY 1, 2""",
    "st3_session_window" ->
      """WITH y AS (
           SELECT user_id, ts::TIMESTAMP AS ts,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_s
           FROM events
           WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
         z AS (
           SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
           FROM y)
         SELECT user_id, min(ts) AS first_ts, max(ts) AS last_ts, count(*)::BIGINT AS n
         FROM z GROUP BY user_id, sid""",
    "st4_window_dedup" ->
      """SELECT DISTINCT user_id, event_type,
           make_timestamp((floor(epoch(ts) / 600) * 600)::BIGINT * 1000000) AS w_start
         FROM events""",
    "ev2_gap_sessions" ->
      """WITH y AS (
           SELECT user_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                  THEN 1 ELSE 0 END AS new_s
           FROM events
           WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
         z AS (
           SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_idx
           FROM y)
         SELECT user_id, sess_idx::BIGINT AS sess_idx, count(*)::BIGINT AS n_events,
           min(ts) AS first_ts, max(ts) AS last_ts
         FROM z GROUP BY user_id, sess_idx""",
    "st5_stateful_user_totals" ->
      """SELECT user_id, count(*)::BIGINT AS n, round(sum(value), 6) AS total
         FROM events GROUP BY user_id""",
    // ev7: same grid from generate_series, same LOCF via
    // last_value(IGNORE NULLS); values pass through untouched (max_by of
    // a unique-ts event), so the doubles are bit-identical parquet reads
    // in both engines — no rounding needed
    "ev7_gapfill_locf" ->
      """WITH obs AS (
           SELECT user_id, date_trunc('hour', ts) AS h,
             max_by(value, ts) AS v, count(*)::BIGINT AS n_events
           FROM events GROUP BY 1, 2),
         grid AS (
           SELECT user_id, unnest(generate_series(
             date_trunc('hour', min(ts)), date_trunc('hour', max(ts)),
             INTERVAL 1 HOUR)) AS h
           FROM events GROUP BY user_id)
         SELECT g.user_id, g.h,
           last_value(o.v IGNORE NULLS) OVER (
             PARTITION BY g.user_id ORDER BY g.h
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value,
           coalesce(o.n_events, 0)::BIGINT AS n_events
         FROM grid g LEFT JOIN obs o ON g.user_id = o.user_id AND g.h = o.h""",
    "ev5_transition_matrix" -> ev5Oracle,
    // the incremental face answers against the FULL recompute: a hash match
    // proves apply(standing, arrivals) ≡ recompute(all)
    "ev5c_transition_incremental" -> ev5Oracle,
    // per-cell divergence only — no cross-cell double sum, so every value
    // is a fixed IEEE expression over integer counts in both engines; the
    // rank window's (contrib desc, from, to) order compares those exact
    // doubles pre-round, hence identically
    "ev5b_transition_divergence" ->
      """WITH ev AS (
           SELECT user_id, ts, event_id, event_type,
             date_trunc('week', ts) AS wk FROM events),
         cohort AS (SELECT user_id, min(wk) AS cohort_week FROM ev GROUP BY user_id),
         tr AS (
           SELECT user_id, event_type AS from_state,
             lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS to_state
           FROM ev),
         cc AS (
           SELECT c.cohort_week, t.from_state, t.to_state, count(*)::BIGINT AS n
           FROM tr t JOIN cohort c USING (user_id)
           WHERE t.to_state IS NOT NULL
           GROUP BY 1, 2, 3),
         g AS (SELECT from_state, to_state, sum(n)::BIGINT AS g_n FROM cc GROUP BY 1, 2),
         gf AS (SELECT from_state, sum(g_n)::BIGINT AS g_from FROM g GROUP BY 1),
         cf AS (SELECT cohort_week, from_state, sum(n)::BIGINT AS c_from FROM cc GROUP BY 1, 2),
         j AS (
           SELECT cc.cohort_week, cc.from_state, cc.to_state, cc.n,
             cf.c_from::DOUBLE * (g.g_n::DOUBLE / gf.g_from) AS exp_n
           FROM cc
           JOIN g USING (from_state, to_state)
           JOIN gf USING (from_state)
           JOIN cf ON cf.cohort_week = cc.cohort_week AND cf.from_state = cc.from_state),
         k AS (
           SELECT *,
             (n::DOUBLE - exp_n) * (n::DOUBLE - exp_n) / exp_n AS contrib,
             row_number() OVER (PARTITION BY cohort_week
               ORDER BY (n::DOUBLE - exp_n) * (n::DOUBLE - exp_n) / exp_n DESC,
                 from_state, to_state) AS rk
           FROM j)
         SELECT cohort_week::DATE AS cohort_week, from_state, to_state, n,
           round(exp_n, 6) AS expected_n, round(contrib, 6) AS chi2_contrib,
           rk::BIGINT AS rk
         FROM k WHERE rk <= 5""",
    "ev6_session_sequences" -> ev6Oracle,
    // identical semantics through the secondary-sort streaming-core route
    "ev6b_session_sequences_stateful" -> ev6Oracle,
    "ev6c_session_sequences_capped" -> ev6cOracle,
    "as1_asof_join" ->
      """SELECT p.event_id, p.user_id, s.value AS rate
         FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase') p
         ASOF LEFT JOIN (SELECT user_id, ts, value FROM events WHERE event_type = 'signup') s
           ON p.user_id = s.user_id AND s.ts <= p.ts""",
    "as2_asof_tolerance" ->
      """SELECT p.event_id, p.user_id,
           CASE WHEN epoch_ms(p.ts) - epoch_ms(s.ts) <= 604800000
                THEN s.value END AS rate_fresh,
           epoch_ms(p.ts) - epoch_ms(s.ts) AS staleness_ms
         FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase') p
         ASOF LEFT JOIN (SELECT user_id, ts, value FROM events WHERE event_type = 'signup') s
           ON p.user_id = s.user_id AND s.ts <= p.ts""",
    "ev1_funnel" ->
      """WITH v AS (
           SELECT user_id, min(ts) AS t_view FROM events
           WHERE event_type = 'view' GROUP BY user_id),
         c AS (
           SELECT e.user_id, min(e.ts) AS t_click
           FROM events e JOIN v ON e.user_id = v.user_id
           WHERE e.event_type = 'click' AND e.ts > v.t_view
           GROUP BY e.user_id),
         p AS (
           SELECT e.user_id, min(e.ts) AS t_purchase
           FROM events e JOIN c ON e.user_id = c.user_id
           WHERE e.event_type = 'purchase' AND e.ts > c.t_click
           GROUP BY e.user_id)
         SELECT u.user_id,
           CASE WHEN p.t_purchase IS NOT NULL THEN 3
                WHEN c.t_click IS NOT NULL THEN 2
                WHEN v.t_view IS NOT NULL THEN 1
                ELSE 0 END::BIGINT AS funnel_stage
         FROM (SELECT DISTINCT user_id FROM events) u
         LEFT JOIN v ON u.user_id = v.user_id
         LEFT JOIN c ON u.user_id = c.user_id
         LEFT JOIN p ON u.user_id = p.user_id""",
    "sj1_stream_stream_join" ->
      """SELECT p.event_id AS p_id, p.user_id, s.event_id AS s_id, s.value AS rate
         FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase') p
         JOIN (SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'signup') s
           ON p.user_id = s.user_id
          AND s.ts <= p.ts AND s.ts >= p.ts - INTERVAL 1 HOUR""",
    "sj2_stream_stream_left" ->
      """SELECT p.event_id AS p_id, p.user_id, s.event_id AS s_id, s.value AS rate
         FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase') p
         LEFT JOIN (SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'signup') s
           ON p.user_id = s.user_id
          AND s.ts <= p.ts AND s.ts >= p.ts - INTERVAL 1 HOUR"""
  )
}
