package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.EventStreams

/** Drives the EventStreams builders in REAL streaming mode (MemoryStream):
  * proves the same graphs run incrementally with watermark state, not just
  * as batch queries.
  */
class StreamingSpec extends SparkSpec {

  private case class Ev(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
      event_type: String, value: Double, props: String)

  private def ev(id: Long, at: String, typ: String = "view", v: Double = 1.0) =
    Ev(id, ts(at), 1L, typ, v, "{}")

  test("tumbling aggregation runs incrementally over a stream") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = EventStreams.tumblingStats(mem.toDF())
      .writeStream.outputMode("complete")
      .format("memory").queryName("tumbling_out").start()
    try {
      mem.addData(
        ev(1, "2024-01-01 10:01:00"), ev(2, "2024-01-01 10:04:00"),
        ev(3, "2024-01-01 10:11:00", "click", 2.0))
      q.processAllAvailable()
      val r1 = spark.table("tumbling_out").collect()
        .map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2))).toSet
      assert(r1 === Set(
        ("2024-01-01 10:00:00.0", "view", 2L),
        ("2024-01-01 10:10:00.0", "click", 1L)))

      // a second micro-batch updates existing window state
      mem.addData(ev(4, "2024-01-01 10:07:00"))
      q.processAllAvailable()
      val r2 = spark.table("tumbling_out").collect()
        .map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2))).toSet
      assert(r2.contains(("2024-01-01 10:00:00.0", "view", 3L)))
    } finally q.stop()
  }

  test("watermark drops state for late data in append mode") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = EventStreams.tumblingStats(mem.toDF())
      .writeStream.outputMode("append")
      .format("memory").queryName("wm_out").start()
    try {
      mem.addData(ev(1, "2024-01-01 10:01:00"))
      q.processAllAvailable()
      // advance event time far past the watermark -> 10:00 window finalizes
      mem.addData(ev(2, "2024-01-01 11:00:00"))
      q.processAllAvailable()
      val emitted = spark.table("wm_out").collect()
        .map(r => r.getTimestamp(0).toString).toSet
      assert(emitted === Set("2024-01-01 10:00:00.0"))

      // an event 1h late, inside the finalized window: watermark discards it
      mem.addData(ev(3, "2024-01-01 10:02:00"))
      q.processAllAvailable()
      val after = spark.table("wm_out").collect()
        .map(r => (r.getTimestamp(0).toString, r.getLong(2))).toSet
      assert(after === Set(("2024-01-01 10:00:00.0", 1L)), "late row must not reopen the window")
    } finally q.stop()
  }

  test("flatMapGroupsWithState accumulates per-user state across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = EventStreams.runningUserTotals(mem.toDF())
      .writeStream.outputMode("append")
      .format("memory").queryName("state_out").start()
    try {
      mem.addData(ev(1, "2024-01-01 10:00:00", v = 2.0), ev(2, "2024-01-01 10:01:00", v = 3.0))
      q.processAllAvailable()
      mem.addData(ev(3, "2024-01-01 10:02:00", v = 5.0))
      q.processAllAvailable()
      val rows = spark.table("state_out").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toList.sorted
      // batch 1 emits cumulative (2, 5.0); batch 2 re-emits updated (3, 10.0)
      assert(rows === List((1L, 2L, 5.0), (1L, 3L, 10.0)))
    } finally q.stop()
  }

  test("session sequences stream: watermark-final emission equals the batch face") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def uev(id: Long, user: Long, at: String, typ: String) =
      Ev(id, ts(at), user, typ, 1.0, "{}")
    val mem = MemoryStream[Ev]
    val q = EventStreams.sessionSequencesStream(mem.toDF())
      .writeStream.outputMode("append")
      .format("memory").queryName("sess_out").start()
    try {
      // batch 1: user 1 opens session 1
      mem.addData(
        uev(1, 1, "2024-01-01 10:00:00", "view"),
        uev(2, 1, "2024-01-01 10:05:00", "click"))
      q.processAllAvailable()
      // batch 2: 11:00 opens session 2 (gap 3300s); 10:10 arrives OUT OF
      // ORDER but inside the watermark — must merge-sort into session 1
      mem.addData(
        uev(3, 1, "2024-01-01 11:00:00", "purchase"),
        uev(4, 1, "2024-01-01 10:10:00", "view"))
      q.processAllAvailable()
      assert(spark.table("sess_out").isEmpty,
        "nothing may emit before the watermark proves a session closed")
      // sentinel batches push the watermark past 11:30 (user 1's session-2
      // close); the second sentinel batch gives the advanced watermark a
      // batch in which to fire user 1's event-time timeout
      mem.addData(uev(90, 99, "2024-01-01 13:00:00", "view"))
      q.processAllAvailable()
      mem.addData(uev(91, 99, "2024-01-01 13:01:00", "view"))
      q.processAllAvailable()
      val got = spark.table("sess_out").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3), r.getString(4)))
        .toSet
      assert(got === Set(
        (1L, 1L, 3L, "view click view", "view"),
        (1L, 2L, 1L, "purchase", "purchase")),
        "closed sessions must emit exactly once, in-order-merged and final")
      // batch≡streaming: the batch face on the same rows agrees on every
      // session the stream has closed (the sentinel user's session is still
      // open — the batch face flushes it, the stream correctly holds it)
      // tuples, not Ev: the inner-class Ev encoder can serialize (MemoryStream)
      // but localSeqToDataset also resolves its deserializer, which fails
      // without the defining scope
      val allRows = Seq(
        uev(1, 1, "2024-01-01 10:00:00", "view"), uev(2, 1, "2024-01-01 10:05:00", "click"),
        uev(3, 1, "2024-01-01 11:00:00", "purchase"), uev(4, 1, "2024-01-01 10:10:00", "view"),
        uev(90, 99, "2024-01-01 13:00:00", "view"), uev(91, 99, "2024-01-01 13:01:00", "view"))
        .map(e => (e.event_id, e.ts, e.user_id, e.event_type, e.value, e.props))
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      val batchFace = EventStreams.sessionSequences(allRows).collect()
        .map(r => (r.user_id, r.sess_idx, r.n_events, r.seq, r.label)).toSet
      assert(got.subsetOf(batchFace))
      assert((batchFace -- got).forall(_._1 == 99L),
        "batch face may only add the still-open sentinel session")
    } finally q.stop()
  }

  test("session sequences stream: idle TTL evicts state (restart at 1); default retains numbering") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def uev(id: Long, user: Long, at: String, typ: String) =
      Ev(id, ts(at), user, typ, 1.0, "{}")
    // one feed, two retention modes — the documented trade-off, pinned
    def drive(name: String, ttl: Option[java.time.Duration]): Set[(Long, Long, String)] = {
      val mem = MemoryStream[Ev]
      val q = EventStreams.sessionSequencesStream(mem.toDF(), ttl)
        .writeStream.outputMode("append")
        .format("memory").queryName(name).start()
      try {
        def step(evs: Ev*): Unit = { mem.addData(evs: _*); q.processAllAvailable() }
        step(uev(1, 1, "2024-01-01 10:00:00", "view"))
        // sentinels push the watermark past 10:30 so user 1's session closes;
        // the close (a no-new-data timeout with a nonempty buffer) arms the
        // idle alarm at (watermark + ttl) in TTL mode
        step(uev(90, 99, "2024-01-01 12:00:00", "view"))
        step(uev(91, 99, "2024-01-01 12:01:00", "view"))
        // push the watermark past (close-time watermark 11:30) + 1h TTL —
        // the idle alarm fires with nothing pending and evicts in TTL mode
        step(uev(92, 99, "2024-01-01 14:00:00", "view"))
        step(uev(93, 99, "2024-01-01 14:01:00", "view"))
        // user 1 returns; close their new session via more sentinels
        step(uev(2, 1, "2024-01-01 15:00:00", "click"))
        step(uev(94, 99, "2024-01-01 17:00:00", "view"))
        step(uev(95, 99, "2024-01-01 17:01:00", "view"))
        spark.table(name).collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getString(3)))
          .filter(_._1 == 1L).toSet
      } finally q.stop()
    }
    val evicted = drive("sess_ttl_out", Some(java.time.Duration.ofHours(1)))
    assert(evicted === Set((1L, 1L, "view"), (1L, 1L, "click")),
      "after TTL eviction the returning user restarts at sess_idx 1")
    val retained = drive("sess_nottl_out", None)
    assert(retained === Set((1L, 1L, "view"), (1L, 2L, "click")),
      "default retention keeps monotone numbering for returning users")
  }

  test("ev6c streaming end-to-end: cap splits and idle TTL compose in one run") {
    // Round-13 shipped the split-at-N cap and the idle-state TTL as
    // separately-spec'd features; this drives BOTH through one query —
    // the production configuration for an open-ended user space with
    // gapless-bot traffic. Cap 3, TTL 1h.
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def uev(id: Long, user: Long, at: String, typ: String) =
      Ev(id, ts(at), user, typ, 1.0, "{}")
    val mem = MemoryStream[Ev]
    val q = EventStreams.sessionSequencesStream(mem.toDF(),
        idleEvictAfter = Some(java.time.Duration.ofHours(1)), maxEvents = 3)
      .writeStream.outputMode("append")
      .format("memory").queryName("sess_cap_ttl").start()
    try {
      def step(evs: Ev*): Unit = { mem.addData(evs: _*); q.processAllAvailable() }
      def user1: Set[(Long, Long, Long, String, String)] =
        spark.table("sess_cap_ttl").collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3), r.getString(4)))
          .filter(_._1 == 1L).toSet
      // 5 gapless events for user 1, one OUT OF ORDER inside the watermark
      // (id 4 at 10:02 arrives after id 3 at 10:03) — the cap must apply to
      // the time-sorted order, chunking [10:00 10:01 10:02][10:03 10:04]
      step(uev(1, 1, "2024-01-01 10:00:00", "view"),
           uev(2, 1, "2024-01-01 10:01:00", "click"))
      step(uev(3, 1, "2024-01-01 10:03:00", "view"),
           uev(4, 1, "2024-01-01 10:02:00", "click"),
           uev(5, 1, "2024-01-01 10:04:00", "purchase"))
      assert(user1.isEmpty, "a full cap chunk must still wait for the " +
        "watermark — a late event inside it could re-sort the chunk")
      // sentinels close user 1's chunks (wm 11:30+) and arm the idle alarm
      step(uev(90, 99, "2024-01-01 12:00:00", "view"))
      step(uev(91, 99, "2024-01-01 12:01:00", "view"))
      assert(user1 === Set(
        (1L, 1L, 3L, "view click click", "click"),
        (1L, 2L, 2L, "view purchase", "purchase")),
        "cap splits the gapless run at 3 in event-time order")
      // push the watermark past (close wm 11:30) + 1h — the idle alarm
      // fires with nothing pending: state evicted
      step(uev(92, 99, "2024-01-01 14:00:00", "view"))
      step(uev(93, 99, "2024-01-01 14:01:00", "view"))
      // user 1 returns with 4 gapless events -> capped chunks [3][1],
      // RE-numbered from 1 (the TTL trade-off)
      step(uev(6, 1, "2024-01-01 15:00:00", "view"),
           uev(7, 1, "2024-01-01 15:01:00", "click"),
           uev(8, 1, "2024-01-01 15:02:00", "view"),
           uev(9, 1, "2024-01-01 15:03:00", "click"))
      step(uev(94, 99, "2024-01-01 17:00:00", "view"))
      step(uev(95, 99, "2024-01-01 17:01:00", "view"))
      val got = user1
      assert(got === Set(
        (1L, 1L, 3L, "view click click", "click"),
        (1L, 2L, 2L, "view purchase", "purchase"),
        (1L, 1L, 3L, "view click view", "view"),
        (1L, 2L, 1L, "click", "click")),
        "post-eviction sessions restart at sess_idx 1; cap still applies")
      // batch≡streaming on CONTENT: the capped batch face (= the ev6c
      // oracle's semantics) over the same user-1 rows yields the same
      // session contents; only the numbering differs (batch never evicts,
      // so its indices run 1..4) — the documented divergence, pinned
      val allRows = Seq(
        uev(1, 1, "2024-01-01 10:00:00", "view"), uev(2, 1, "2024-01-01 10:01:00", "click"),
        uev(3, 1, "2024-01-01 10:03:00", "view"), uev(4, 1, "2024-01-01 10:02:00", "click"),
        uev(5, 1, "2024-01-01 10:04:00", "purchase"),
        uev(6, 1, "2024-01-01 15:00:00", "view"), uev(7, 1, "2024-01-01 15:01:00", "click"),
        uev(8, 1, "2024-01-01 15:02:00", "view"), uev(9, 1, "2024-01-01 15:03:00", "click"))
        .map(e => (e.event_id, e.ts, e.user_id, e.event_type, e.value, e.props))
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      val batch = EventStreams.sessionSequences(allRows, maxEvents = 3).collect()
        .map(r => (r.user_id, r.sess_idx, r.n_events, r.seq, r.label)).toSet
      assert(batch.map(t => (t._1, t._3, t._4, t._5)) ===
        got.map(t => (t._1, t._3, t._4, t._5)),
        "session contents agree with the capped batch face")
      assert(batch.map(_._2) === Set(1L, 2L, 3L, 4L),
        "the batch face numbers continuously — eviction is stream-only")
    } finally q.stop()
  }

  test("dropDuplicatesWithinWatermark drops repeats inside the horizon") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = EventStreams.dedupedStream(mem.toDF())
      .writeStream.outputMode("append")
      .format("memory").queryName("dedup_out").start()
    try {
      mem.addData(
        ev(1, "2024-01-01 10:00:00", "view"), ev(2, "2024-01-01 10:01:00", "view"),
        ev(3, "2024-01-01 10:02:00", "click"))
      q.processAllAvailable()
      assert(spark.table("dedup_out").count() === 2) // second view dropped
    } finally q.stop()
  }

  test("stream-static broadcast enrichment joins per micro-batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq((1L, "gold")).toDF("user_id", "tier")
    val mem = MemoryStream[Ev]
    val q = EventStreams.enriched(mem.toDF(), dim)
      .select("event_id", "tier")
      .writeStream.outputMode("append")
      .format("memory").queryName("enrich_out").start()
    try {
      mem.addData(ev(1, "2024-01-01 10:00:00"))
      q.processAllAvailable()
      val r = spark.table("enrich_out").collect().map(r => (r.getLong(0), r.getString(1)))
      assert(r.toList === List((1L, "gold")))
    } finally q.stop()
  }

  test("st6: enrichment topology over a stream equals the batch run") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq((1L, "BUILDING"), (2L, "AUTOMOBILE")).toDF("user_id", "segment")
    // user 9 has no dimension row: the left join must keep it under a
    // null segment in BOTH runs; rows span two hours and two batches
    val rows = Seq(
      Ev(1, ts("2024-01-01 10:05:00"), 1L, "view", 2.0, "{}"),
      Ev(2, ts("2024-01-01 10:55:00"), 1L, "view", 3.0, "{}"),
      Ev(3, ts("2024-01-01 11:05:00"), 2L, "view", 5.0, "{}"),
      Ev(4, ts("2024-01-01 10:20:00"), 9L, "view", 7.0, "{}"))
    def proj(df: org.apache.spark.sql.DataFrame) =
      df.select($"user_id", $"ts", $"value")
    val mem = MemoryStream[Ev]
    val q = EventStreams.enrichedWindowStats(proj(mem.toDF()), dim)
      .writeStream.outputMode("complete")
      .format("memory").queryName("st6_out").start()
    try {
      mem.addData(rows.take(2): _*)
      q.processAllAvailable()
      mem.addData(rows.drop(2): _*)
      q.processAllAvailable()
      def key(r: org.apache.spark.sql.Row) =
        (r.getTimestamp(0).toString, Option(r.getString(1)),
          r.getLong(2), r.getDouble(3))
      val got = spark.table("st6_out").collect().map(key).toSet
      // tuples, not Seq[Ev].toDF: Spark can't encode the spec-inner case
      // class from a plain local Seq (MemoryStream resolves it via the
      // implicit encoder; createDataFrame does not get that scope)
      val batch = rows.map(e => (e.user_id, e.ts, e.value))
        .toDF("user_id", "ts", "value")
      val want = EventStreams.enrichedWindowStats(batch, dim)
        .collect().map(key).toSet
      assert(got === want)
      assert(want.exists(_._2.isEmpty), "the dimension-less user vanished")
      assert(want.size === 3) // (10h BUILDING), (10h null), (11h AUTOMOBILE)
    } finally q.stop()
  }

  test("foreachBatch bridges a stream into a batch sink per micro-batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val sunk = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)] // (batchId, rows)
    val mem = MemoryStream[Ev]
    val q = EventStreams.sinkEachBatch(mem.toDF(),
      (batch, id) => sunk.synchronized { sunk += ((id, batch.count())) }).start()
    try {
      mem.addData(ev(1, "2024-01-01 10:00:00"), ev(2, "2024-01-01 10:01:00"))
      q.processAllAvailable()
      mem.addData(ev(3, "2024-01-01 10:02:00"))
      q.processAllAvailable()
      assert(sunk.toList === List((0L, 2L), (1L, 1L)))
    } finally q.stop()
  }

  test("stream-stream interval join pairs rows arriving in different batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val purchases = MemoryStream[Ev]
    val signups = MemoryStream[Ev]
    val q = EventStreams.purchasesWithRecentSignups(purchases.toDF(), signups.toDF())
      .writeStream.outputMode("append")
      .format("memory").queryName("ssj_out").start()
    try {
      // signup arrives FIRST, in its own micro-batch: it must be held in
      // the join state until the matching purchase shows up.
      signups.addData(Ev(10, ts("2024-01-01 10:00:00"), 1L, "signup", 0.25, "{}"))
      q.processAllAvailable()
      purchases.addData(
        ev(1, "2024-01-01 10:30:00", "purchase"), // 30 min after -> joins
        ev(2, "2024-01-01 11:30:00", "purchase")) // 90 min after -> outside interval
      q.processAllAvailable()
      val rows = spark.table("ssj_out").collect()
        .map(r => (r.getLong(0), r.getLong(2), r.getDouble(3))).toSet
      assert(rows === Set((1L, 10L, 0.25)))
    } finally q.stop()
  }

  test("outer stream-stream join emits the null-padded row only after the watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val purchases = MemoryStream[Ev]
    val signups = MemoryStream[Ev]
    val q = EventStreams.purchasesWithRecentSignups(
        purchases.toDF(), signups.toDF(), joinType = "left_outer")
      .writeStream.outputMode("append")
      .format("memory").queryName("ssj_outer_out").start()
    try {
      // a purchase with NO matching signup
      purchases.addData(ev(1, "2024-01-01 10:30:00", "purchase"))
      signups.addData(Ev(10, ts("2024-01-01 09:00:00"), 99L, "signup", 0.1, "{}"))
      q.processAllAvailable()
      // not emitted yet: a matching signup could still arrive
      assert(spark.table("ssj_outer_out").isEmpty)

      // advance BOTH watermarks far past purchase-time + interval
      purchases.addData(ev(2, "2024-01-01 14:00:00", "purchase"))
      signups.addData(Ev(11, ts("2024-01-01 14:00:00"), 99L, "signup", 0.2, "{}"))
      q.processAllAvailable()
      q.processAllAvailable() // one more batch so the state-eviction pass runs
      val rows = spark.table("ssj_outer_out").collect()
        .map(r => (r.getLong(0), Option(r.get(2)))).toSet
      assert(rows.contains((1L, None)), s"unmatched purchase not emitted: $rows")
    } finally q.stop()
  }

  test("stateful query resumes from its checkpoint after a restart") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // memory sink can't recover from a checkpoint; foreachBatch can — and
    // it is the engine's real sink bridge anyway
    val ckpt = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    val mem = MemoryStream[Ev]
    val sunk = scala.collection.mutable.ArrayBuffer.empty[(Long, Double)]
    def start() = EventStreams.sinkEachBatch(
      EventStreams.runningUserTotals(mem.toDF()).toDF(),
      (batch, _) => {
        val rows = batch.collect().map(r => (r.getLong(1), r.getDouble(2)))
        sunk.synchronized { sunk ++= rows }
      })
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .start()

    val q1 = start()
    try {
      mem.addData(ev(1, "2024-01-01 10:00:00", v = 2.0))
      q1.processAllAvailable()
    } finally q1.stop()

    // restart against the SAME checkpoint: per-user state must carry over,
    // so the next batch emits the cumulative total, not a fresh one
    val q2 = start()
    try {
      mem.addData(ev(2, "2024-01-01 10:01:00", v = 3.0))
      q2.processAllAvailable()
      val rows = sunk.synchronized(sunk.toList)
      assert(rows.contains((2L, 5.0)), s"state lost across restart: $rows")
    } finally q2.stop()
  }

  test("session-sequence state survives a restart: pre-restart events flush post-restart") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ckpt = java.nio.file.Files.createTempDirectory("graft-sess-ckpt").toString
    val mem = MemoryStream[Ev]
    val sunk = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, String, String)]
    def start() = EventStreams.sinkEachBatch(
      EventStreams.sessionSequencesStream(mem.toDF()).toDF(),
      (batch, _) => {
        val rows = batch.collect().map(r =>
          (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3), r.getString(4)))
        sunk.synchronized { sunk ++= rows }
      })
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .start()

    def uev(id: Long, user: Long, at: String, typ: String) =
      Ev(id, ts(at), user, typ, 1.0, "{}")
    val q1 = start()
    try {
      // an OPEN session rides entirely in the state store at shutdown
      mem.addData(
        uev(1, 1, "2024-01-01 10:00:00", "view"),
        uev(2, 1, "2024-01-01 10:05:00", "click"))
      q1.processAllAvailable()
      assert(sunk.synchronized(sunk.isEmpty), "nothing may emit before the watermark closes it")
    } finally q1.stop()

    // restart on the SAME checkpoint: the pending buffer and session counter
    // must recover, so the sentinel-advanced watermark flushes the
    // PRE-restart session with its full sequence
    val q2 = start()
    try {
      mem.addData(uev(90, 99, "2024-01-01 13:00:00", "view"))
      q2.processAllAvailable()
      mem.addData(uev(91, 99, "2024-01-01 13:01:00", "view"))
      q2.processAllAvailable()
      val rows = sunk.synchronized(sunk.toList)
      assert(rows.contains((1L, 1L, 2L, "view click", "click")),
        s"pre-restart session lost or mangled across the checkpoint: $rows")
    } finally q2.stop()
  }

  test("late event INSIDE the watermark counts; OUTSIDE it is dropped") {
    // The one lateness-policy edge the other tests don't pin: an event that
    // arrives out of order but with event time still ABOVE the watermark
    // must land in its (still-open) windows, while one below the watermark
    // is discarded. 10-minute windows sliding every 5, 15-minute lateness.
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = EventStreams.slidingStats(mem.toDF(),
        windowDur = "10 minutes", slideDur = "5 minutes", lateness = "15 minutes")
      .writeStream.outputMode("append")
      .format("memory").queryName("late_out").start()
    try {
      mem.addData(ev(1, "2024-01-01 10:07:00"))
      q.processAllAvailable()
      // watermark -> 10:26 - 15m = 10:11; window [10:00,10:10) finalizes
      mem.addData(ev(2, "2024-01-01 10:26:00"))
      q.processAllAvailable()
      // late arrival, event time 10:13 > watermark 10:11 -> must count in
      // the still-open [10:05,10:15) and [10:10,10:20) windows
      mem.addData(ev(3, "2024-01-01 10:13:00"))
      q.processAllAvailable()
      // advance watermark to 10:45: those windows finalize and emit
      mem.addData(ev(4, "2024-01-01 11:00:00"))
      q.processAllAvailable()
      q.processAllAvailable()
      val emitted = spark.table("late_out").collect()
        .map(r => (r.getTimestamp(0).toString, r.getLong(2))).toSet
      assert(emitted.contains(("2024-01-01 10:00:00.0", 1L)), s"got $emitted")
      assert(emitted.contains(("2024-01-01 10:05:00.0", 2L)),
        s"inside-watermark late event missing from [10:05,10:15): $emitted")
      assert(emitted.contains(("2024-01-01 10:10:00.0", 1L)), s"got $emitted")

      // event time 10:08 < watermark 10:45: dropped, finalized windows stay
      mem.addData(ev(5, "2024-01-01 10:08:00"))
      q.processAllAvailable()
      q.processAllAvailable()
      val after = spark.table("late_out").collect()
        .map(r => (r.getTimestamp(0).toString, r.getLong(2))).toSet
      assert(after === emitted, s"outside-watermark event must be discarded: $after")
    } finally q.stop()
  }

  test("file-source streaming: a parquet directory drives the same graph as batch") {
    // readEventStream is the production entry (file micro-batching); the
    // result of streaming the whole directory with AvailableNow must equal
    // the batch run of the SAME builder over the same rows.
    val dir = java.nio.file.Files.createTempDirectory("graft-stream-src").toString
    val events = Tables.events(spark, "/root/testdata/sf0.001")
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
    events.write.mode("overwrite").parquet(dir)
    val q = EventStreams.tumblingStats(EventStreams.readEventStream(spark, dir))
      .writeStream.outputMode("complete")
      .format("memory").queryName("file_stream_out")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    try {
      assert(q.awaitTermination(120000), "AvailableNow stream did not drain in time")
      val streamed = spark.table("file_stream_out").collect()
        .map(r => (r.getTimestamp(0).toString, r.getString(1)) -> r.getLong(2)).toMap
      val batch = EventStreams.tumblingStats(events).collect()
        .map(r => (r.getTimestamp(0).toString, r.getString(1)) -> r.getLong(2)).toMap
      assert(streamed === batch)
      assert(streamed.nonEmpty)
    } finally q.stop()
  }

  test("streaming skew guard: a pathological band bucket collapses to linear star emission") {
    // The streaming mirror of Dedup.candidatePairs' skew guard: 60 docs
    // land on ONE band key (a crawl's boilerplate bucket) across 3
    // micro-batches with cap 10 — emission must be the n-1 star chain,
    // never the ~1.8k all-pairs, state must collapse to the anchor, and a
    // small bucket in the same stream keeps exact all-pairs.
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Long)]
    val q = graft.streaming.StreamingDedup
      .candidatePairsStream(mem.toDF().toDF("band_key", "doc_id"), maxBucket = 10)
      .writeStream.outputMode("append")
      .format("memory").queryName("skew_pairs").start()
    try {
      val hot = (1L to 60L).map(i => ("0:hot", i))
      val small = Seq(101L, 102L, 103L, 104L).map(i => ("1:small", i))
      (hot ++ small).grouped(22).foreach { b =>
        mem.addData(b); q.processAllAvailable()
      }
      val pairs = spark.table("skew_pairs").distinct()
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      val hotPairs = pairs.filter(_._2 <= 60L)
      assert(hotPairs.length === 59,
        s"expected the 59-star chain, got ${hotPairs.length} pairs")
      assert(hotPairs.forall(_._1 == 1L), "star pairs must anchor at the min id")
      // connectivity preserved: cluster resolution still collapses the bucket
      val cc = graft.dedup.Dedup.connectedComponents(
        spark.table("skew_pairs").distinct()).collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      assert(cc.filter(_._1 <= 60L).forall(_._2 == 1L))
      // the small bucket stays exact all-pairs
      assert(pairs.count(_._1 > 100L) === 4 * 3 / 2)
    } finally q.stop()
  }

  test("streaming ANN index append: per-micro-batch encode equals the batch v9c face") {
    // v9c's index-maintenance lifecycle driven as a STREAM: arrivals land
    // in micro-batches, each encoded against the STANDING model (no
    // retrain) inside foreachBatch and appended to the index. After the
    // stream drains, search over (standing + streamed codes) must equal
    // the batch append on the same rows — encoding is per-row against
    // frozen centroids/codebook, so micro-batch boundaries cannot leak
    // into the codes. This is the production shape: the trainer runs
    // rarely, the encoder runs on every arrival batch forever.
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.similarity.VectorOps
    val d = "/root/testdata/sf0.001"
    val (m, dsub, ksub) = (4, 16, 16)
    val c = Tables.embeddings(spark, d).select(col("vec_id").as("n_id"),
      VectorOps.toDouble(col("embedding")).as("nv"))
    val isNew = col("n_id") % 10 === 0
    val trained = VectorOps.ivfpqTrain(c.filter(!isNew), nCells = 16,
      m = m, dsub = dsub, ksub = ksub)
    val model = VectorOps.IvfPqModel(trained.centroids.localCheckpoint(),
      trained.codebook.localCheckpoint(), trained.index.localCheckpoint())

    val arrivals = c.filter(isNew).as[(Long, Seq[Double])].collect()
    assert(arrivals.length >= 20, "fixture must provide a real arrival set")
    val mem = MemoryStream[(Long, Seq[Double])]
    val batches = scala.collection.mutable.ArrayBuffer.empty[org.apache.spark.sql.DataFrame]
    val q = mem.toDF().toDF("n_id", "nv").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        if (!batch.isEmpty)
          batches.synchronized {
            batches += VectorOps.ivfpqEncode(batch.toDF(), model, m, dsub).localCheckpoint()
          }
        ()
      }.start()
    try {
      // three micro-batches, deliberately uneven
      val (b1, rest) = arrivals.splitAt(7)
      val (b2, b3) = rest.splitAt(19)
      Seq(b1, b2, b3).foreach { b => mem.addData(b.toIndexedSeq); q.processAllAvailable() }
    } finally q.stop()

    val streamedIdx = batches.reduce(_ unionByName _)
    val queries = c.filter(col("n_id") < 20)
    def search(idx: org.apache.spark.sql.DataFrame) =
      VectorOps.ivfpqSearch(queries,
          VectorOps.IvfPqModel(model.centroids, model.codebook,
            model.index.unionByName(idx)),
          nProbe = 4, m = m, dsub = dsub, k = 5)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val batchIdx = VectorOps.ivfpqEncode(c.filter(isNew), model, m, dsub)
    // codes identical row-for-row, and the search over them agrees
    val streamedCodes = streamedIdx.collect().map(_.toString).toSet
    val batchCodes = batchIdx.select(streamedIdx.columns.map(col): _*)
      .collect().map(_.toString).toSet
    assert(streamedCodes === batchCodes,
      "micro-batch boundaries must not change a single code")
    assert(search(streamedIdx) === search(batchIdx))
  }

  test("incremental LSH dedup over a document stream equals the batch pipeline") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val sfDir = "/root/testdata/sf0.001"
    // the corpus arrives in 3 micro-batches (id order — a crawl feed)
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text")
      .as[(Long, String)].collect().sortBy(_._1)
    val batches = docs.grouped(math.max(1, (docs.length + 2) / 3)).toSeq
    assert(batches.length == 3)
    val mem = MemoryStream[(Long, String)]
    // signature + band keys are STATELESS per-row stages — the identical
    // Dedup expressions run unchanged on the streaming frame
    val streamBands = {
      val d = mem.toDF().toDF("doc_id", "text")
        .select(col("doc_id"), split(col("text"), " ").as("w"))
        .filter(size(col("w")) >= 3)
        .withColumn("sh", graft.dedup.Dedup.shingles(col("w")))
      graft.dedup.Dedup.lshBandKeys(
        graft.dedup.Dedup.withMinhashSig(d, "sh", "sig").select("doc_id", "sig"),
        "doc_id", "sig")
    }
    val q = graft.streaming.StreamingDedup.candidatePairsStream(streamBands)
      .writeStream.outputMode("append")
      .format("memory").queryName("dedup_pairs").start()
    try {
      batches.foreach { b => mem.addData(b.toSeq); q.processAllAvailable() }
      val streamPairs = spark.table("dedup_pairs").distinct()
      // 1) accumulated candidate pairs == the batch generator's (d3)
      val got = streamPairs.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val want = SparkEntry.queries("d3_lsh_candidate_pairs")(spark, sfDir)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got === want, "stream pairs diverge from batch candidate pairs")
      assert(got.nonEmpty, "fixture should contain near-dups")
      // 2) survivors via the periodic CC pass over accumulated pairs == d7
      val dropped = graft.dedup.Dedup.connectedComponents(streamPairs)
        .filter(col("cluster") =!= col("doc_id"))
        .collect().map(_.getLong(0)).toSet
      val survivors = docs.map(_._1).toSet -- dropped
      val d7 = SparkEntry.queries("d7_dedup_survivors")(spark, sfDir)
        .collect().map(_.getLong(0)).toSet
      assert(survivors === d7, "incremental survivors diverge from batch d7")
    } finally q.stop()
  }

  test("10x corpus: incremental dedup equals batch and state holds one row per band key") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // Replicate the sf0.01 documents table 10x with ScaleStress's
    // character-preserving transform — shifted ids, ~r word suffixes via
    // the SAME ScaleStress.replicaText the measured 10x run uses — so this
    // proves the state store holds at 10x the corpus the base equivalence
    // test covers (5000 docs), not a rerun at toy size.
    val src = Tables.documents(spark, "/root/testdata/sf0.01")
      .select("doc_id", "text")
    val offset = src.agg(max("doc_id")).head.getLong(0) + 1
    val tenX = (0 until 10).map { r =>
      if (r == 0) src
      else src.select((col("doc_id") + lit(r * offset)).as("doc_id"),
        ScaleStress.replicaText(col("text"), r).as("text"))
    }.reduce(_ unionByName _)

    def bandsOf(df: org.apache.spark.sql.DataFrame) = {
      val d = df
        .select(col("doc_id"), split(col("text"), " ").as("w"))
        .filter(size(col("w")) >= 3)
        .withColumn("sh", graft.dedup.Dedup.shingles(col("w")))
      graft.dedup.Dedup.lshBandKeys(
        graft.dedup.Dedup.withMinhashSig(d, "sh", "sig").select("doc_id", "sig"),
        "doc_id", "sig")
    }
    // batch reference over the identical 10x corpus
    val batchBands = bandsOf(tenX)
    val batchPairs = graft.dedup.Dedup.candidatePairs(batchBands, "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val distinctBandKeys = batchBands.select("band_key").distinct().count()

    val docs = tenX.as[(Long, String)].collect().sortBy(_._1)
    assert(docs.length >= 5000, s"expected a 10x corpus, got ${docs.length} docs")
    val batches = docs.grouped(1000).toSeq // k larger micro-batches
    val mem = MemoryStream[(Long, String)]
    val q = graft.streaming.StreamingDedup
      .candidatePairsStream(bandsOf(mem.toDF().toDF("doc_id", "text")))
      .writeStream.outputMode("append")
      .format("memory").queryName("dedup_pairs_10x").start()
    try {
      batches.foreach { b => mem.addData(b.toSeq); q.processAllAvailable() }
      val streamPairs = spark.table("dedup_pairs_10x").distinct()
      val got = streamPairs.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got === batchPairs,
        "10x stream pairs diverge from the batch generator on the same corpus")
      assert(got.size >= 10 * 32 / 2, s"10x corpus should carry 10x the dups: ${got.size}")
      // state is EXACTLY one row (one Set[Long]) per distinct band key —
      // the sizing claim in StreamingDedup's scaladoc, pinned at 10x
      val peakState = q.recentProgress.filter(_.stateOperators.nonEmpty)
        .map(_.stateOperators(0).numRowsTotal).max
      assert(peakState === distinctBandKeys,
        s"state rows $peakState != distinct band keys $distinctBandKeys")
      info(s"10x corpus: ${docs.length} docs in ${batches.length} micro-batches, " +
        s"${got.size} pairs, peak state rows = $peakState (= distinct band keys)")
      // Survivor equivalence follows: survivors are a deterministic function
      // (CC + min-id) of the pair set, the pair sets are asserted equal
      // above, and CC-derived survivors ≡ batch d7 is proven by the base
      // equivalence test — re-running CC on both equal inputs here would
      // only re-test CC against itself at local[4] minutes of cost.
    } finally q.stop()
  }

  test("ttl dedup: band-key state expires with the watermark and re-arrivals see only the live window") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def ts(s: Long) = new java.sql.Timestamp(s * 1000L)
    // three near-dup docs (same text => same band keys); c arrives long
    // after the 10 s TTL window holding a and b has expired
    val text = "alpha beta gamma delta epsilon zeta eta theta"
    val mem = MemoryStream[(Long, String, java.sql.Timestamp)]
    val streamBands = {
      val d = mem.toDF().toDF("doc_id", "text", "ts")
        .withWatermark("ts", "0 seconds")
        .select(col("doc_id"), col("ts"), split(col("text"), " ").as("w"))
        .filter(size(col("w")) >= 3)
        .withColumn("sh", graft.dedup.Dedup.shingles(col("w")))
      graft.dedup.Dedup.lshBandKeys(
        graft.dedup.Dedup.withMinhashSig(d, "sh", "sig")
          .select("doc_id", "sig", "ts"),
        "doc_id", "sig", carry = Seq("ts"))
    }
    val q = graft.streaming.StreamingDedup
      .candidatePairsStreamTtl(streamBands, ttlMs = 10000L)
      .writeStream.outputMode("append")
      .format("memory").queryName("ttl_pairs").start()
    try {
      // some progress entries (initializing ticks) carry no state operator
      def stateRows: Long =
        q.recentProgress.filter(_.stateOperators.nonEmpty)
          .last.stateOperators(0).numRowsTotal
      // batch 1: a near-dup pair inside the window -> emitted
      // start well past epoch: the initial watermark is 0 and rows at/below
      // it are dropped as late before reaching the stateful operator
      mem.addData((1L, text, ts(10)), (2L, text, ts(11)))
      q.processAllAvailable()
      val afterLive = stateRows
      assert(afterLive > 0, "live buckets should hold state")
      // batch 2: unrelated doc far past the TTL advances the watermark;
      // the watermark-catch-up batch Spark runs right after then fires the
      // event-time timeouts, dropping batch-1's buckets (deadline = last
      // arrival + 10 s << new watermark)
      mem.addData((50L, "one two three four five six", ts(100)))
      q.processAllAvailable()
      val removed = q.recentProgress.filter(_.stateOperators.nonEmpty)
        .map(_.stateOperators(0).numRowsRemoved.toLong).sum
      assert(removed >= afterLive,
        s"expected batch-1's $afterLive buckets to expire; removed=$removed")
      // batch 3: doc 3 is a near-dup of 1/2 but arrives after their window
      // expired — the sliding corpus must NOT pair it with history
      mem.addData((3L, text, ts(102)))
      q.processAllAvailable()
      val pairs = spark.table("ttl_pairs").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(pairs.exists(p => p == (1L, 2L)),
        s"in-window near-dups must still pair: $pairs")
      assert(!pairs.exists { case (a, b) => a == 3L || b == 3L },
        s"doc 3 paired against expired state: $pairs")
      // state is bounded by the LIVE window: doc 50's and doc 3's buckets
      // only — without expiry batch-1's buckets would still be here too
      assert(stateRows <= 2 * afterLive,
        s"state should track the live window, got $stateRows rows")
      // control: the UNBOUNDED-state variant pairs 3 with the full history
      // (same arrivals, no TTL) — proving expiry, not banding, is why doc 3
      // stayed single
      val mem2 = MemoryStream[(Long, String)]
      val bands2 = {
        val d = mem2.toDF().toDF("doc_id", "text")
          .select(col("doc_id"), split(col("text"), " ").as("w"))
          .filter(size(col("w")) >= 3)
          .withColumn("sh", graft.dedup.Dedup.shingles(col("w")))
        graft.dedup.Dedup.lshBandKeys(
          graft.dedup.Dedup.withMinhashSig(d, "sh", "sig").select("doc_id", "sig"),
          "doc_id", "sig")
      }
      val q2 = graft.streaming.StreamingDedup.candidatePairsStream(bands2)
        .writeStream.outputMode("append")
        .format("memory").queryName("ttl_pairs_control").start()
      try {
        mem2.addData((1L, text), (2L, text)); q2.processAllAvailable()
        mem2.addData((3L, text)); q2.processAllAvailable()
        val control = spark.table("ttl_pairs_control").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        assert(control.contains((1L, 3L)) && control.contains((2L, 3L)),
          s"control run should pair doc 3 with history: $control")
      } finally q2.stop()
    } finally q.stop()
  }

  test("session windows merge across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = EventStreams.sessionStats(mem.toDF())
      .writeStream.outputMode("complete")
      .format("memory").queryName("sess_out").start()
    try {
      mem.addData(ev(1, "2024-01-01 10:00:00"), ev(2, "2024-01-01 10:10:00"))
      mem.addData(ev(3, "2024-01-01 12:00:00")) // > 30 min gap -> new session
      q.processAllAvailable()
      val sessions = spark.table("sess_out").collect()
        .map(r => (r.getTimestamp(1).toString, r.getLong(3))).toSet
      assert(sessions === Set(
        ("2024-01-01 10:00:00.0", 2L), ("2024-01-01 12:00:00.0", 1L)))
    } finally q.stop()
  }
}
