package graft

import org.apache.spark.sql.DataFrame

import graft.queries.EventQueries

// top-level so Spark can derive its encoder without an outer-scope instance
private[graft] case class EvqRow(event_id: Long, ts: java.sql.Timestamp,
    user_id: Long, event_type: String, value: Double, props: String)

/** Pins the round-11 event-analytics pair (ev5 transition matrix, ev6
  * session sequences) on a hand-crafted fixture where every transition and
  * session boundary is enumerable by eye — complementing the full-fixture
  * DuckDB oracle with the edge cases the oracle's data may never hit:
  * exact-1800s gaps, same-timestamp ties, single-event sessions.
  */
class EventQueriesSpec extends SparkSpec {

  private def ev(id: Long, user: Long, at: String, typ: String) =
    EvqRow(id, ts(at), user, typ, 1.0, "{}")

  // user 1: view -> click -> view -> purchase   (3 transitions)
  // user 2: view -> view                        (1 transition)
  // user 3: two events at the SAME timestamp — event_id breaks the tie, so
  //         the one transition is click -> error (ids 6 then 7), never the
  //         reverse.
  // user 4: a single event — no transitions, but ev6 must still emit its
  //         one-event session.
  private lazy val fixtureDir: String = {
    import spark.implicits._
    val rows = Seq(
      ev(1, 1, "2024-01-01 10:00:00", "view"),
      ev(2, 1, "2024-01-01 10:05:00", "click"),
      ev(3, 1, "2024-01-01 10:35:00", "view"),     // 1800s gap: SAME session
      ev(4, 1, "2024-01-01 11:05:01", "purchase"), // 1801s gap: NEW session
      ev(5, 2, "2024-01-01 09:00:00", "view"),
      ev(8, 2, "2024-01-01 09:10:00", "view"),
      ev(6, 3, "2024-01-01 12:00:00", "click"),
      ev(7, 3, "2024-01-01 12:00:00", "error"),
      ev(9, 4, "2024-01-01 08:00:00", "signup"))
    val dir = java.nio.file.Files.createTempDirectory("graft-evq").toString
    rows.toDF().write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  private def run(name: String): DataFrame =
    EventQueries.queries(name)(spark, fixtureDir)

  test("ev5: transition counts follow the (ts, event_id) total order") {
    val rows = run("ev5_transition_matrix").collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(rows === Map(
      ("view", "click") -> 1L,     // user 1
      ("click", "view") -> 1L,     // user 1
      ("view", "purchase") -> 1L,  // user 1
      ("view", "view") -> 1L,      // user 2
      ("click", "error") -> 1L))   // user 3 same-ts pair, id order 6 -> 7
    // row count = observed (from, to) pairs only — no zero-filled cells
    assert(rows.size === 5)
  }

  test("ev5: probabilities sum to 1 per from_state") {
    val df = run("ev5_transition_matrix")
    val sums = df.groupBy("from_state")
      .agg(org.apache.spark.sql.functions.sum("p").as("s"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(sums.keySet === Set("view", "click"))
    // p is rounded to 6 decimals (the oracle's contract), so each row can
    // carry up to 5e-7 of rounding residue — e.g. view's three exact thirds
    // sum to 0.999999, not 1.0
    sums.foreach { case (from, s) =>
      assert(math.abs(s - 1.0) < 5e-6, s"from_state=$from sums to $s")
    }
    // and the view row split is the exact 1/3s (rounded to 6 — the oracle's
    // rounding contract)
    val viewP = df.collect()
      .filter(_.getString(0) == "view")
      .map(r => r.getString(1) -> r.getDouble(3)).toMap
    assert(viewP === Map(
      "click" -> 0.333333, "purchase" -> 0.333333, "view" -> 0.333333))
  }

  test("ev6: a gap of exactly 1800s does NOT split; 1801s does (> semantics, matches ev2)") {
    val rows = run("ev6_session_sequences").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getString(3), r.getString(4)))
      .toMap
    // user 1: ids 1-3 ride one session through the boundary-equal gap;
    // id 4 (gap 1801s) opens session 2
    assert(rows((1L, 1L)) === ((3L, "view click view", "view")))
    assert(rows((1L, 2L)) === ((1L, "purchase", "purchase")))
    // user 4's single event is still a (1-event) session
    assert(rows((4L, 1L)) === ((1L, "signup", "signup")))
    assert(rows.size === 5) // u1 x2, u2 x1, u3 x1, u4 x1
  }

  test("ev5b: a lone cohort matches the global matrix exactly (zero divergence)") {
    // every fixture user first appears in the same ISO week -> one cohort
    // whose counts ARE the global counts, so exp == obs per cell and all
    // chi-square contributions are exactly 0; ranking then falls to the
    // (from_state, to_state) tie-break — pinning the deterministic order
    val rows = run("ev5b_transition_divergence").collect()
      .map(r => (r.getString(1), r.getString(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5), r.getLong(6)))
    assert(rows.length === 5, "top-5 of the single cohort's 5 cells")
    rows.foreach { case (from, to, n, exp, contrib, _) =>
      assert(exp === n.toDouble, s"cohort==corpus must give exp=obs for $from->$to")
      assert(contrib === 0.0)
    }
    assert(rows.sortBy(_._6).map(r => (r._1, r._2)).toSeq === Seq(
      ("click", "error"), ("click", "view"), ("view", "click"),
      ("view", "purchase"), ("view", "view")))
  }

  test("ev5c: incremental apply equals full recompute across the cutoff boundary") {
    import spark.implicits._
    // straddles the 2024-01-28 cutoff: user 10's boundary transition
    // (standing click -> arrival view) and arrival-to-arrival pair, user 11
    // entirely standing, user 12 arrivals-only (no boundary predecessor)
    val rows = Seq(
      ev(1, 10, "2024-01-27 23:50:00", "click"),
      ev(2, 10, "2024-01-28 00:10:00", "view"),
      ev(3, 10, "2024-01-28 00:20:00", "purchase"),
      ev(4, 11, "2024-01-05 10:00:00", "view"),
      ev(5, 11, "2024-01-05 10:05:00", "view"),
      ev(6, 12, "2024-01-29 09:00:00", "signup"),
      ev(7, 12, "2024-01-29 09:10:00", "view"))
    val dir = java.nio.file.Files.createTempDirectory("graft-ev5c").toString
    rows.toDF().write.mode("overwrite").parquet(s"$dir/events.parquet")
    def rowSet(name: String) = EventQueries.queries(name)(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    val full = rowSet("ev5_transition_matrix")
    val incr = rowSet("ev5c_transition_incremental")
    assert(incr === full, "apply(standing, arrivals) must reproduce the recompute")
    // and the boundary pair itself made it in
    assert(full.exists(r => r._1 == "click" && r._2 == "view" && r._3 == 1L))
  }

  test("ev6b: the secondary-sort single-pass route emits exactly ev6's rows") {
    val window = run("ev6_session_sequences").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3), r.getString(4)))
      .toSet
    val singlePass = run("ev6b_session_sequences_stateful").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3), r.getString(4)))
      .toSet
    assert(singlePass === window,
      "two physical routes, one semantics — including the exact-1800s and same-ts edges")
  }

  test("ev6c: the split-at-N cap chunks gap sessions and renumbers densely") {
    // ev6CapN = 2 on this fixture: user 1's 3-event gap session splits into
    // [view click] + [view] (a cap split mid-gap-session — the purchase still
    // opens its own gap session, now at sess_idx 3); users 2 and 3 sit at
    // exactly the cap (no split); user 4 under it.
    assert(EventQueries.ev6CapN === 2, "test enumerations assume cap = 2")
    val rows = run("ev6c_session_sequences_capped").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getString(3), r.getString(4)))
      .toMap
    assert(rows === Map(
      (1L, 1L) -> ((2L, "view click", "click")),
      (1L, 2L) -> ((1L, "view", "view")),
      (1L, 3L) -> ((1L, "purchase", "purchase")),
      (2L, 1L) -> ((2L, "view view", "view")),
      (3L, 1L) -> ((2L, "click error", "error")),
      (4L, 1L) -> ((1L, "signup", "signup"))))
    // the cap loses no events: per-user seq concatenation equals ev6's
    val uncapped = run("ev6_session_sequences").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(3)))
    def concat(rs: Seq[(Long, Long, String)]) =
      rs.groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).mkString(" ")).toMap
    assert(concat(rows.toSeq.map { case ((u, i), (_, s, _)) => (u, i, s) })
      === concat(uncapped.toSeq))
  }

  test("ev7: grid spans first to last hour, gaps carry the last value forward") {
    import spark.implicits._
    // user 1: observations at 10:xx (two events — the LATER one, value 2.0,
    // must win the hour) and 13:05; hours 11 and 12 are silent and must
    // inherit 2.0. user 2: a single event — a one-row grid.
    val rows = Seq(
      EvqRow(1, ts("2024-01-01 10:10:00"), 1, "view", 1.0, "{}"),
      EvqRow(2, ts("2024-01-01 10:40:00"), 1, "view", 2.0, "{}"),
      EvqRow(3, ts("2024-01-01 13:05:00"), 1, "view", 7.5, "{}"),
      EvqRow(4, ts("2024-01-01 09:59:59"), 2, "click", 4.0, "{}"))
    val dir = java.nio.file.Files.createTempDirectory("graft-ev7").toString
    rows.toDF().write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = EventQueries.queries("ev7_gapfill_locf")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).toString,
        r.getDouble(2), r.getLong(3))).sortBy(t => (t._1, t._2))
    assert(got === Array(
      (1L, "2024-01-01 10:00:00.0", 2.0, 2L),
      (1L, "2024-01-01 11:00:00.0", 2.0, 0L),   // silent: carried forward
      (1L, "2024-01-01 12:00:00.0", 2.0, 0L),
      (1L, "2024-01-01 13:00:00.0", 7.5, 1L),
      (2L, "2024-01-01 09:00:00.0", 4.0, 1L)))
  }

  test("ev6: label is the last event by (ts, event_id); seq length matches n_events") {
    val rows = run("ev6_session_sequences").collect()
    rows.foreach { r =>
      val (n, seq, label) = (r.getLong(2), r.getString(3), r.getString(4))
      val toks = seq.split(" ")
      assert(toks.length.toLong === n, s"seq token count vs n_events for $r")
      assert(toks.last === label, s"label must be the seq's last token for $r")
    }
    // the same-timestamp pair resolves by event_id: 6 (click) then 7 (error)
    val u3 = rows.find(r => r.getLong(0) == 3L).get
    assert(u3.getString(3) === "click error")
    assert(u3.getString(4) === "error")
  }
}
