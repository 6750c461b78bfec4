package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}

/** X1 — comment response linking (SURVEY.md §2.7): the reference's only
  * genuinely stateful operator (reference: src/index.mjs:59-81).
  *
  * For a comment whose content starts with k carets (`^^^` = "reply to the
  * 3rd comment above me"), walk backwards within the same video and link to
  * the k-th previous comment, *skipping* any comment that was already deleted
  * when the reply was written (deleted_at non-null and strictly earlier than
  * the reply's created_at — the replier couldn't see it, so their carets
  * didn't count it; reference src/index.mjs:70-73). Unresolvable (video
  * boundary / not enough history) leaves response_to null
  * (reference src/index.mjs:64-78).
  *
  * Spark shape: `groupByKey(video_id) -> flatMapGroups` — the shuffle on
  * video_id is the only exchange; within a group the scan is sequential
  * exactly as the semantics demand. Scale posture: group size is bounded by
  * comments-per-video (documented skew assumption, SURVEY §7.5 risk 6);
  * parallelism is across videos, which is the natural 100 TB partitioning.
  */
object CommentLinks {

  /** Input row; content carries the caret markers. */
  case class CommentRow(
      id: Long,
      video_id: Long,
      content: String,
      created_at: Timestamp,
      deleted_at: Option[Timestamp])

  /** Output row. */
  case class LinkedComment(id: Long, video_id: Long, response_to: Option[Long])

  /** Caret-run length at the start of content (reference src/index.mjs:62). */
  def caretCount(content: String): Int = {
    if (content == null) return 0
    var i = 0
    while (i < content.length && content.charAt(i) == '^') i += 1
    i
  }

  /** The per-group retained state: caret depth replaces the content string,
    * so a video's replay holds a few dozen bytes per comment, not the
    * comment bodies — the difference between "group size bounded by
    * comments-per-video" and "bounded by total comment TEXT per video" at
    * 100 TB.
    */
  private[ops] case class Marker(
      id: Long, video_id: Long, created_at: Timestamp,
      deleted_at: Option[Timestamp], k: Int)

  private def toMarker(r: CommentRow): Marker =
    Marker(r.id, r.video_id, r.created_at, r.deleted_at, caretCount(r.content))

  /** Link one video's comments, already sorted by id ascending. Faithful
    * transliteration of the reference's backward scan (src/index.mjs:64-78).
    */
  def linkGroup(rows: Array[CommentRow]): Iterator[LinkedComment] =
    linkMarkers(rows.map(toMarker))

  private def linkMarkers(rows: Array[Marker]): Iterator[LinkedComment] =
    rows.iterator.zipWithIndex.map { case (cur, i) =>
      var found: Option[Long] = None
      if (cur.k > 0) {
        var need = cur.k
        var j = i - 1
        while (j >= 0 && need > 0) {
          val prev = rows(j)
          // Skip: prev was already deleted when cur was written.
          val skip = prev.deleted_at.exists(d => d.before(cur.created_at))
          if (!skip) {
            need -= 1
            if (need == 0) found = Some(prev.id)
          }
          j -= 1
        }
      }
      LinkedComment(cur.id, cur.video_id, found)
    }

  /** Distributed form: shuffle by video, per-group in-memory ordered replay.
    * The iterator is mapped to markers BEFORE materializing, so content
    * strings are read once for the caret count and never retained.
    */
  def link(ds: Dataset[CommentRow]): DataFrame = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.groupByKey(_.video_id)
      .flatMapGroups { (_, it) => linkMarkers(it.map(toMarker).toArray.sortBy(_.id)) }
      .toDF()
  }

  /** The PATHOLOGICAL-group escape hatch SCALE.md documents: a fully
    * streaming replay whose retained history is bounded by caret
    * visibility instead of group size. [[link]] materializes one marker
    * array per video — fine to ~millions of comments; a single video at
    * 100 TB could hold more than a task's memory.
    *
    * Truncation rule (the "caret-free cut point", made precise): a marker
    * may be dropped from the front of the history once at least
    * `maxCaretDepth` NEVER-deleted markers follow it. A never-deleted
    * comment is visible to every later reply, so any future backward scan
    * with k ≤ maxCaretDepth finds its k-th visible predecessor among those
    * and never crosses the cut — dropped history is unreachable, equality
    * with the monolithic replay is exact (CommentLinksSpec + property).
    * Runs of never-deleted comments therefore let the history collapse to
    * ~maxCaretDepth markers; only a long run of EARLY-deleted comments
    * (which genuinely remain skippable) forces retention, because a reply
    * after such a run really can link arbitrarily far back.
    *
    * A comment whose caret run exceeds `maxCaretDepth` fails fast with the
    * offending id — with truncated history its link would be silently
    * wrong, and a bound on caret depth is the contract that makes
    * streaming replay possible at all (pick it ≥ the corpus max; carets
    * are typed by hand, the reference has no cap but real depth is tiny).
    */
  def linkStreaming(ds: Dataset[CommentRow], maxCaretDepth: Int = 64): DataFrame = {
    val spark = ds.sparkSession
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    // secondary sort: one exchange on video_id, per-partition sort by
    // (video_id, id) — groups arrive as consecutive sorted runs, so the
    // stream never holds anything but the bounded history
    ds.repartition(col("video_id"))
      .sortWithinPartitions("video_id", "id")
      .mapPartitions(it => linkMarkerStream(it.map(toMarker), maxCaretDepth))
      .toDF()
  }

  /** Per-partition streaming core of [[linkStreaming]]: input is
    * consecutive video runs, each sorted by id.
    */
  private[ops] def linkMarkerStream(rows: Iterator[Marker],
      maxCaretDepth: Int): Iterator[LinkedComment] = {
    val history = new scala.collection.mutable.ArrayDeque[Marker]()
    var live = 0 // never-deleted markers currently in history
    var curVideo = Long.MinValue
    var first = true
    rows.map { m =>
      if (first || m.video_id != curVideo) {
        curVideo = m.video_id; history.clear(); live = 0; first = false
      }
      require(m.k <= maxCaretDepth,
        s"comment ${m.id}: caret depth ${m.k} exceeds maxCaretDepth=$maxCaretDepth — " +
          "raise the bound or use the monolithic link()")
      var found: Option[Long] = None
      if (m.k > 0) {
        var need = m.k
        var j = history.length - 1
        while (j >= 0 && need > 0) {
          val prev = history(j)
          if (!prev.deleted_at.exists(_.before(m.created_at))) {
            need -= 1
            if (need == 0) found = Some(prev.id)
          }
          j -= 1
        }
      }
      history.append(m)
      if (m.deleted_at.isEmpty) live += 1
      // drop the unreachable prefix: everything before the point where
      // maxCaretDepth never-deleted markers still follow
      while (live - (if (history.head.deleted_at.isEmpty) 1 else 0) >= maxCaretDepth) {
        if (history.removeHead().deleted_at.isEmpty) live -= 1
      }
      LinkedComment(m.id, m.video_id, found)
    }
  }

  /** [[linkMarkerStream]] over one in-memory group — the testable face the
    * equality property drives against [[linkGroup]].
    */
  def linkGroupStreaming(rows: Array[CommentRow],
      maxCaretDepth: Int = 64): Iterator[LinkedComment] =
    linkMarkerStream(rows.iterator.map(toMarker), maxCaretDepth)

  /** SURVEY §2.7's option (b): the same semantics as a window expression —
    * collect each comment's predecessors, filter to the ones visible at
    * reply time, take the k-th from the end. Declarative cross-check for
    * [[link]] (equality asserted in CommentLinksSpec); the flatMapGroups
    * form is the production path (no per-row predecessor lists).
    */
  def linkViaWindow(comments: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val w = Window.partitionBy(col("video_id")).orderBy(col("id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    comments
      .withColumn("k", Cleansing.caretDepth(col("content")))
      .withColumn("prev",
        collect_list(struct(col("id").as("pid"), col("deleted_at").as("pdel"))).over(w))
      .select(col("id"), col("video_id"),
        when(col("k") > 0,
          try_element_at(
            filter(col("prev"),
              p => p.getField("pdel").isNull || p.getField("pdel") >= col("created_at")),
            -col("k")).getField("pid"))
          .as("response_to"))
  }
}
