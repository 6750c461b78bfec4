package graft

import graft.ops.CommentLinks
import graft.ops.CommentLinks.{CommentRow, LinkedComment}

/** X1 canonical fixture (FIXTURES.md §B): every edge case of the reference's
  * backward skip-scan (src/index.mjs:59-81).
  */
class CommentLinksSpec extends SparkSpec {

  private def row(id: Long, vid: Long, content: String, at: String,
      del: Option[String] = None) =
    CommentRow(id, vid, content, ts(at), del.map(ts))

  private val fixture = Seq(
    row(1, 1, "first", "2024-01-01 10:00:00"),
    row(2, 1, "^x", "2024-01-01 10:01:00"),
    row(3, 1, "deleted early", "2024-01-01 10:02:00", Some("2024-01-01 10:03:00")),
    row(4, 1, "^y", "2024-01-01 10:04:00"),
    row(5, 1, "^^z", "2024-01-01 10:05:00"),
    row(6, 1, "del later", "2024-01-01 10:06:00", Some("2024-01-01 10:30:00")),
    row(7, 1, "^w", "2024-01-01 10:07:00"),
    row(8, 1, "^^^^^^^^", "2024-01-01 10:08:00"),
    row(10, 1, "plain", "2024-01-01 10:09:00"),
    row(9, 2, "^a", "2024-01-01 10:00:00"))

  private lazy val linked: Map[Long, Option[Long]] = {
    import spark.implicits._
    CommentLinks.link(spark.createDataset(fixture))
      .as[LinkedComment].collect().map(l => l.id -> l.response_to).toMap
  }

  test("plain reply links one up") { assert(linked(2) === Some(1L)) }

  test("reply skips a comment deleted before it was written") {
    assert(linked(4) === Some(2L)) // id 3 deleted 10:03 < 10:04
  }

  test("deep reply counts only visible comments") {
    assert(linked(5) === Some(2L)) // ^^ over [4, (3 skipped), 2]
  }

  test("no skip when deletion happened after the reply") {
    assert(linked(7) === Some(6L)) // id 6 deleted 10:30 >= 10:07
  }

  test("caret run longer than visible history stays unresolved") {
    assert(linked(8) === None) // 8 carets, 6 visible predecessors
  }

  test("video boundary bails out") { assert(linked(9) === None) }

  test("non-reply rows get no link") {
    assert(linked(1) === None && linked(10) === None)
  }

  test("window formulation agrees with the flatMapGroups scan on the fixture") {
    import spark.implicits._
    val df = spark.createDataset(fixture).toDF()
    val viaWindow = CommentLinks.linkViaWindow(df)
      .collect().map(r => r.getLong(0) -> Option(r.getAs[java.lang.Long](2)).map(_.toLong)).toMap
    assert(viaWindow === linked)
  }

  test("randomized invariants: earlier id, same video, visible at reply time") {
    val rnd = new scala.util.Random(42)
    val comments = (1 to 400).map { i =>
      val vid = rnd.nextInt(5).toLong
      val at = ts(f"2024-01-01 10:${i / 60}%02d:${i % 60}%02d")
      val del = if (rnd.nextInt(4) == 0)
        Some(new java.sql.Timestamp(at.getTime + (rnd.nextInt(7) - 3) * 60000L))
      else None
      CommentRow(i.toLong, vid, "^" * rnd.nextInt(5) + "t", at, del)
    }
    val byId = comments.map(c => c.id -> c).toMap
    import spark.implicits._
    val out = CommentLinks.link(spark.createDataset(comments))
      .as[LinkedComment].collect()
    assert(out.length === comments.length)
    out.foreach { l =>
      l.response_to.foreach { r =>
        val target = byId(r)
        val self = byId(l.id)
        assert(r < l.id, s"link must point backwards: $l")
        assert(target.video_id === self.video_id, s"cross-video link: $l")
        assert(!target.deleted_at.exists(_.before(self.created_at)),
          s"linked to a comment invisible at reply time: $l")
      }
    }
    // sanity: the scan actually links things in this data
    assert(out.count(_.response_to.isDefined) > 100)

    // cross-implementation: window formulation agrees on all 400 random rows
    val viaWindow = CommentLinks.linkViaWindow(spark.createDataset(comments).toDF())
      .collect().map(r => r.getLong(0) -> Option(r.getAs[java.lang.Long](2)).map(_.toLong)).toMap
    assert(viaWindow === out.map(l => l.id -> l.response_to).toMap)
  }

  test("pathological skew: one video holding 100k comments with 2KB bodies") {
    // SCALE.md documents X1's skew assumption as "group memory bounded by
    // comment COUNT, not text": the Marker projection drops content before
    // the group materializes. This group carries ~200MB of content through
    // one flatMapGroups group — retained markers are ~5MB. If a regression
    // ever re-materializes CommentRow (content included) per group, this
    // test is the one that degrades; the documented fallback is chunked
    // replay (split the group at caret-free comments, whose links cannot
    // cross the cut, and carry only the running visible count between
    // chunks).
    import spark.implicits._
    val n = 100000
    val base = ts("2024-01-01 00:00:00").getTime
    val comments = spark.range(1, n + 1).map { i =>
      // content generated executor-side: k = i%4 carets + a 2KB body; every
      // 10th comment is deleted in the FAR future (visible to all repliers),
      // so the expected link has a closed form: id - k.
      val del = if (i % 10 == 0)
        Some(new java.sql.Timestamp(base + 10000000000L)) else None
      CommentRow(i, 1L, "^" * (i % 4).toInt + ("x" * 2048),
        new java.sql.Timestamp(base + i * 1000L), del)
    }
    val out = CommentLinks.link(comments).as[LinkedComment].collect()
    assert(out.length === n)
    out.foreach { l =>
      val k = (l.id % 4).toInt
      val expected = if (k > 0 && l.id - k >= 1) Some(l.id - k) else None
      assert(l.response_to === expected, s"closed-form mismatch at id ${l.id}")
    }

    // the chunked/streaming fallback must agree row-for-row on the same
    // pathological group — and with a TIGHT bound (maxCaretDepth=4, max
    // observed k=3) its history stays a few dozen markers deep while the
    // monolithic replay holds all 100k
    val streamed = CommentLinks.linkStreaming(comments, maxCaretDepth = 4)
      .as[LinkedComment].collect()
    assert(streamed.map(l => l.id -> l.response_to).toMap ===
      out.map(l => l.id -> l.response_to).toMap)
  }

  test("streaming replay agrees with the monolithic scan on the edge-case fixture") {
    import spark.implicits._
    val streamed = CommentLinks.linkStreaming(spark.createDataset(fixture))
      .as[LinkedComment].collect().map(l => l.id -> l.response_to).toMap
    assert(streamed === linked)
  }

  test("streaming replay fails fast when a caret run exceeds the bound") {
    val rows = Array(
      row(1, 1, "a", "2024-01-01 10:00:00"),
      row(2, 1, "^^^^^x", "2024-01-01 10:01:00"))
    val e = intercept[IllegalArgumentException] {
      CommentLinks.linkGroupStreaming(rows, maxCaretDepth = 3).toList
    }
    assert(e.getMessage.contains("caret depth 5"))
  }
}
