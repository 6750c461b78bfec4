package graft

import java.sql.DriverManager

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.sources.{JdbcEdges, JdbcExactlyOnce}
import graft.streaming.EventStreams

/** Exactly-once JDBC publishing ([[JdbcExactlyOnce]]) against a live
  * embedded Derby: batch replay is a no-op, a crashed partial stage is
  * wiped, and a checkpoint-restarted stream neither loses nor duplicates.
  */
class JdbcExactlyOnceSpec extends SparkSpec {

  private val conn =
    JdbcEdges.Conn("jdbc:derby:memory:graftxo;create=true", "app", "app")

  private def exec(sql: String): Unit = {
    val c = DriverManager.getConnection(conn.url, conn.props)
    try { val st = c.createStatement(); try st.execute(sql) finally st.close() }
    finally c.close()
  }
  private def queryLongs(sql: String): Seq[Long] = {
    val c = DriverManager.getConnection(conn.url, conn.props)
    try {
      val st = c.createStatement()
      try {
        val rs = st.executeQuery(sql)
        val b = Seq.newBuilder[Long]
        while (rs.next()) b += rs.getLong(1)
        b.result()
      } finally st.close()
    } finally c.close()
  }

  private val targetCols = Seq("event_id BIGINT", "user_id BIGINT", "val DOUBLE")
  exec("CREATE TABLE sink_target (event_id BIGINT, user_id BIGINT, val DOUBLE)")
  exec(JdbcExactlyOnce.stagingDdl("sink_staging", targetCols))
  exec(JdbcExactlyOnce.ledgerDdl("sink_ledger"))

  private def df(ids: Long*) = {
    import spark.implicits._
    ids.map(i => (i, i % 3, i * 0.5)).toDF("event_id", "user_id", "val")
  }
  private def targetIds =
    queryLongs("SELECT event_id FROM sink_target ORDER BY event_id")
  private def wipe(): Unit = Seq("sink_target", "sink_staging", "sink_ledger")
    .foreach(t => exec(s"DELETE FROM $t"))

  test("replayed batchId publishes nothing (post-commit crash replay)") {
    wipe()
    assert(JdbcExactlyOnce.publish(conn, "sink_target", "sink_staging",
      "sink_ledger", df(1, 2, 3), batchId = 0))
    assert(!JdbcExactlyOnce.publish(conn, "sink_target", "sink_staging",
      "sink_ledger", df(1, 2, 3), batchId = 0))
    assert(targetIds === Seq(1L, 2L, 3L))
    assert(queryLongs("SELECT count(*) FROM sink_staging") === Seq(0L))
    assert(queryLongs("SELECT batch_id FROM sink_ledger") === Seq(0L))
  }

  test("a dead attempt's stray rows are never published and the winner sweeps them") {
    wipe()
    // simulate a delivery that died mid-stage: its half-staged rows carry
    // a different attempt id, so the replay's publish must not see them —
    // and the winning transaction's cleanup removes them anyway
    exec("INSERT INTO sink_staging VALUES (-999, 0, 0.0, 1, 'dead-attempt')")
    assert(JdbcExactlyOnce.publish(conn, "sink_target", "sink_staging",
      "sink_ledger", df(10, 11), batchId = 1))
    assert(targetIds === Seq(10L, 11L), "stray staged row leaked or batch lost")
    assert(queryLongs("SELECT count(*) FROM sink_staging") === Seq(0L))
  }

  test("checkpoint-restarted stream loses nothing and duplicates nothing") {
    wipe()
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ckpt = java.nio.file.Files.createTempDirectory("graft-xo-ckpt").toString
    val writer = JdbcExactlyOnce.writer(
      conn, "sink_target", "sink_staging", "sink_ledger")
    val mem1 = MemoryStream[Long]
    def toBatch(d: org.apache.spark.sql.DataFrame) = d
      .select($"value".as("event_id"), ($"value" % 3).as("user_id"),
        ($"value" * 0.5).as("val"))
    val q1 = EventStreams.sinkEachBatch(toBatch(mem1.toDF()), writer)
      .option("checkpointLocation", ckpt).start()
    try { mem1.addData(1L, 2L); q1.processAllAvailable() } finally q1.stop()

    // re-deliver the processed batch by hand (what a crash-restart does):
    // same batchId, same rows — the ledger must swallow it
    assert(!JdbcExactlyOnce.publish(conn, "sink_target", "sink_staging",
      "sink_ledger", df(1, 2), batchId = 0))

    // a NEW source instance resuming from the same checkpoint continues
    // with fresh data (batchIds advance past the ledger's high-water mark)
    val mem2 = MemoryStream[Long]
    mem2.addData(1L, 2L) // checkpoint says batch 0 is done; these re-offer
    val q2 = EventStreams.sinkEachBatch(toBatch(mem2.toDF()), writer)
      .option("checkpointLocation", ckpt).start()
    try { mem2.addData(3L, 4L); q2.processAllAvailable() } finally q2.stop()

    assert(targetIds === Seq(1L, 2L, 3L, 4L),
      "restart lost or duplicated rows")
  }
}
