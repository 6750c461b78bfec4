package graft.sources

import java.sql.{Connection, DriverManager}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.lit

import JdbcEdges.Conn

/** Exactly-once micro-batch publishing into a JDBC sink — the missing half
  * of `EventStreams.sinkEachBatch`, whose docstring makes idempotence "the
  * caller's contract". This is that caller.
  *
  * Structured Streaming's foreachBatch gives at-least-once: after a crash
  * the last batch is RE-DELIVERED with the SAME batchId. The standard fix
  * (stage-then-publish with a batch ledger) turns replay into a no-op:
  *
  *   1. if `batchId` is already in the ledger → the batch committed fully
  *      on a previous delivery; skip (replay after a post-commit crash);
  *   2. distributed append of the batch into the staging table, tagged
  *      with (batchId, a fresh per-delivery attempt id) — Spark's normal
  *      parallel JDBC write: per-partition connections, multi-row
  *      batches, the 1000-executor path. The attempt tag is what makes
  *      concurrent deliveries safe: NOBODY deletes or reads another
  *      attempt's rows outside the winner's transaction, so a slow
  *      concurrent delivery can neither lose rows to a racer's cleanup
  *      nor leak half-staged rows into a racer's publish;
  *   3. one driver-side transaction: INSERT the ledger row (its PRIMARY
  *      KEY doubles as a publish lock — a concurrent delivery hits a
  *      duplicate-key error and skips), INSERT INTO target SELECT ...
  *      FROM staging WHERE batch_id = ? AND attempt = ? (this delivery's
  *      fully-staged rows ONLY), DELETE the batch's staging rows (all
  *      attempts), COMMIT.
  *
  * Either the ledger row, the target rows, and the staging cleanup all
  * commit, or none do — so "in the ledger" is exactly "published once".
  * The publish moves rows inside the database (INSERT..SELECT); no data
  * returns through the driver, so batch size is bounded by the sink's
  * transaction capacity, not driver memory.
  *
  * Crash matrix (delivery d crashes, delivery d+1 replays the batchId):
  * mid-step-2 → the dead attempt's partial rows are ignored (new attempt
  * id) and swept by the eventual winner's cleanup; between 2 and 3 →
  * ledger miss, restage under a new attempt (wasted work, no dupes);
  * mid-step-3 → the DB rolls back, as before; after COMMIT → step 1
  * skips. Zombie-writer race (two live deliveries of one batchId — rare;
  * Spark runs foreachBatch serially per query): the ledger PRIMARY KEY
  * elects one publisher; the loser's staged rows are removed by the
  * winner's cleanup, or — if the loser staged after that cleanup — left
  * orphaned under a committed batchId, never published (the ledger row
  * blocks the batchId forever); reclaim with `DELETE FROM staging WHERE
  * batch_id IN (SELECT batch_id FROM ledger)` at maintenance time.
  *
  * Reference anchor: the reference migration's sink is Postgres with
  * ON CONFLICT DO NOTHING (src/queries.mjs:5-9) — row-level idempotence
  * that needs a natural key. This is the batch-level analog for
  * append-only streams with no such key (duplicate EVENTS are legitimate;
  * duplicate DELIVERIES are not).
  */
object JdbcExactlyOnce {

  /** Portable DDL for the ledger. The PRIMARY KEY is load-bearing (step 3's
    * publish lock), not decorative.
    */
  def ledgerDdl(ledger: String): String =
    s"CREATE TABLE $ledger (batch_id BIGINT NOT NULL PRIMARY KEY)"

  /** Staging DDL: the target's columns plus the delivery tags. `targetCols`
    * as "name TYPE" fragments, matching the target's own DDL.
    */
  def stagingDdl(staging: String, targetCols: Seq[String]): String =
    s"CREATE TABLE $staging (${targetCols.mkString(", ")}, " +
      "batch_id BIGINT NOT NULL, attempt VARCHAR(36) NOT NULL)"

  private def withConnection[A](conn: Conn)(f: Connection => A): A = {
    val c = DriverManager.getConnection(conn.url, conn.props)
    try f(c) finally c.close()
  }

  private def committed(c: Connection, ledger: String, batchId: Long): Boolean = {
    val ps = c.prepareStatement(s"SELECT 1 FROM $ledger WHERE batch_id = ?")
    try { ps.setLong(1, batchId); val rs = ps.executeQuery(); rs.next() }
    finally ps.close()
  }

  /** Unique-constraint violations are the expected lost-the-race signal,
    * but drivers disagree on the exception type: Derby/MySQL raise
    * SQLIntegrityConstraintViolationException, Postgres raises a plain
    * SQLException subclass carrying SQLSTATE 23505 (unique_violation).
    * Anything else is a real failure and must propagate.
    */
  private def isUniqueViolation(e: java.sql.SQLException): Boolean =
    e.isInstanceOf[java.sql.SQLIntegrityConstraintViolationException] ||
      e.getSQLState == "23505"

  /** The foreachBatch writer. Column names are read from each batch's
    * schema, so the target insert list always matches what was staged.
    * Returns true if this call published, false if the ledger already had
    * the batch (useful to specs; foreachBatch ignores it).
    */
  def publish(conn: Conn, target: String, staging: String, ledger: String,
      batch: DataFrame, batchId: Long, batchSize: Int = 10000): Boolean = {
    val cols = batch.schema.fieldNames.toSeq
    require(!cols.exists(c => c.equalsIgnoreCase("batch_id") ||
        c.equalsIgnoreCase("attempt")),
      "batch must not already carry a batch_id/attempt column")
    // step 1: replay after a post-commit crash — nothing to do
    val already = withConnection(conn)(committed(_, ledger, batchId))
    if (already) return false
    // step 2: distributed stage under this delivery's own attempt tag —
    // concurrent/dead attempts' rows are invisible to this delivery
    val attempt = java.util.UUID.randomUUID().toString
    JdbcEdges.writeAppend(
      batch.withColumn("batch_id", lit(batchId))
        .withColumn("attempt", lit(attempt)),
      conn, staging, batchSize)
    // step 3: atomic publish — ledger row is the lock
    withConnection(conn) { c =>
      c.setAutoCommit(false)
      try {
        val led = c.prepareStatement(s"INSERT INTO $ledger (batch_id) VALUES (?)")
        val gotLock =
          try { led.setLong(1, batchId); led.executeUpdate(); true }
          catch { // lost the race to another delivery of this batch
            case e: java.sql.SQLException if isUniqueViolation(e) => false
          } finally led.close()
        if (!gotLock) { c.rollback(); false }
        else {
          val colList = cols.mkString(", ")
          val pub = c.prepareStatement(
            s"INSERT INTO $target ($colList) SELECT $colList FROM $staging " +
              "WHERE batch_id = ? AND attempt = ?")
          try {
            pub.setLong(1, batchId); pub.setString(2, attempt)
            pub.executeUpdate()
          } finally pub.close()
          val clean = c.prepareStatement(s"DELETE FROM $staging WHERE batch_id = ?")
          try { clean.setLong(1, batchId); clean.executeUpdate() } finally clean.close()
          c.commit()
          true
        }
      } catch {
        case e: Throwable => c.rollback(); throw e
      } finally c.setAutoCommit(true)
    }
  }

  /** Curried form shaped for `EventStreams.sinkEachBatch`. */
  def writer(conn: Conn, target: String, staging: String, ledger: String,
      batchSize: Int = 10000): (DataFrame, Long) => Unit =
    (batch, batchId) =>
      publish(conn, target, staging, ledger, batch, batchId, batchSize)
}
