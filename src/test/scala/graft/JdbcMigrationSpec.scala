package graft

import java.sql.DriverManager

import graft.ops.Migration
import graft.sources.JdbcEdges

/** LIVE JDBC round-trip of the full migration DAG — the reference's defining
  * act (src/index.mjs:11-12: read one engine, write another) driven against
  * an embedded Apache Derby database (ships in /opt/spark/jars; in-memory,
  * zero-egress). Covers the edges the parquet fixtures can't:
  *
  *   - S1/S2 over real JDBC: partitioned read (one bounded query per id
  *     range) + small-table reads, including reserved-word columns
  *     ("from"/"to" on messages — dialect quoting must hold)
  *   - S7 cross-engine read-back: playlists live only in the database, like
  *     the reference's pre-existing target table (queries.mjs:14)
  *   - K1 batched appends of every target table over real INSERTs
  *   - K3 live: ALTER ... RESTART WITH next-id computed by
  *     [[Migration.nextSequenceValue]], then a DEFAULT-id insert proving the
  *     sequence actually moved (Derby's identity-restart ≙ Postgres's
  *     ALTER SEQUENCE, reference src/queries.mjs:16)
  *   - K4's epilogue path: physical-layout DDL through [[JdbcEdges.runStatements]]
  *
  * MariaDB zero-dates ("0000-00-00 ...") arrive as VARCHAR exactly as the
  * mysql driver hands them to the reference (index.mjs:23-26), and the
  * cleansing happens in-engine.
  */
class JdbcMigrationSpec extends SparkSpec {

  private val conn = JdbcEdges.Conn("jdbc:derby:memory:graftmig;create=true", "app", "app")

  // Spark's built-in DerbyDialect maps StringType -> CLOB, so a NULL string
  // parameter is sent as setNull(Types.CLOB) and Derby refuses it against
  // the schema's VARCHAR columns. Map strings to VARCHAR for this sink (a
  // real Postgres sink uses Spark's PostgresDialect, where TEXT is fine);
  // everything else falls through to the common JDBC mappings.
  private object DerbyVarcharDialect extends org.apache.spark.sql.jdbc.JdbcDialect {
    override def canHandle(url: String): Boolean = url.startsWith("jdbc:derby")
    override def getJDBCType(dt: org.apache.spark.sql.types.DataType) = dt match {
      case org.apache.spark.sql.types.StringType =>
        Some(org.apache.spark.sql.jdbc.JdbcType("VARCHAR(256)", java.sql.Types.VARCHAR))
      case _ => None
    }
  }
  org.apache.spark.sql.jdbc.JdbcDialects.registerDialect(DerbyVarcharDialect)

  private def exec(sql: String*): Unit = {
    val c = DriverManager.getConnection(conn.url)
    try sql.foreach { s => val st = c.createStatement(); try st.execute(s) finally st.close() }
    finally c.close()
  }

  /** Source + pre-existing-target DDL and fixture rows (FIXTURES.md §B). */
  private lazy val seeded: Unit = {
    exec(
      """CREATE TABLE src_users (
           id BIGINT, username VARCHAR(64), password VARCHAR(64),
           created_at TIMESTAMP, updated_at TIMESTAMP, deleted_at TIMESTAMP,
           banend VARCHAR(32), banreason VARCHAR(64), categories VARCHAR(256))""",
      """INSERT INTO src_users VALUES
           (1, 'alice', 'bcrypt$xyz', TIMESTAMP('2020-01-01 00:00:00'), NULL, NULL,
            NULL, NULL, '["sfw","nsfw"]'),
           (2, 'bob', 'crypt$abc', TIMESTAMP('2020-01-02 00:00:00'), NULL, NULL,
            '0000-00-00 00:00:00', 'spam', '[]'),
           (3, 'carol', 'x', TIMESTAMP('2020-01-03 00:00:00'), NULL, NULL,
            '2021-05-01 12:00:00', 'flood', NULL)""",
      """CREATE TABLE src_videos (
           id BIGINT, file VARCHAR(64), created_at TIMESTAMP,
           updated_at TIMESTAMP, deleted_at TIMESTAMP, hash VARCHAR(64))""",
      """INSERT INTO src_videos VALUES
           (10, 'a.webm', TIMESTAMP('2020-02-01 00:00:00'), NULL, NULL, 'h10'),
           (11, 'b.webm', TIMESTAMP('2020-02-02 00:00:00'), NULL, NULL, 'h11'),
           (12, 'untagged.webm', TIMESTAMP('2020-02-03 00:00:00'), NULL, NULL, 'h12')""",
      "CREATE TABLE src_taggable_taggables (taggable_id BIGINT, tag_id BIGINT)",
      "INSERT INTO src_taggable_taggables VALUES (10, 100), (10, 101), (11, 101)",
      "CREATE TABLE src_taggable_tags (tag_id BIGINT, name VARCHAR(64))",
      "INSERT INTO src_taggable_tags VALUES (100, '  Music '), (101, 'CAT  videos')",
      """CREATE TABLE src_comments (
           id BIGINT, user_id BIGINT, video_id BIGINT, content VARCHAR(256),
           created_at TIMESTAMP, updated_at TIMESTAMP, deleted_at TIMESTAMP)""",
      """INSERT INTO src_comments VALUES
           (1, 1, 10, 'first', TIMESTAMP('2024-01-01 10:00:00'), NULL, NULL),
           (2, 2, 10, 'gone', TIMESTAMP('2024-01-01 10:01:00'), NULL, TIMESTAMP('2024-01-01 10:02:00')),
           (3, 3, 10, '^hi', TIMESTAMP('2024-01-01 10:03:00'), NULL, NULL)""",
      // "from"/"to" are SQL reserved words — the dialect must quote them on
      // both the schema probe and the data queries.
      """CREATE TABLE src_messages (
           id BIGINT, "from" BIGINT, "to" BIGINT, subject VARCHAR(64),
           content VARCHAR(256), created_at TIMESTAMP, updated_at TIMESTAMP,
           deleted_at TIMESTAMP)""",
      """INSERT INTO src_messages VALUES
           (1, 1, 2, 'hey', 'body', TIMESTAMP('2020-03-01 00:00:00'), NULL, NULL)""",
      // S7: playlists exist only in the database (pre-existing target table).
      "CREATE TABLE playlists (id BIGINT, user_id BIGINT, title VARCHAR(64))",
      """INSERT INTO playlists VALUES
           (500, 1, 'Favorites'), (501, 1, 'Uploads'), (502, 2, 'Favorites')""",
      """CREATE TABLE src_favorites (
           user_id BIGINT, video_id BIGINT, id BIGINT, created_at VARCHAR(32))""",
      """INSERT INTO src_favorites VALUES
           (1, 10, NULL, '2020-04-01 00:00:00'),
           (2, 11, NULL, '0000-00-00 00:00:00'),
           (3, 10, NULL, '2020-04-02 00:00:00')""",
      """CREATE TABLE src_uploads (
           id BIGINT, user_id BIGINT, video_id BIGINT, created_at VARCHAR(32))""",
      "INSERT INTO src_uploads VALUES (10, 1, NULL, '2020-02-01 00:00:00')",
      // Pre-created target schema (the reference's Postgres v2 schema also
      // pre-exists — column_sets.mjs declares it, the migration only loads).
      // users carries an identity id so K3's live restart is real.
      """CREATE TABLE users (
           id BIGINT GENERATED BY DEFAULT AS IDENTITY (START WITH 1),
           username VARCHAR(64), password VARCHAR(64),
           created_at TIMESTAMP, updated_at TIMESTAMP, deleted_at TIMESTAMP,
           banned TIMESTAMP DEFAULT '1970-01-01 00:00:00',
           banreason VARCHAR(64), filters VARCHAR(256))""",
      """CREATE TABLE videos (
           id BIGINT, file VARCHAR(64), created_at TIMESTAMP,
           updated_at TIMESTAMP, deleted_at TIMESTAMP, hash VARCHAR(64),
           tags VARCHAR(256))""",
      "CREATE TABLE tags (normalized VARCHAR(30), tag VARCHAR(30))",
      """CREATE TABLE comments (
           id BIGINT, user_id BIGINT, video_id BIGINT, content VARCHAR(256),
           created_at TIMESTAMP, updated_at TIMESTAMP, deleted_at TIMESTAMP,
           response_to BIGINT)""",
      """CREATE TABLE messages (
           id BIGINT, from_user BIGINT, to_user BIGINT, title VARCHAR(64),
           content VARCHAR(256), created_at TIMESTAMP, updated_at TIMESTAMP,
           deleted_at TIMESTAMP)""",
      """CREATE TABLE playlist_video (
           playlist_id BIGINT, video_id BIGINT, created_at TIMESTAMP)""")
  }

  /** The whole pipeline, lazily run once: JDBC in → migrate() → JDBC out. */
  private lazy val migrated: Unit = {
    seeded
    val src = Map(
      // Fact-sized tables go through the partitioned scan (one bounded
      // query per id range — the 1000-executor shape, just tiny here).
      "users" -> JdbcEdges.readTable(spark, conn, "src_users", "id", 1L, 3L, numPartitions = 2),
      "videos" -> JdbcEdges.readTable(spark, conn, "src_videos", "id", 10L, 12L, numPartitions = 2),
      "comments" -> JdbcEdges.readTable(spark, conn, "src_comments", "id", 1L, 3L, numPartitions = 2),
      "taggable_taggables" -> JdbcEdges.readSmallTable(spark, conn, "src_taggable_taggables"),
      "taggable_tags" -> JdbcEdges.readSmallTable(spark, conn, "src_taggable_tags"),
      "messages" -> JdbcEdges.readSmallTable(spark, conn, "src_messages"),
      "playlists" -> JdbcEdges.readSmallTable(spark, conn, "playlists"),
      "favorites" -> JdbcEdges.readSmallTable(spark, conn, "src_favorites"),
      "uploads" -> JdbcEdges.readSmallTable(spark, conn, "src_uploads"))
    // The reference emits a raw DEFAULT token for unparseable timestamps so
    // the sink column's default applies (column_sets.mjs:5-8). The engine
    // honors the same contract by fetching the COLUMN'S OWN declared
    // default from sink metadata and injecting it as the sentinel.
    val sinkDefault = JdbcEdges.timestampColumnDefault(conn, "users", "banned")
    val cfg = Migration.Config(defaultTimestamp = sinkDefault)
    val out = Migration.migrate(src, cfg)
    out.foreach { case (table, df) =>
      JdbcEdges.writeAppend(JdbcEdges.stringifyArrays(df, cfg.tagSeparator), conn, table)
    }
  }

  private def readBack(table: String) = {
    migrated
    // Derby folds unquoted identifiers to uppercase; Spark's analyzer is
    // case-insensitive but Row.getAs is not.
    val df = JdbcEdges.readSmallTable(spark, conn, table)
    df.toDF(df.columns.map(_.toLowerCase): _*)
  }

  test("jdbc round-trip: all six target tables written and readable") {
    val counts = Seq("users", "videos", "tags", "comments", "messages", "playlist_video")
      .map(t => t -> readBack(t).count()).toMap
    assert(counts === Map(
      "users" -> 3L, "videos" -> 2L, "tags" -> 2L,
      "comments" -> 3L, "messages" -> 1L, "playlist_video" -> 4L))
  }

  test("jdbc round-trip: cleansing survived the sink (mask, zero-date, arrays)") {
    val users = readBack("users").orderBy("id").collect()
    assert(users.forall(_.getAs[String]("password") === "<password>"))
    assert(users(1).getAs[java.sql.Timestamp]("banned") === ts("1970-01-01 00:00:00"))
    assert(users(0).getAs[String]("filters") === "sfw,,,nsfw")
    val vids = readBack("videos").orderBy("id").collect()
    assert(vids(0).getAs[String]("tags") === "cat videos,,,music")
  }

  test("jdbc round-trip: reserved-word columns and reply links held") {
    val m = readBack("messages").collect().head
    assert(m.getAs[Long]("from_user") === 1L && m.getAs[Long]("to_user") === 2L)
    val resp = readBack("comments").orderBy("id").collect()
      .map(r => r.getLong(0) -> Option(r.getAs[java.lang.Long]("response_to"))).toMap
    assert(resp(3L) === Some(1L) && resp(1L) === None)
  }

  test("k3 live: sequence restarted to max(id)+1, next default insert uses it") {
    migrated
    val next = Migration.nextSequenceValue(readBack("users")).collect().head.getLong(0)
    assert(next === 4L)
    JdbcEdges.runStatements(conn,
      Seq(s"ALTER TABLE users ALTER COLUMN id RESTART WITH $next"))
    exec("""INSERT INTO users (username, password) VALUES ('dave', '<password>')""")
    val daveId = {
      val c = DriverManager.getConnection(conn.url)
      try {
        val rs = c.createStatement()
          .executeQuery("SELECT id FROM users WHERE username = 'dave'")
        rs.next(); rs.getLong(1)
      } finally c.close()
    }
    assert(daveId === 4L)
  }

  test("k4 epilogue path: physical-layout DDL through runStatements") {
    migrated
    // Derby has no CLUSTER; the same epilogue channel drives its layout
    // primitive (a pk index). The Postgres statement builders are asserted
    // in MigrationSpec.
    JdbcEdges.runStatements(conn, Seq("CREATE INDEX videos_pk_idx ON videos (id)"))
    val c = DriverManager.getConnection(conn.url)
    try {
      val rs = c.createStatement().executeQuery(
        "SELECT COUNT(*) FROM SYS.SYSCONGLOMERATES WHERE CONGLOMERATENAME = 'VIDEOS_PK_IDX'")
      rs.next()
      assert(rs.getInt(1) === 1)
    } finally c.close()
  }
}
