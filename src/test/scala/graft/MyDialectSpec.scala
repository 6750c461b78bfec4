package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.MyDialect

/** Golden pins for the MariaDB SOURCE dialect (the read half of the
  * reference's defining act; PgDialectSpec pins the sink half). No MariaDB
  * exists in this container — what CAN be pinned is the exact URL and the
  * exact statements, so a future live run has nothing left to guess.
  */
class MyDialectSpec extends AnyFunSuite {

  test("JDBC URL carries the zero-date, tinyint, and charset flags") {
    assert(MyDialect.url("db.example", 3306, "w0bm") ===
      "jdbc:mysql://db.example:3306/w0bm" +
        "?zeroDateTimeBehavior=convertToNull" +
        "&tinyInt1isBit=false" +
        "&useUnicode=true&characterEncoding=utf8")
  }

  test("the six source statements match the reference verbatim") {
    // reference: src/queries.mjs:3-11 (separator from config.json inlined)
    assert(MyDialect.sourceQueries === Map(
      "comments" -> "SELECT * FROM comments ORDER BY video_id, id ASC",
      "messages" -> "SELECT * FROM messages",
      "users" -> "SELECT * FROM users",
      "favorites" -> "SELECT user_id, video_id, created_at FROM favorites",
      "uploads" -> "SELECT id, user_id, created_at FROM videos",
      "videos_with_tags" ->
        ("SELECT v.*, GROUP_CONCAT(DISTINCT t.name SEPARATOR ',,,') as tags " +
          "FROM videos v, taggable_taggables tt, taggable_tags t " +
          "WHERE v.id = tt.taggable_id AND tt.tag_id = t.tag_id " +
          "GROUP BY v.id")))
    assert(MyDialect.tagSeparator === ",,,")
  }

  test("dbtable wraps arbitrary SQL the way spark.read.jdbc requires") {
    assert(MyDialect.dbtable("SELECT * FROM messages") ===
      "(SELECT * FROM messages) AS src")
  }

  test("a dialect-built statement runs against a live JDBC source") {
    // Derby stands in for MariaDB (as in JdbcMigrationSpec): the subquery
    // dbtable form must round-trip through a real JDBC read path.
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]").appName("mydialect")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    val url = s"jdbc:derby:memory:mydialect;create=true"
    val c = java.sql.DriverManager.getConnection(url)
    try {
      val st = c.createStatement()
      st.execute("CREATE TABLE messages (id BIGINT, content VARCHAR(50))")
      st.execute("INSERT INTO messages VALUES (1, 'hi'), (2, 'there')")
      st.close()
      val df = spark.read
        .option("url", url)
        .option("dbtable", MyDialect.dbtable(MyDialect.sourceQueries("messages")))
        .format("jdbc").load()
      assert(df.count() === 2)
      assert(df.columns.map(_.toLowerCase).sorted === Array("content", "id"))
    } finally c.close()
  }
}
