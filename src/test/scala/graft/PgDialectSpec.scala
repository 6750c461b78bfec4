package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{JdbcEdges, PgDialect}
import graft.sources.PgDialect.{DefaultToken, Lit}

/** Golden-file assertions for the Postgres sink dialect — the exact
  * statements the engine would emit against the reference's production sink,
  * byte-for-byte. No database needed (none exists in this container): every
  * builder is a pure string function, and these strings ARE the contract
  * with the reference's pg side (src/column_sets.mjs, src/queries.mjs:16-17,
  * src/index.mjs:49-55).
  */
class PgDialectSpec extends AnyFunSuite {

  test("CREATE TABLE videos carries a native text[] tags column") {
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("file", StringType),
      StructField("created_at", TimestampType),
      StructField("updated_at", TimestampType),
      StructField("deleted_at", TimestampType),
      StructField("hash", StringType),
      StructField("tags", ArrayType(StringType))))
    assert(PgDialect.createTableSql("videos", schema) ===
      """CREATE TABLE "videos" ("id" bigint, "file" text, """ +
        """"created_at" timestamp without time zone, """ +
        """"updated_at" timestamp without time zone, """ +
        """"deleted_at" timestamp without time zone, """ +
        """"hash" text, "tags" text[])""")
  }

  test("tags insert appends the reference's targetless ON CONFLICT suffix") {
    // reference src/index.mjs:49-55: pgh.insert(...) + " ON CONFLICT DO
    // NOTHING" — no conflict target column in the emitted SQL.
    val sql = PgDialect.insertSql(
      "tags", Seq("normalized", "tag"),
      Seq(Seq(Lit("cat videos"), Lit("CAT  Videos")),
        Seq(Lit("music"), Lit("  Music "))),
      onConflictDoNothing = true)
    assert(sql ===
      """insert into "tags"("normalized","tag") """ +
        """values('cat videos','CAT  Videos'),('music','  Music ') """ +
        """ON CONFLICT DO NOTHING""")
  }

  test("users insert renders the raw DEFAULT token for unparseable timestamps") {
    // reference src/column_sets.mjs:5-17: a MariaDB zero-date maps to the
    // raw DEFAULT token so the sink column's own default applies; parseable
    // values and nulls pass through.
    val sql = PgDialect.insertSql(
      "users", Seq("id", "username", "banned"),
      Seq(
        Seq(Lit(1L), Lit("alice"), Lit(None)),
        Seq(Lit(2L), Lit("bob"), DefaultToken),
        Seq(Lit(3L), Lit("carol"), Lit(java.sql.Timestamp.valueOf("2021-05-01 12:00:00")))))
    assert(sql ===
      """insert into "users"("id","username","banned") """ +
        """values(1,'alice',null),(2,'bob',DEFAULT),(3,'carol','2021-05-01 12:00:00')""")
  }

  test("videos insert keeps tags as a native array literal") {
    // reference src/column_sets.mjs:44-52: the JS string array inserts into
    // text[] directly — the Postgres sink never stringifies.
    val sql = PgDialect.insertSql(
      "videos", Seq("id", "tags"),
      Seq(Seq(Lit(10L), Lit(Seq("music", "cat videos")))))
    assert(sql ===
      """insert into "videos"("id","tags") values(10,array['music','cat videos'])""")
  }

  test("string literals escape embedded quotes by doubling") {
    assert(PgDialect.literal("it's") === "'it''s'")
    assert(PgDialect.quoteIdent("we\"ird") === "\"we\"\"ird\"")
  }

  test("sequence and cluster epilogue match the reference byte-for-byte") {
    // reference src/queries.mjs:16-17
    assert(JdbcEdges.alterSequenceSql("users", 4L) ===
      "ALTER SEQUENCE users_id_seq RESTART WITH 4")
    assert(JdbcEdges.clusterSql("users") === "CLUSTER users USING users_pkey")
  }

  test("reserved-word source columns are safely quotable") {
    // messages carries "from"/"to" in the source (reference
    // src/column_sets.mjs:76-84 renames them); quoting must hold if a sink
    // ever keeps the original names.
    assert(PgDialect.quoteIdent("from") === "\"from\"")
    val sql = PgDialect.insertSql("messages", Seq("id", "from_user", "to_user"),
      Seq(Seq(Lit(1L), Lit(1L), Lit(2L))))
    assert(sql ===
      """insert into "messages"("id","from_user","to_user") values(1,1,2)""")
  }
}
