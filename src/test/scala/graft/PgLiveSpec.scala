package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{JdbcEdges, PgDialect}
import graft.sources.PgDialect.{DefaultToken, Lit}

/** The golden-pinned Postgres statements EXECUTED against a live
  * PostgreSQL server — closing the gap PgDialectSpec documents ("the
  * strings ARE the contract"): a string can be byte-perfect and still be
  * SQL the target engine rejects or executes with different semantics.
  * This suite initdb's a throwaway cluster under /tmp (socket-only, no
  * TCP listener, unique directory — no port/cluster collisions), feeds
  * each builder's exact output through psql, and asserts the REFERENCE's
  * observable semantics: the DEFAULT token resolves to the column
  * default, targetless ON CONFLICT DO NOTHING dedups against any unique
  * constraint, ALTER SEQUENCE RESTART repositions the serial, CLUSTER
  * accepts the pkey form, and text[] literals round-trip element-exact.
  *
  * Environment-guarded: when the container has no PostgreSQL binaries
  * (every round before this one), the suite CANCELS rather than fails —
  * the golden files remain the standing contract.
  */
class PgLiveSpec extends AnyFunSuite {

  private def sh(cmd: String): (Int, String) = {
    import scala.sys.process._
    val out = new StringBuilder
    val code = Process(Seq("bash", "-c", cmd))
      .!(ProcessLogger(s => out.append(s).append('\n'), s => out.append(s).append('\n')))
    (code, out.toString)
  }

  // numeric sort: lexicographic would prefer "9.6" over "15" on a
  // multi-version install
  private val pgBin = Option(new java.io.File("/usr/lib/postgresql").listFiles())
    .getOrElse(Array.empty)
    .sortBy(f => f.getName.takeWhile(_.isDigit).toIntOption.getOrElse(-1))
    .lastOption.map(_.getAbsolutePath + "/bin")

  // one throwaway cluster per suite run: initdb + socket-only start as the
  // postgres OS user (postgres refuses to run as root). Cleaned in the JVM
  // shutdown hook — scalatest per-suite afterAll would race a canceled run.
  private lazy val server: Option[(String, Int)] = pgBin.flatMap { bin =>
    // psql comes from the SAME versioned bin as the server — a bare PATH
    // psql may be absent (failing hard instead of canceling) or an
    // unrelated major version
    if (!new java.io.File(s"$bin/initdb").canExecute ||
        !new java.io.File(s"$bin/psql").canExecute) None
    else {
      val root = s"/tmp/graft-pglive-${java.util.UUID.randomUUID}"
      val (data, sock, port) = (s"$root/data", s"$root/sock", 54331)
      val (rc1, o1) = sh(
        s"install -d -m 700 -o postgres $data && install -d -o postgres $sock && " +
          s"""su postgres -s /bin/bash -c "cd /tmp && $bin/initdb -D $data --auth=trust -U postgres" && """ +
          s"""su postgres -s /bin/bash -c "cd /tmp && $bin/pg_ctl -D $data -l $data/log -o '-k $sock -p $port -c listen_addresses=' start"""")
      if (rc1 != 0) {
        info(s"live PG unavailable: $o1")
        sh(s"rm -rf $root") // a failed initdb/start must not leak tens of MB
        None
      }
      else {
        Runtime.getRuntime.addShutdownHook(new Thread(() => {
          sh(s"""su postgres -s /bin/bash -c "cd /tmp && $bin/pg_ctl -D $data -m immediate stop"; rm -rf $root""")
          ()
        }))
        Some((sock, port))
      }
    }
  }

  private def psql(sql: String): (Int, String) = {
    val (sock, port) = server.get
    val f = java.io.File.createTempFile("graft-pg", ".sql")
    try {
      java.nio.file.Files.write(f.toPath, sql.getBytes("UTF-8"))
      sh(s"${pgBin.get}/psql -h $sock -p $port -U postgres -v ON_ERROR_STOP=1 -At -f ${f.getAbsolutePath}")
    } finally { f.delete(); () }
  }

  private def exec(sql: String): String = {
    val (rc, out) = psql(sql)
    assert(rc == 0, s"live PG rejected:\n$sql\n--- output ---\n$out")
    out.trim
  }

  private def live(): Unit = assume(server.isDefined,
    "no PostgreSQL binaries in this container — golden files stand alone")

  test("createTableSql lands live; tags is a native text[] column") {
    live()
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("file", StringType),
      StructField("hash", StringType),
      StructField("tags", ArrayType(StringType))))
    exec(PgDialect.createTableSql("videos_live", schema))
    val udt = exec("""select udt_name from information_schema.columns
                      where table_name='videos_live' and column_name='tags'""")
    assert(udt == "_text", s"tags must be native text[], got udt $udt")
    // the pg-promise array literal round-trips element-exact
    exec(PgDialect.insertSql("videos_live", Seq("id", "file", "hash", "tags"),
      Seq(Seq(Lit(1L), Lit("a.mp4"), Lit("h1"), Lit(Seq("cat", "it's", "b c"))))))
    assert(exec("select tags[2] from videos_live where id=1") == "it's")
    assert(exec("select array_length(tags,1) from videos_live where id=1") == "3")
  }

  test("the DEFAULT token resolves to the sink column's own default (T3 live)") {
    live()
    exec("""create table users_live (id bigint, username text,
            banned timestamp without time zone default '1999-09-09 09:09:09')""")
    exec(PgDialect.insertSql("users_live", Seq("id", "username", "banned"), Seq(
      Seq(Lit(1L), Lit("alice"), Lit(None)),
      Seq(Lit(2L), Lit("bob"), DefaultToken),
      Seq(Lit(3L), Lit("carol"),
        Lit(java.sql.Timestamp.valueOf("2021-05-01 12:00:00"))))))
    assert(exec("select banned from users_live where id=1") == "",
      "explicit null must stay NULL, not the default")
    assert(exec("select banned from users_live where id=2") == "1999-09-09 09:09:09",
      "DEFAULT token must take the column default")
    assert(exec("select banned from users_live where id=3") == "2021-05-01 12:00:00")
  }

  test("targetless ON CONFLICT DO NOTHING dedups against the unique constraint (K2 live)") {
    live()
    exec("create table tags_live (normalized text, tag text, unique (normalized))")
    val ins = PgDialect.insertSql("tags_live", Seq("normalized", "tag"),
      Seq(Seq(Lit("cat videos"), Lit("CAT  Videos")), Seq(Lit("music"), Lit("  Music "))),
      onConflictDoNothing = true)
    exec(ins)
    exec(ins) // the reference re-runs the same insert across batches
    exec(PgDialect.insertSql("tags_live", Seq("normalized", "tag"),
      Seq(Seq(Lit("music"), Lit("different original")), Seq(Lit("new"), Lit("New"))),
      onConflictDoNothing = true))
    assert(exec("select count(*) from tags_live") == "3")
    // brackets guard the significant whitespace from exec's trim
    assert(exec("select '['||tag||']' from tags_live where normalized='music'")
      == "[  Music ]", "first write wins under DO NOTHING")
  }

  test("ALTER SEQUENCE RESTART repositions the serial; CLUSTER accepts the pkey form (K3/K4 live)") {
    live()
    exec("create table vids_live (id bigserial primary key, f text)")
    exec("insert into vids_live (id, f) values (1,'a'), (5,'b'), (9,'c')")
    // K3: the reference computes max+1 and restarts the sequence
    exec(JdbcEdges.alterSequenceSql("vids_live", 10))
    exec("insert into vids_live (f) values ('d')")
    assert(exec("select id from vids_live where f='d'") == "10",
      "the restarted sequence must hand out max+1")
    // K4: physical reorder by the primary key index
    exec(JdbcEdges.clusterSql("vids_live"))
    assert(exec("""select indexrelid::regclass::text from pg_index
                   where indrelid='vids_live'::regclass and indisclustered""")
      == "vids_live_pkey")
  }
}
