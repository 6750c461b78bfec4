package graft.sources

import java.util.Properties

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions.{array_join, col}
import org.apache.spark.sql.types.{ArrayType, StringType}

/** JDBC source/sink edges for the production deployment (MariaDB in,
  * PostgreSQL out — reference src/index.mjs:11-12, SURVEY §2.1/§2.2).
  * Fixture runs never touch these; the operator library is source-agnostic.
  *
  * Scale posture: reads are range-partitioned on the PK so a 1000-executor
  * cluster scans in parallel instead of one connection (the reference
  * streamed every table through a single Node process); writes batch
  * multi-row inserts per partition (K1's pg-promise batching analog).
  */
object JdbcEdges {

  case class Conn(url: String, user: String, password: String) {
    def props: Properties = {
      val p = new Properties()
      p.setProperty("user", user)
      p.setProperty("password", password)
      p
    }
  }

  /** Parallel partitioned scan: numPartitions ranges over [lower, upper] of
    * `partitionCol` (the driver issues one bounded query per partition).
    */
  def readTable(
      spark: SparkSession, conn: Conn, table: String,
      partitionCol: String, lower: Long, upper: Long,
      numPartitions: Int = 32): DataFrame =
    spark.read
      .option("partitionColumn", partitionCol)
      .option("lowerBound", lower)
      .option("upperBound", upper)
      .option("numPartitions", numPartitions)
      .jdbc(conn.url, table, conn.props)

  /** Small-table scan (dimensions; no partitioning needed). */
  def readSmallTable(spark: SparkSession, conn: Conn, table: String): DataFrame =
    spark.read.jdbc(conn.url, table, conn.props)

  /** Sink adapter for engines without native array columns: every
    * array<string> column becomes sep-joined text (the reference's
    * tagSeparator round-trip, config.json:15 — MariaDB stored tags exactly
    * this way). A PostgreSQL sink skips this: text[] is native there
    * (column_sets.mjs:44-52). Null arrays stay null (array_join semantics).
    */
  def stringifyArrays(df: DataFrame, sep: String): DataFrame =
    df.schema.fields.foldLeft(df) {
      case (d, f) if f.dataType.isInstanceOf[ArrayType] &&
          f.dataType.asInstanceOf[ArrayType].elementType == StringType =>
        d.withColumn(f.name, array_join(col(f.name), sep))
      case (d, _) => d
    }

  /** Batched append (K1). batchsize ≙ the reference's multi-row VALUES. */
  def writeAppend(df: DataFrame, conn: Conn, table: String, batchSize: Int = 10000): Unit =
    df.write
      .option("batchsize", batchSize)
      .mode(SaveMode.Append)
      .jdbc(conn.url, table, conn.props)

  // ----- sink-epilogue DDL (K2/K3/K4) -----
  // Raw statements executed over a plain JDBC connection after the load;
  // pure builders here so they are unit-testable without a database.

  /** K3 — `ALTER SEQUENCE <t>_id_seq RESTART WITH <next>`
    * (reference src/queries.mjs:16).
    */
  def alterSequenceSql(table: String, nextId: Long): String =
    s"ALTER SEQUENCE ${table}_id_seq RESTART WITH $nextId"

  /** K4 — `CLUSTER <t> USING <t>_pkey` (reference src/queries.mjs:17). */
  def clusterSql(table: String): String =
    s"CLUSTER $table USING ${table}_pkey"

  /** K2 — idempotent insert statement for the tag dictionary
    * (reference src/index.mjs:49-55). The DataFrame-level equivalent is
    * dropDuplicates + left-anti join (see RelationalQueries k2); this is the
    * passthrough form for a real Postgres sink.
    */
  def insertOnConflictSql(table: String, columns: Seq[String], conflictKey: String): String = {
    val cols = columns.mkString(", ")
    val params = columns.map(_ => "?").mkString(", ")
    s"INSERT INTO $table ($cols) VALUES ($params) ON CONFLICT ($conflictKey) DO NOTHING"
  }

  /** Normalize a raw COLUMN_DEF into the literal it wraps: drops a trailing
    * Postgres cast suffix (`'1970-01-01 00:00:00'::timestamp without time
    * zone` — the pg JDBC driver reports the cast as part of the default),
    * then one layer of surrounding quotes (Derby/Postgres report string
    * defaults quoted). Function-style defaults (`CURRENT_TIMESTAMP`,
    * `nextval('users_id_seq'::regclass)`) pass through unchanged — their
    * casts are inside the call, not trailing — so callers can detect
    * non-literals by parse failure.
    */
  private[graft] def defaultLiteral(raw: String): String = {
    val noCast = raw.trim.replaceFirst("::[A-Za-z_][A-Za-z_ ]*(\\(\\s*\\d+(\\s*,\\s*\\d+)?\\s*\\))?$", "")
    if (noCast.length >= 2 && noCast.startsWith("'") && noCast.endsWith("'"))
      noCast.substring(1, noCast.length - 1)
    else noCast
  }

  /** True iff `s` is a timestamp/date literal the sentinel cast can inject
    * losslessly (`yyyy-[m]m-[d]d[ hh:mm:ss[.f...]]`).
    */
  private[graft] def isTimestampLiteral(s: String): Boolean =
    try { java.sql.Timestamp.valueOf(s); true }
    catch { case _: IllegalArgumentException =>
      try { java.sql.Date.valueOf(s); true }
      catch { case _: IllegalArgumentException => false }
    }

  /** The sink column's declared DEFAULT, from JDBC metadata. The reference
    * maps unparseable timestamps to a raw `DEFAULT` token so the COLUMN
    * default applies (src/column_sets.mjs:5-8); multi-row JDBC batches
    * can't emit per-row DEFAULT tokens, so the engine fetches the actual
    * column default and injects it as the sentinel value — same semantics
    * (the sink's own default lands in the row), decided engine-side.
    */
  def columnDefault(conn: Conn, table: String, column: String): Option[String] = {
    val c = java.sql.DriverManager.getConnection(conn.url, conn.user, conn.password)
    try {
      def lookup(t: String, col: String): Option[String] = {
        val rs = c.getMetaData.getColumns(null, null, t, col)
        try if (rs.next()) Option(rs.getString("COLUMN_DEF")) else None
        finally rs.close()
      }
      // identifier case-folding differs per engine (Derby upper, Postgres lower)
      lookup(table, column).orElse(lookup(table.toUpperCase, column.toUpperCase))
        .orElse(lookup(table.toLowerCase, column.toLowerCase))
        .map(defaultLiteral)
    } finally c.close()
  }

  /** [[columnDefault]] validated for the T3 sentinel: the fetched default
    * must be a timestamp LITERAL (a non-literal like CURRENT_TIMESTAMP can't
    * be injected as a constant without diverging from the reference's
    * DEFAULT-token semantics). Falls back to `fallback` when the column
    * declares no default or a non-literal one; with no fallback, fails fast
    * instead of letting `cast("timestamp")` silently NULL every sentinel row.
    */
  def timestampColumnDefault(
      conn: Conn, table: String, column: String,
      fallback: Option[String] = None): String =
    columnDefault(conn, table, column).filter(isTimestampLiteral)
      .orElse(fallback)
      .getOrElse(throw new IllegalStateException(
        s"$table.$column declares no timestamp-literal DEFAULT " +
          s"(got ${columnDefault(conn, table, column)}) and no fallback was configured"))

  /** Execute epilogue statements over one connection (driver-side, tiny). */
  def runStatements(conn: Conn, statements: Seq[String]): Unit = {
    val c = java.sql.DriverManager.getConnection(conn.url, conn.user, conn.password)
    try statements.foreach { s => val st = c.createStatement(); try st.execute(s) finally st.close() }
    finally c.close()
  }
}
