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

  /** The sink column's declared DEFAULT, from JDBC metadata. The reference
    * maps unparseable timestamps to a raw `DEFAULT` token so the COLUMN
    * default applies (src/column_sets.mjs:5-8); multi-row JDBC batches
    * can't emit per-row DEFAULT tokens, so the engine fetches the actual
    * column default and injects it as the sentinel value — same semantics
    * (the sink's own default lands in the row), decided engine-side.
    * Returns the raw COLUMN_DEF with one layer of surrounding quotes
    * stripped (Derby/Postgres report string defaults quoted).
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
        .map(_.trim)
        .map(d => if (d.length >= 2 && d.startsWith("'") && d.endsWith("'"))
          d.substring(1, d.length - 1) else d)
    } finally c.close()
  }

  /** Execute epilogue statements over one connection (driver-side, tiny). */
  def runStatements(conn: Conn, statements: Seq[String]): Unit = {
    val c = java.sql.DriverManager.getConnection(conn.url, conn.user, conn.password)
    try statements.foreach { s => val st = c.createStatement(); try st.execute(s) finally st.close() }
    finally c.close()
  }
}
