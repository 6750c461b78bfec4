package graft.sources

import java.sql.Timestamp

import org.apache.spark.sql.types._

/** PostgreSQL sink dialect — pure statement builders for everything the
  * reference's pg side emits, byte-for-byte testable without a database
  * (PgDialectSpec golden-files each shape) AND, when the container ships
  * PostgreSQL binaries, executed against a live server: PgLiveSpec feeds
  * each builder's exact output through psql and asserts the reference's
  * observable semantics (DEFAULT resolution, targetless ON CONFLICT
  * dedup, sequence restart, CLUSTER, text[] round-trip).
  *
  * The reference's sink statements (all via pg-promise):
  *   - multi-row `insert into "t"("c1","c2",...) values(...),(...)` with
  *     per-value raw `DEFAULT` tokens where the JS layer mapped unparseable
  *     timestamps / falsy reply links (reference src/column_sets.mjs:5-8,
  *     67-70; pg-promise renders its DEFAULT rawType verbatim)
  *   - `... ON CONFLICT DO NOTHING` appended to the tags insert
  *     (reference src/index.mjs:49-55 — note: NO conflict target column)
  *   - `ALTER SEQUENCE <t>_id_seq RESTART WITH <v>` / `CLUSTER <t> USING
  *     <t>_pkey` (reference src/queries.mjs:16-17; shared builders in
  *     [[JdbcEdges]])
  *   - native `text[]` for videos.tags: the reference inserts a JS string
  *     array into the pre-existing text[] column (src/column_sets.mjs:44-52),
  *     which pg-promise renders as `array['a','b']`. The engine's generic
  *     JDBC path stringifies arrays ([[JdbcEdges.stringifyArrays]]) because
  *     most sinks lack array columns; THIS dialect keeps them native.
  *
  * The TEXT-protocol insert form here complements [[JdbcEdges.writeAppend]]
  * (binary JDBC batches): batches cannot carry per-row DEFAULT tokens — the
  * engine fetches the column default instead (T3) — while this form
  * preserves the reference's token semantics exactly.
  */
object PgDialect {

  /** A value position in a VALUES tuple. */
  sealed trait PgValue
  /** pg-promise's rawType DEFAULT — rendered verbatim, the sink column's own
    * default applies (reference src/column_sets.mjs:5-8).
    */
  case object DefaultToken extends PgValue
  case class Lit(value: Any) extends PgValue

  /** Double-quoted identifier, pg-promise style. */
  def quoteIdent(name: String): String =
    "\"" + name.replace("\"", "\"\"") + "\""

  /** Spark type -> Postgres column type; array<string> stays native text[]. */
  def pgType(dt: DataType): String = dt match {
    case StringType => "text"
    case LongType => "bigint"
    case IntegerType => "integer"
    case DoubleType => "double precision"
    case FloatType => "real"
    case BooleanType => "boolean"
    case TimestampType => "timestamp without time zone"
    case DateType => "date"
    case BinaryType => "bytea"
    case ArrayType(StringType, _) => "text[]"
    case ArrayType(e, _) => pgType(e) + "[]"
    case t => throw new IllegalArgumentException(s"no Postgres mapping for $t")
  }

  /** CREATE TABLE mirroring the reference's pre-existing v2 schema shape. */
  def createTableSql(table: String, schema: StructType): String = {
    val cols = schema.fields.map { f =>
      s"${quoteIdent(f.name)} ${pgType(f.dataType)}" +
        (if (f.nullable) "" else " NOT NULL")
    }
    s"CREATE TABLE ${quoteIdent(table)} (${cols.mkString(", ")})"
  }

  /** One SQL literal; strings escape by quote-doubling, string arrays render
    * as pg-promise's `array[...]` form.
    */
  def literal(v: Any): String = v match {
    case null | None => "null"
    case Some(x) => literal(x)
    case s: String => "'" + s.replace("'", "''") + "'"
    case t: Timestamp => "'" + t.toString.stripSuffix(".0") + "'"
    case a: Seq[_] => a.map(literal).mkString("array[", ",", "]")
    case b: Boolean => if (b) "true" else "false"
    case n => n.toString
  }

  private def renderValue(v: PgValue): String = v match {
    case DefaultToken => "DEFAULT"
    case Lit(x) => literal(x)
  }

  /** Multi-row insert in pg-promise's shape (lowercase keywords, quoted
    * identifiers, one VALUES list per row); `onConflictDoNothing` appends
    * the reference's suffix verbatim.
    */
  def insertSql(
      table: String, columns: Seq[String], rows: Seq[Seq[PgValue]],
      onConflictDoNothing: Boolean = false): String = {
    require(rows.nonEmpty && rows.forall(_.length == columns.length),
      "every row must match the column list")
    val cols = columns.map(quoteIdent).mkString(",")
    val values = rows.map(_.map(renderValue).mkString("(", ",", ")")).mkString(",")
    s"insert into ${quoteIdent(table)}($cols) values$values" +
      (if (onConflictDoNothing) " ON CONFLICT DO NOTHING" else "")
  }
}
