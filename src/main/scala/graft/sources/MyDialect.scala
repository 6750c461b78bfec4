package graft.sources

/** MariaDB/MySQL SOURCE dialect — the read half of the reference's defining
  * act ([[PgDialect]] is the sink half). No MariaDB is reachable in this
  * container, so like PgDialect the dialect is pinned by golden tests
  * (MyDialectSpec): the exact JDBC URL a faithful reader needs, the exact
  * six source statements the reference issues
  * (reference: src/queries.mjs:3-11), and the Spark-first read forms the
  * engine actually prefers at scale.
  */
object MyDialect {

  /** JDBC URL carrying the flags a faithful MariaDB read needs:
    *
    *   - `zeroDateTimeBehavior=convertToNull` — the source's
    *     `0000-00-00 00:00:00` timestamp sentinels (the reference maps any
    *     invalid date to the sink column DEFAULT,
    *     reference: src/column_sets.mjs:10-16) would otherwise throw in
    *     the JDBC driver; as NULL they flow to the engine's T3/T5
    *     sentinel handling (Cleansing.sentinelTimestamp / falsyToNull).
    *   - `tinyInt1isBit=false` — MySQL BOOL is tinyint(1); the engine
    *     must see the integer, not a JDBC BIT, for the reference's falsy
    *     semantics to survive (0 vs false).
    *   - `useUnicode=true&characterEncoding=utf8` — tag/content text is
    *     utf8mb4 at the source; E1's NFKC normalization assumes correctly
    *     decoded input.
    */
  def url(host: String, port: Int, database: String): String =
    s"jdbc:mysql://$host:$port/$database" +
      "?zeroDateTimeBehavior=convertToNull" +
      "&tinyInt1isBit=false" +
      "&useUnicode=true&characterEncoding=utf8"

  /** The reference's GROUP_CONCAT separator (reference: config.json
    * `tag_select_separator`) — chosen to never occur inside a tag.
    */
  val tagSeparator = ",,,"

  /** The reference's six source statements, verbatim
    * (reference: src/queries.mjs:3-11) with the separator placeholder
    * inlined. `comments`' ORDER BY matters to the reference (its linker is
    * an ordered in-memory scan over the whole result,
    * reference: src/index.mjs:59-78); see [[preferredRead]] for why the
    * engine drops it.
    */
  def sourceQueries: Map[String, String] = Map(
    "comments" -> "SELECT * FROM comments ORDER BY video_id, id ASC",
    "messages" -> "SELECT * FROM messages",
    "users" -> "SELECT * FROM users",
    "favorites" -> "SELECT user_id, video_id, created_at FROM favorites",
    "uploads" -> "SELECT id, user_id, created_at FROM videos",
    "videos_with_tags" ->
      ("SELECT v.*, GROUP_CONCAT(DISTINCT t.name SEPARATOR ',,,') as tags " +
        "FROM videos v, taggable_taggables tt, taggable_tags t " +
        "WHERE v.id = tt.taggable_id AND tt.tag_id = t.tag_id " +
        "GROUP BY v.id"))

  /** A source statement as a Spark `dbtable` value: `spark.read.jdbc`
    * accepts arbitrary SQL only as a parenthesized subquery alias.
    */
  def dbtable(query: String): String = s"($query) AS src"

  /** The engine's PREFERRED read per table — deliberate deviations from
    * [[sourceQueries]], each replayed engine-side where semantics demand:
    *
    *   - `comments`: plain table read; a global ORDER BY is meaningless
    *     under partitioned JDBC reads (each partition re-orders), and X1
    *     sorts per video group where the linking semantics actually need
    *     order.
    *   - `videos_with_tags`: plain `videos` + `taggable_*` reads; the
    *     three-way join and GROUP_CONCAT(DISTINCT) run engine-side
    *     (J1 + A1, `s6_flagship_group_concat`) where they parallelize,
    *     instead of single-threaded inside the source server.
    *
    * Everything else reads the table directly — projections and filters
    * then push down through the JDBC source, and
    * [[JdbcEdges.readTable]]'s range partitioning stays available.
    */
  def preferredRead(table: String): String = table
}
