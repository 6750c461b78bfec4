package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The w0bm MariaDB -> PostgreSQL migration pipeline, re-expressed as lazy
  * DataFrame transforms over the reference's §2.11 DAG
  * (reference: src/index.mjs:134-158):
  *
  * {{{
  * users -> videos+tags -> { comments ∥ messages ∥ playlists } -> seq fixup -> cluster
  * }}}
  *
  * Each stage is a pure DataFrame function so sources can be JDBC scans
  * (production, JdbcEdges) or inline fixtures (tests). Unlike the reference,
  * nothing is materialized driver-side: stage "ordering" is only a
  * foreign-key load-order concern for the sink, not a dataflow constraint —
  * Spark runs each write's full lineage lazily.
  */
object Migration {

  /** Knobs the reference reads from config.json (:14-16). */
  case class Config(
      passwordPlaceholder: String = "<password>",
      tagSeparator: String = ",,,",
      defaultTimestamp: String = "1970-01-01 00:00:00",
      varcharLen: Int = 30)

  /** users: mask password (T1), parse JSON filters (T2), cleanse banend ->
    * banned (T3/T4) (reference src/index.mjs:22-28, column_sets.mjs:26-42).
    */
  def transformUsers(users: DataFrame, cfg: Config): DataFrame =
    users.select(
      col("id"), col("username"),
      Cleansing.constMask(cfg.passwordPlaceholder).as("password"),
      col("created_at"), col("updated_at"), col("deleted_at"),
      Cleansing.sentinelTimestamp(col("banend"), lit(cfg.defaultTimestamp)).as("banned"),
      col("banreason"),
      Cleansing.jsonStringArray(col("categories")).as("filters"))

  /** videos + tags: the flagship join/agg/normalize pipeline
    * (reference src/index.mjs:31-57). Returns (videos-with-tags, tag
    * dictionary). Inner-join semantics are faithful: untagged videos don't
    * appear in the source query (queries.mjs:8-11).
    *
    * Spark-first deviation from the reference's shape: no group-concat ->
    * re-split string round-trip; tags stay relational (explode -> broadcast
    * dictionary join -> collect_set). The dictionary is distinct-tag-sized,
    * hence provably broadcastable.
    */
  def buildVideoTags(
      videos: DataFrame,
      junction: DataFrame,
      tagNames: DataFrame,
      cfg: Config): (DataFrame, DataFrame) = {
    val videoTag = videos
      .join(junction, videos("id") === junction("taggable_id"))
      .join(tagNames, "tag_id")
      .select(videos("id").as("video_id"), col("name").as("tag"))
    val dict = videoTag.select("tag").distinct()
      .withColumn("normalized", TagNormalize.normalizeTag(col("tag")))
    val tagged = videoTag.join(broadcast(dict), "tag")
      .groupBy(col("video_id"))
      .agg(array_sort(collect_set(col("normalized"))).as("tags"))
    val videosOut = videos
      .join(tagged, videos("id") === tagged("video_id"))
      .select(col("id"), col("file"), col("created_at"), col("updated_at"),
        col("deleted_at"), col("hash"), col("tags"))
    // Dictionary table: both columns truncated to varchar(30), dedup on tag
    // (K2's ON CONFLICT DO NOTHING ≙ dropDuplicates; reference index.mjs:49-55).
    val dictOut = dict.select(
      Cleansing.truncate(col("normalized"), cfg.varcharLen).as("normalized"),
      Cleansing.truncate(col("tag"), cfg.varcharLen).as("tag"))
      .dropDuplicates("tag")
    (videosOut, dictOut)
  }

  /** comments: X1 response linking + T5 falsy->null
    * (reference src/index.mjs:59-81).
    */
  def transformComments(comments: DataFrame): DataFrame = {
    val spark = comments.sparkSession
    import spark.implicits._
    val links = CommentLinks.link(
      comments.select("id", "video_id", "content", "created_at", "deleted_at")
        .as[CommentLinks.CommentRow])
      .withColumnRenamed("id", "link_id")
      .withColumnRenamed("video_id", "link_video_id")
    comments.join(links,
        comments("id") === col("link_id") &&
        comments("video_id") === col("link_video_id"))
      .select(col("id"), col("user_id"), col("video_id"), col("content"),
        col("created_at"), col("updated_at"), col("deleted_at"), col("response_to"))
  }

  /** messages: pure prop remaps (T4; reference column_sets.mjs:73-91). */
  def transformMessages(messages: DataFrame): DataFrame =
    messages.select(
      col("id"), col("from").as("from_user"), col("to").as("to_user"),
      col("subject").as("title"), col("content"),
      col("created_at"), col("updated_at"), col("deleted_at"))

  /** playlist_video: broadcast-join favorites/uploads against per-user
    * playlists filtered by title (J2/T8/T9/U1; reference src/index.mjs:91-118).
    * LEFT join: a user without the playlist yields a null playlist_id, like
    * the reference's Map.get miss (SURVEY §7.5 risk 4), rather than silently
    * dropping the row.
    */
  def fillPlaylists(
      playlists: DataFrame,
      favorites: DataFrame,
      uploads: DataFrame,
      cfg: Config): DataFrame = {
    def rowsFor(title: String, rows: DataFrame, videoId: Column, createdAt: Column) = {
      val pl = playlists.filter(col("title") === title)
        .select(col("user_id").as("pl_user_id"), col("id").as("playlist_id"))
      rows.join(broadcast(pl), rows("user_id") === col("pl_user_id"), "left")
        .select(col("playlist_id"), videoId.as("video_id"),
          createdAt.as("created_at"))
    }
    val favRows = rowsFor("Favorites", favorites,
      Cleansing.coalesceId(col("video_id"), col("id")),
      Cleansing.sentinelTimestamp(col("created_at"), lit(cfg.defaultTimestamp)))
    val upRows = rowsFor("Uploads", uploads,
      Cleansing.coalesceId(col("id"), col("video_id")),
      col("created_at").cast("timestamp"))
    favRows.unionByName(upRows)
  }

  /** K3 — next sequence value per table: max(id)+1
    * (reference src/index.mjs:120-126).
    */
  def nextSequenceValue(df: DataFrame, idCol: String = "id"): DataFrame =
    df.agg((max(col(idCol)) + 1).as("next_id"))

  /** K4 — clustered write: physically order by PK, the engine analog of
    * `CLUSTER <t> USING <t>_pkey` (reference src/queries.mjs:17). Range
    * partitioning gives globally sorted files -> locality + min/max pruning
    * for downstream readers.
    */
  def writeClustered(df: DataFrame, pk: String, path: String, partitions: Int = 32): Unit =
    df.repartitionByRange(partitions, col(pk))
      .sortWithinPartitions(pk)
      .write.mode("overwrite").parquet(path)

  /** The full DAG over already-loaded sources. Returns every target table
    * keyed by name (lazy — callers write or inspect).
    */
  /** Source tables [[migrate]] requires. */
  val requiredSources: Set[String] = Set(
    "users", "videos", "taggable_taggables", "taggable_tags",
    "comments", "messages", "playlists", "favorites", "uploads")

  def migrate(src: Map[String, DataFrame], cfg: Config = Config()): Map[String, DataFrame] = {
    val missing = requiredSources -- src.keySet
    require(missing.isEmpty,
      s"migrate() missing source tables: ${missing.toSeq.sorted.mkString(", ")} " +
        s"(required: ${requiredSources.toSeq.sorted.mkString(", ")})")
    val users = transformUsers(src("users"), cfg)
    val (videos, tagDict) = buildVideoTags(
      src("videos"), src("taggable_taggables"), src("taggable_tags"), cfg)
    val comments = transformComments(src("comments"))
    val messages = transformMessages(src("messages"))
    val playlistVideo = fillPlaylists(
      src("playlists"), src("favorites"), src("uploads"), cfg)
    Map(
      "users" -> users,
      "videos" -> videos,
      "tags" -> tagDict,
      "comments" -> comments,
      "messages" -> messages,
      "playlist_video" -> playlistVideo)
  }
}
