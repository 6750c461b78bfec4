package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Query registry is assembled from per-domain modules:
  *   - [[RelationalQueries]] — the reference's ETL/relational surface (SURVEY §2)
  *   - text / dedup / similarity / streaming modules — north-star operators
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The copy_videos_and_tags spine: join → grouped distinct string-agg
    * (SURVEY §3.1).
    */
  def entry(spark: SparkSession): DataFrame =
    queries("s6_flagship_group_concat")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RelationalQueries.queries ++ EventQueries.queries ++ TextQueries.queries ++
      VectorQueries.queries ++ MediaQueries.queries ++ AdvancedQueries.queries ++
      GraphQueries.queries ++ SplitQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    RelationalQueries.oracles ++ EventQueries.oracles ++ TextQueries.oracles ++
      VectorQueries.oracles ++ MediaQueries.oracles ++ AdvancedQueries.oracles ++
      GraphQueries.oracles ++ SplitQueries.oracles
}
