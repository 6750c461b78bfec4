package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.Tables
import graft.ops.{Cleansing, TagNormalize}

/** The reference's relational/ETL operator surface (SURVEY.md §2) mapped onto
  * the fixture star schema (FIXTURES.md §A). Every query is a pure
  * `(SparkSession, sfDir) => DataFrame` with a DuckDB oracle in [[oracles]].
  *
  * Scale posture: all plans are declarative DataFrame ops — Catalyst pushes
  * filters/projections into the parquet scans, map-side-combines aggregates,
  * and auto-broadcasts small join sides; the only intentional hints are
  * `broadcast()` on provably-small dimensions (reference's hand-rolled
  * broadcast join, src/index.mjs:96-108).
  */
object RelationalQueries {
  private type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // ----- S: sources / scans (SURVEY §2.1) -----
    // S1: full scan, dynamic schema on read.
    "s1_full_scan" -> ((s, d) => Tables.customer(s, d)),

    // S4/S5: projected scan — Catalyst prunes columns into the parquet reader
    // (the reference pruned by hand, queries.mjs:6-7).
    "s4_projected_scan" -> ((s, d) =>
      Tables.orders(s, d).select("o_orderkey", "o_custkey", "o_orderdate")),

    // S8 + O2 + A2: top-1-by-sort-desc expressed as max(), plus the +1
    // sequence fixup (K3's computed value, index.mjs:120-126).
    "s8_max_id_plus_one" -> ((s, d) =>
      Tables.orders(s, d).agg((max(col("o_orderkey")) + 1).as("next_id"))),

    // ----- flagship: S6 = J1 + A1 (copy_videos_and_tags spine) -----
    // videos⋈junction⋈tags + GROUP_CONCAT(DISTINCT..) ≙
    // lineitem⋈part + collect_set, sorted for determinism (SURVEY §2.6 A1).
    "s6_flagship_group_concat" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      val p = Tables.part(s, d)
      li.join(p, li("l_partkey") === p("p_partkey"))
        .groupBy(col("l_orderkey"))
        .agg(array_join(array_sort(collect_set(col("p_name"))), ",").as("tags"))
    }),

    // Full copy_videos_and_tags pipeline (SURVEY §3.1): join → group-concat →
    // re-split/explode (F1/F3) → normalize via dictionary (E1/A4/J3/F4) →
    // re-group. The dictionary is distinct-tag-sized, hence broadcast.
    "pipeline_videos_tags" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      val p = Tables.part(s, d)
      val exploded = li
        .join(p, li("l_partkey") === p("p_partkey"))
        .select(col("l_orderkey"), explode(split(col("p_name"), " ")).as("tag"))
      // The dictionary is derived from PART alone, not from the exploded
      // join output: every joined tag is a part-name word, so part's tag
      // set is a (slightly larger) superset — and normalizeTag is a pure
      // per-tag function, so superset rows are inert under the inner join.
      // The first cut re-ran the full lineitem⋈part join + explode +
      // corpus-wide distinct just to enumerate the dictionary; at 100 TB
      // that is a second pass over the fact table for a part-bounded
      // vocabulary (guide §2.4 — remove shuffles outright).
      val dict = p.select(explode(split(col("p_name"), " ")).as("tag")).distinct()
        .withColumn("normalized",
          TagNormalize.normalizeTag(concat(lit("  "), upper(col("tag")), lit(" "))))
      exploded.join(broadcast(dict), "tag")
        .groupBy("l_orderkey")
        .agg(array_join(array_sort(collect_set(col("normalized"))), ",").as("tags"))
    }),

    // ----- T: per-row transforms (SURVEY §2.3) -----
    // T1: constant overwrite (password masking, index.mjs:24).
    "t1_const_mask" -> ((s, d) =>
      Tables.customer(s, d)
        .select(col("c_custkey"), Cleansing.constMask("<masked>").as("password"))),

    // T2: JSON-encoded value parse (index.mjs:25) — real from_json on the
    // events.props JSON column.
    "t2_json_parse" -> ((s, d) =>
      Tables.events(s, d).select(
        col("event_id"),
        from_json(col("props"), org.apache.spark.sql.types.StructType.fromDDL("k BIGINT"))
          .getField("k").as("k"))),

    // T3: invalid-timestamp sentinel fallback (column_sets.mjs:5-17).
    // Zero-dates are synthesized deterministically from event_type.
    "t3_sentinel_timestamp" -> ((s, d) => {
      val raw = when(col("event_type") === "error", lit("0000-00-00 00:00:00"))
        .when(col("event_type") === "signup", lit(null).cast("string"))
        .otherwise(date_format(col("ts"), "yyyy-MM-dd HH:mm:ss"))
      Tables.events(s, d).select(
        col("event_id"),
        Cleansing.sentinelTimestamp(raw, lit("1970-01-01 00:00:00")).as("cleansed"))
    }),

    // T4: column rename / prop remap (column_sets.mjs:33-41).
    "t4_rename" -> ((s, d) =>
      Tables.orders(s, d)
        .select(col("o_custkey").as("buyer_id"), col("o_totalprice").as("amount"))),

    // T5: falsy -> NULL (response_to 0 -> DEFAULT, column_sets.mjs:67-70).
    "t5_falsy_to_null" -> ((s, d) =>
      Tables.events(s, d).select(
        col("event_id"),
        Cleansing.falsyToNull(col("event_id") % 5).as("resp"))),

    // T6: varchar(30) truncation (index.mjs:51-52).
    "t6_truncate" -> ((s, d) =>
      Tables.part(s, d)
        .select(col("p_partkey"), Cleansing.truncate(col("p_name"), 30).as("tag30"))),

    // T7: string -> int cast (parseInt on read-back ids, index.mjs:99).
    "t7_string_cast" -> ((s, d) =>
      Tables.orders(s, d).select(
        col("o_orderkey"),
        col("o_orderkey").cast("string").cast("bigint").as("parsed_id"))),

    // T8: client-side equality filter (playlist title, index.mjs:97) —
    // here it reaches the parquet scan as a pushed filter.
    "t8_filter" -> ((s, d) =>
      Tables.customer(s, d)
        .filter(col("c_mktsegment") === "BUILDING")
        .select("c_custkey", "c_name")),

    // ----- F: string / scalar functions (SURVEY §2.4) -----
    // F1+F3: split + flatten (index.mjs:36-38) as explode, with a word count.
    "f1_f3_split_explode" -> ((s, d) =>
      Tables.documents(s, d)
        .select(explode(split(col("text"), " ")).as("token"))
        .groupBy("token").agg(count(lit(1)).as("n"))),

    // F2: leading-marker regex (index.mjs:62) — length of the first match.
    "f2_regex_extract" -> ((s, d) =>
      Tables.documents(s, d).select(
        col("doc_id"),
        length(regexp_extract(col("text"), "^[a-z]+", 0)).cast("bigint").as("first_word_len"))),

    // F5: timestamp comparison (index.mjs:72).
    "f5_date_compare" -> ((s, d) =>
      Tables.lineitem(s, d).select(
        col("l_orderkey"), col("l_linenumber"),
        (col("l_shipdate") > lit("1995-06-01").cast("timestamp")).as("shipped_after"))),

    // ----- J: joins (SURVEY §2.5) -----
    // J1: 3-way inner equi-join (queries.mjs:8-10). Catalyst/AQE pick
    // broadcast vs sort-merge per side size.
    "j1_three_way_join" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      val o = Tables.orders(s, d)
      val c = Tables.customer(s, d)
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .select(col("l_orderkey"), col("l_linenumber"), col("c_custkey"), col("c_name"))
    }),

    // J2: broadcast hash join against a filtered small dimension
    // (index.mjs:96-108). LEFT join: the reference's Map.get miss yields
    // undefined, not a dropped row (SURVEY §7.5 risk 4).
    "j2_broadcast_left_join" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val dim = Tables.customer(s, d)
        .filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey"), col("c_name"))
      o.join(broadcast(dim), o("o_custkey") === dim("c_custkey"), "left")
        .select(col("o_orderkey"), col("o_custkey"), col("c_name").as("playlist"))
    }),

    // ----- A: aggregations (SURVEY §2.6) -----
    // A1 on a small dimension: per-region sorted distinct nation list.
    "a1_group_concat_nations" -> ((s, d) => {
      val r = Tables.region(s, d)
      val n = Tables.nation(s, d)
      r.join(n, r("r_regionkey") === n("n_regionkey"))
        .groupBy("r_name")
        .agg(array_join(array_sort(collect_set(col("n_name"))), ",").as("nations"))
    }),

    // A3: per-stage observability counts (index.mjs:17 etc.).
    "a3_table_counts" -> ((s, d) => {
      def one(name: String) =
        Tables.load(s, d, name).agg(count(lit(1)).as("n")).select(lit(name).as("tbl"), col("n"))
      one("customer").unionByName(one("orders")).unionByName(one("lineitem"))
    }),

    // A4 + T6: distinct dictionary build with truncation (normalize_tags.mjs:7-9).
    "a4_distinct_dict" -> ((s, d) =>
      Tables.part(s, d)
        .select(Cleansing.truncate(col("p_name"), 30).as("tag"))
        .distinct()
        .withColumn("normalized", upper(col("tag")))),

    // K2: ON CONFLICT DO NOTHING ≙ dropDuplicates + left-anti vs existing keys
    // (index.mjs:49-55, SURVEY §2.2 K2).
    "k2_anti_join_upsert" -> ((s, d) => {
      val p = Tables.part(s, d)
      val tag = concat_ws("#", col("p_name"), col("p_size")).as("tag")
      val existing = p.filter(col("p_partkey") % 2 === 0).select(tag).distinct()
      val incoming = p.filter(col("p_partkey") % 2 === 1).select(tag).distinct()
      incoming.join(existing, Seq("tag"), "left_anti")
    }),

    // ----- O/U: sort, limit, union (SURVEY §2.8) -----
    // O2: deterministic top-k (tie-broken) — sort-desc + limit.
    "o2_topk_orders" -> ((s, d) =>
      Tables.orders(s, d)
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .select("o_orderkey", "o_totalprice")
        .limit(10)),

    // U1 + T9: favorites ∪ uploads with coalesce across differently-named id
    // columns (index.mjs:102-117).
    "u1_union_playlist_video" -> ((s, d) => {
      val uploads = Tables.orders(s, d).select(
        col("o_orderkey").as("id"), col("o_custkey").as("user_id"),
        col("o_orderdate").as("created_at"), lit(null).cast("bigint").as("video_id"))
      val favs = Tables.lineitem(s, d).select(
        lit(null).cast("bigint").as("id"), col("l_suppkey").as("user_id"),
        col("l_shipdate").as("created_at"), col("l_partkey").as("video_id"))
      uploads.unionByName(favs).select(
        col("user_id"),
        Cleansing.coalesceId(col("id"), col("video_id")).as("video_id"),
        col("created_at"))
    }),

    // ----- beyond-reference relational coverage -----
    // TPC-H Q1-style pricing summary: grouped multi-aggregate with map-side
    // partial aggregation; money sums rounded for cross-engine fp stability.
    "q1_pricing_summary" -> ((s, d) =>
      Tables.lineitem(s, d)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum(col("l_quantity")).as("sum_qty"),
          round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
          round(avg(col("l_quantity")), 6).as("avg_qty"),
          count(lit(1)).as("count_order"))
        ),

    // Analytic windows: row_number / lag / running sum per customer.
    "w1_window_rank" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      Tables.orders(s, d).select(
        col("o_custkey"), col("o_orderkey"),
        row_number().over(w).cast("bigint").as("rn"),
        lag(col("o_totalprice"), 1).over(w).as("prev_price"),
        round(sum(col("o_totalprice"))
          .over(w.rowsBetween(Window.unboundedPreceding, 0)), 2).as("running_spend"))
    }),

    // Rollup: hierarchical totals region -> nation -> grand total. Expressed
    // in Spark SQL: Dataset.rollup after a multi-join trips a false-positive
    // ambiguous-self-join check in the analyzer (plan is identical either way).
    "g1_rollup_counts" -> ((s, d) => {
      Tables.region(s, d).createOrReplaceTempView("g1_region")
      Tables.nation(s, d).createOrReplaceTempView("g1_nation")
      Tables.customer(s, d).createOrReplaceTempView("g1_customer")
      s.sql(
        """SELECT r_name, n_name, count(*) AS n_customers
           FROM g1_region JOIN g1_nation ON r_regionkey = n_regionkey
           JOIN g1_customer ON n_nationkey = c_nationkey
           GROUP BY ROLLUP (r_name, n_name)""")
    })
  )

  val oracles: Map[String, String] = Map(
    "s1_full_scan" -> "SELECT * FROM customer",
    "s4_projected_scan" -> "SELECT o_orderkey, o_custkey, o_orderdate FROM orders",
    "s8_max_id_plus_one" -> "SELECT max(o_orderkey) + 1 AS next_id FROM orders",
    "s6_flagship_group_concat" ->
      """SELECT l_orderkey, array_to_string(list_sort(list(DISTINCT p_name)), ',') AS tags
         FROM lineitem JOIN part ON l_partkey = p_partkey GROUP BY l_orderkey""",
    "pipeline_videos_tags" ->
      """WITH exploded AS (
           SELECT l_orderkey, unnest(string_split(p_name, ' ')) AS tag
           FROM lineitem JOIN part ON l_partkey = p_partkey
         ), dict AS (
           SELECT DISTINCT tag, trim(lower('  ' || upper(tag) || ' ')) AS normalized FROM exploded
         )
         SELECT l_orderkey, array_to_string(list_sort(list(DISTINCT d.normalized)), ',') AS tags
         FROM exploded e JOIN dict d USING (tag) GROUP BY l_orderkey""",
    "t1_const_mask" -> "SELECT c_custkey, '<masked>' AS password FROM customer",
    "t2_json_parse" ->
      "SELECT event_id, CAST(regexp_extract(props, '[0-9]+', 0) AS BIGINT) AS k FROM events",
    "t3_sentinel_timestamp" ->
      """SELECT event_id,
           CASE WHEN raw IS NULL THEN NULL
                WHEN try_cast(raw AS TIMESTAMP) IS NULL THEN TIMESTAMP '1970-01-01 00:00:00'
                ELSE try_cast(raw AS TIMESTAMP) END AS cleansed
         FROM (SELECT event_id,
                 CASE WHEN event_type = 'error' THEN '0000-00-00 00:00:00'
                      WHEN event_type = 'signup' THEN NULL
                      ELSE strftime(ts, '%Y-%m-%d %H:%M:%S') END AS raw
               FROM events)""",
    "t4_rename" -> "SELECT o_custkey AS buyer_id, o_totalprice AS amount FROM orders",
    "t5_falsy_to_null" ->
      """SELECT event_id,
           CASE WHEN event_id % 5 = 0 THEN NULL ELSE event_id % 5 END AS resp FROM events""",
    "t6_truncate" -> "SELECT p_partkey, substr(p_name, 1, 30) AS tag30 FROM part",
    "t7_string_cast" ->
      "SELECT o_orderkey, CAST(CAST(o_orderkey AS VARCHAR) AS BIGINT) AS parsed_id FROM orders",
    "t8_filter" ->
      "SELECT c_custkey, c_name FROM customer WHERE c_mktsegment = 'BUILDING'",
    "f1_f3_split_explode" ->
      """SELECT token, count(*)::BIGINT AS n
         FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
         GROUP BY token""",
    "f2_regex_extract" ->
      """SELECT doc_id, length(regexp_extract(text, '^[a-z]+', 0))::BIGINT AS first_word_len
         FROM documents""",
    "f5_date_compare" ->
      """SELECT l_orderkey, l_linenumber,
           l_shipdate > TIMESTAMP '1995-06-01 00:00:00' AS shipped_after FROM lineitem""",
    "j1_three_way_join" ->
      """SELECT l_orderkey, l_linenumber, c_custkey, c_name
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey""",
    "j2_broadcast_left_join" ->
      """SELECT o_orderkey, o_custkey, c.c_name AS playlist
         FROM orders LEFT JOIN
           (SELECT c_custkey, c_name FROM customer WHERE c_mktsegment = 'BUILDING') c
         ON o_custkey = c.c_custkey""",
    "a1_group_concat_nations" ->
      """SELECT r_name, array_to_string(list_sort(list(DISTINCT n_name)), ',') AS nations
         FROM region JOIN nation ON r_regionkey = n_regionkey GROUP BY r_name""",
    "a3_table_counts" ->
      """SELECT 'customer' AS tbl, count(*)::BIGINT AS n FROM customer
         UNION ALL SELECT 'orders', count(*)::BIGINT FROM orders
         UNION ALL SELECT 'lineitem', count(*)::BIGINT FROM lineitem""",
    "a4_distinct_dict" ->
      """SELECT tag, upper(tag) AS normalized
         FROM (SELECT DISTINCT substr(p_name, 1, 30) AS tag FROM part)""",
    "k2_anti_join_upsert" ->
      """WITH existing AS (
           SELECT DISTINCT p_name || '#' || p_size AS tag FROM part WHERE p_partkey % 2 = 0
         ), incoming AS (
           SELECT DISTINCT p_name || '#' || p_size AS tag FROM part WHERE p_partkey % 2 = 1
         )
         SELECT tag FROM incoming ANTI JOIN existing USING (tag)""",
    "o2_topk_orders" ->
      """SELECT o_orderkey, o_totalprice FROM orders
         ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10""",
    "u1_union_playlist_video" ->
      """SELECT user_id, coalesce(id, video_id) AS video_id, created_at FROM (
           SELECT o_orderkey AS id, o_custkey AS user_id, o_orderdate AS created_at,
                  CAST(NULL AS BIGINT) AS video_id FROM orders
           UNION ALL
           SELECT CAST(NULL AS BIGINT), l_suppkey, l_shipdate, l_partkey FROM lineitem)""",
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
           sum(l_quantity) AS sum_qty,
           round(sum(l_extendedprice), 2) AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
           round(avg(l_quantity), 6) AS avg_qty,
           count(*)::BIGINT AS count_order
         FROM lineitem GROUP BY l_returnflag, l_linestatus""",
    "w1_window_rank" ->
      """SELECT o_custkey, o_orderkey,
           row_number() OVER w AS rn,
           lag(o_totalprice, 1) OVER w AS prev_price,
           round(sum(o_totalprice) OVER (PARTITION BY o_custkey
             ORDER BY o_orderdate ASC, o_orderkey ASC
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_spend
         FROM orders
         WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC)""",
    "g1_rollup_counts" ->
      """SELECT r_name, n_name, count(*)::BIGINT AS n_customers
         FROM region JOIN nation ON r_regionkey = n_regionkey
         JOIN customer ON n_nationkey = c_nationkey
         GROUP BY ROLLUP (r_name, n_name)"""
  )
}
