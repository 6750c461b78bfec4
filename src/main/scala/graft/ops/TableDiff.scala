package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.MetadataBuilder

/** Migration validation: a chunked-checksum diff of two table snapshots —
  * the step the reference migration has no answer for (it loads MariaDB
  * into Postgres and hopes; a production cutover needs row-level proof,
  * the vdiff/pt-table-checksum shape).
  *
  * Two passes, the second scoped to damage only:
  *
  *   1. CHUNK PASS — each side maps every row to a 40-bit md5-derived row
  *      hash (engine-portable: the DuckDB oracle computes the identical
  *      value) and aggregates per key-range chunk to (count, sum-of-hash).
  *      Order-insensitive, map-side combinable, one shuffle of
  *      |keys|/chunkSize rows per side. Chunks whose (count, sum) agree
  *      are PROVABLY identical up to checksum collision (~2^-40 per
  *      colliding pair, the standard checksum trade — a paranoid cutover
  *      re-runs with a second separator salt).
  *   2. ROW DRILL — only rows of mismatched chunks (left-semi against the
  *      bad-chunk list) full-outer join on the key and classify:
  *      missing_in_b / extra_in_b / changed. At 100 TB a healthy
  *      migration has a handful of bad chunks, so the expensive row join
  *      touches a vanishing fraction of the table — the same
  *      touched-scope-only discipline as cdc3/cdc6.
  *
  * Column values are canonicalized as strings (null -> a U+0000 marker,
  * U+0001 separators) so both engines hash the same bytes; callers pick
  * `cols` with engine-stable string forms (ints, strings, dates — not raw
  * doubles, whose formatting differs across engines).
  */
object TableDiff {

  /** How many rows a chunk may hold before the signed-64-bit sum of
    * 40-bit row hashes could wrap: 2^63 / 2^40 = 2^23 ≈ 8.4M. diff() and
    * chunkChecksums() require chunkSize at half that — overflow would be
    * SILENT in Spark (non-ANSI sum) while DuckDB sums into HUGEINT, so
    * the two engines would diverge exactly when the artifact matters.
    */
  val MaxChunkSize: Long = 1L << 22

  /** (key, chunk, 40-bit row hash): 10 hex chars trade per-row collision
    * resistance (still 2^-40 per colliding pair within a chunk) for a
    * sum that provably cannot wrap under [[MaxChunkSize]]. The chunk id
    * uses integer `div`, not double division — BIGINT keys above 2^53
    * would round to the wrong chunk in IEEE doubles and diverge from the
    * oracle's exact `//`. Keys must be nonnegative (div truncates toward
    * zero; DuckDB's // floors — they agree only there).
    */
  private def hashed(df: DataFrame, keyCol: String, cols: Seq[String],
      chunkSize: Long): DataFrame = {
    val payload = concat_ws("\u0001",
      cols.map(c => coalesce(col(c).cast("string"), lit("\u0000"))): _*)
    // withColumn (not select): callers like applyChecksumDelta need their
    // own columns (the op tag) to survive hashing
    df.withColumn("__k", col(keyCol))
      .withColumn("__chunk",
        expr(s"CAST(`$keyCol` AS BIGINT) div ${chunkSize}L"))
      .withColumn("__h",
        conv(substring(md5(payload.cast("binary")), 1, 10), 16, 10)
          .cast("bigint"))
  }

  /** The standing integrity artifact: per-chunk (row count, hash sum).
    * Linear, order-insensitive, map-side combinable — at 100 TB this is
    * the table a cutover audit KEEPS, not recomputes (see
    * [[applyChecksumDelta]]).
    */
  /** Column-metadata key recording the chunkSize an artifact was built
    * with. StructField metadata survives Spark's parquet round-trip (it
    * rides in the file footer's Spark schema) and is invisible to value/
    * hash comparison, so the standing artifact carries its own geometry.
    */
  private[graft] val ChunkSizeMetaKey = "graft.tablediff.chunkSize"

  def chunkChecksums(t: DataFrame, keyCol: String, cols: Seq[String],
      chunkSize: Long = 1000L): DataFrame = {
    require(chunkSize >= 1 && chunkSize <= MaxChunkSize,
      s"chunkSize must be in [1, $MaxChunkSize] (hash-sum overflow bound)")
    val meta = new MetadataBuilder().putLong(ChunkSizeMetaKey, chunkSize).build()
    hashed(t, keyCol, cols, chunkSize).groupBy("__chunk")
      .agg(count(lit(1)).as("n_rows"), sum(col("__h")).as("hash_sum"))
      .select(col("__chunk").as("chunk", meta), col("n_rows"), col("hash_sum"))
  }

  /** Incremental maintenance of [[chunkChecksums]]: both aggregates are
    * INVERTIBLE (count, sum), so a change feed updates the standing
    * artifact in O(|changes|) instead of rescanning the table — the cdc2
    * signed-delta pattern applied to integrity checking. `changes` carries
    * `opCol` in {insert, delete} plus the full row (an update is its
    * before-image delete + after-image insert, the usual CDC decomposition
    * — subtracting a row means knowing its hash, hence the before image).
    * Chunks whose count reaches zero are dropped, so the result is exactly
    * `chunkChecksums(base with changes applied)` — which IS the vd2 oracle.
    */
  def applyChecksumDelta(baseSums: DataFrame, changes: DataFrame,
      opCol: String, keyCol: String, cols: Seq[String],
      chunkSize: Long = 1000L): DataFrame = {
    // same overflow bound as diff()/chunkChecksums() — the delta path is
    // a MAINTENANCE face of the same artifact, so an oversized chunkSize
    // here would silently reintroduce the wrap the bound exists to stop
    require(chunkSize >= 1 && chunkSize <= MaxChunkSize,
      s"chunkSize must be in [1, $MaxChunkSize] (hash-sum overflow bound)")
    // a delta applied with a different chunkSize than the artifact was
    // built with lands rows in the wrong chunks and the result stops
    // being chunkChecksums(base+changes) — if the artifact recorded its
    // geometry (chunkChecksums stamps it; a foreign frame may not have
    // it, in which case the caller owns the agreement), fail loudly
    val recorded = baseSums.schema("chunk").metadata
    if (recorded.contains(ChunkSizeMetaKey)) {
      val got = recorded.getLong(ChunkSizeMetaKey)
      require(got == chunkSize,
        s"baseSums artifact was built with chunkSize=$got but the delta " +
          s"would be applied at chunkSize=$chunkSize — chunk ids would " +
          "not line up")
    }
    val sign = when(col(opCol) === "insert", 1L).otherwise(-1L)
    val delta = hashed(changes, keyCol, cols, chunkSize)
      .withColumn("__sign", sign)
      .groupBy("__chunk")
      .agg(sum(col("__sign")).as("__dn"),
        sum(col("__sign") * col("__h")).as("__ds"))
    val meta = new MetadataBuilder().putLong(ChunkSizeMetaKey, chunkSize).build()
    baseSums.select(col("chunk").as("__chunk"), col("n_rows"), col("hash_sum"))
      .join(delta, Seq("__chunk"), "full_outer")
      .select(col("__chunk").as("chunk", meta),
        (coalesce(col("n_rows"), lit(0L)) + coalesce(col("__dn"), lit(0L)))
          .as("n_rows"),
        (coalesce(col("hash_sum"), lit(0L)) + coalesce(col("__ds"), lit(0L)))
          .as("hash_sum"))
      .filter(col("n_rows") > 0)
  }

  def diff(a: DataFrame, b: DataFrame, keyCol: String, cols: Seq[String],
      chunkSize: Long = 1000L): DataFrame = {
    require(chunkSize >= 1 && chunkSize <= MaxChunkSize,
      s"chunkSize must be in [1, $MaxChunkSize] (hash-sum overflow bound)")
    val ha = hashed(a, keyCol, cols, chunkSize)
    val hb = hashed(b, keyCol, cols, chunkSize)
    def chunkSums(h: DataFrame, n: String, s: String) =
      h.groupBy("__chunk").agg(count(lit(1)).as(n), sum(col("__h")).as(s))
    val badChunks = chunkSums(ha, "__na", "__sa")
      .join(chunkSums(hb, "__nb", "__sb"), Seq("__chunk"), "full_outer")
      // -1 sentinels: a chunk absent on one side must compare unequal,
      // and neither count (>=1) nor sum (>=0) can legitimately be -1
      .filter(coalesce(col("__na"), lit(-1L)) =!= coalesce(col("__nb"), lit(-1L)) ||
        coalesce(col("__sa"), lit(-1L)) =!= coalesce(col("__sb"), lit(-1L)))
      .select("__chunk")
    val drillA = ha.join(badChunks, Seq("__chunk"), "left_semi")
    val drillB = hb.join(badChunks, Seq("__chunk"), "left_semi")
    drillA.select(col("__k"), col("__h").as("__ha"))
      .join(drillB.select(col("__k"), col("__h").as("__hb")), Seq("__k"), "full_outer")
      .withColumn("status",
        when(col("__hb").isNull, "missing_in_b")
          .when(col("__ha").isNull, "extra_in_b")
          .when(col("__ha") =!= col("__hb"), "changed"))
      .filter(col("status").isNotNull) // equal rows inside a bad chunk
      .select(col("__k").as(keyCol), col("status"))
  }
}
