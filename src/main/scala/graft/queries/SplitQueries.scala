package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.dedup.Dedup

/** Dataset assembly — the step between a cleaned corpus and a training run:
  * deterministic train/val/test splits, contamination-safe (cluster-aware)
  * splitting, temperature-based language rebalancing, and seeded
  * shuffle-sharding. None of the reference's queries cover this surface
  * (its scope ends at migration); these are the north-star operators a
  * 100 TB corpus build runs after dedup/quality gating.
  *
  * Everything is content/key-hash deterministic (no RNG): re-running the
  * pipeline on the same corpus yields byte-identical assignments, which is
  * what makes petabyte dataset builds auditable, resumable, and
  * oracle-checkable. The hash is the portable 60-bit md5 bucket the rest of
  * the repo uses (tx7): DuckDB replays it bit-for-bit.
  */
object SplitQueries {
  private type Q = (SparkSession, String) => DataFrame

  /** `('0x' || substr(md5(x),1,15))::BIGINT % mod`, portably. */
  private def md5Bucket(c: Column, mod: Long): Column =
    conv(substring(md5(c.cast("binary")), 1, 15), 16, 10).cast("bigint") % mod

  /** 98/1/1 by permille bucket — the fractions of a pretraining holdout. */
  private def splitLabel(bucket: Column): Column =
    when(bucket < 980, "train").when(bucket < 990, "val").otherwise("test")

  val queries: Map[String, Q] = Map(
    // SPL1: deterministic train/val/test split. The bucket hashes CONTENT,
    // not doc_id: re-ingestion under new ids cannot move a document across
    // the boundary, and byte-identical duplicates land on the same side by
    // construction. Pure map over the scan — no shuffle, no state; at
    // 100 TB this is a single pass that parallelizes perfectly.
    "spl1_hash_split" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"), splitLabel(md5Bucket(col("text"), 1000)).as("split"))),

    // SPL2: LEAKAGE-SAFE split — the contamination guard of corpus
    // construction. A content-hash split still leaks when near-duplicates
    // (not byte-identical) straddle train/test, so the split key is the
    // near-dup CLUSTER label (the d6 MinHash→LSH→connected-components
    // pipeline), not the document: every member of a cluster inherits the
    // same side. Docs outside any candidate pair are their own cluster.
    // Shape: the proven d6 pipeline + one equi-join of labels back to the
    // corpus + a map — nothing new has to scale.
    "spl2_leakage_safe_split" -> ((s, d) => {
      val pairs = leakagePairs(s, d)
      val labeled = Tables.documents(s, d).select("doc_id")
        // adaptive resolver (result-identical to plain propagation,
        // O(log n) on chains — CcRouteSpec) for the production split face
        .join(Dedup.connectedComponentsAuto(pairs), Seq("doc_id"), "left")
        .select(col("doc_id"), coalesce(col("cluster"), col("doc_id")).as("cluster"))
      val b = md5Bucket(concat(lit("split|"), col("cluster").cast("string")), 1000)
      labeled.select(col("doc_id"), col("cluster"), splitLabel(b).as("split"))
    }),

    // STR1: BALANCED stratified sampling — a fixed-size per-stratum eval
    // set (50 docs per language): rank each stratum's docs by the
    // deterministic content-hash order (bucket, then doc_id) and keep the
    // first 50. The hash order IS the "random" draw — auditable,
    // re-runnable, and the balanced-eval-set shape (equal absolute size
    // per stratum) that per-fraction sampling (spl1/ws1) can't give
    // low-resource strata. Reduction is the bounded-heap TopK Aggregator
    // (the v5 pattern) with score = −bucket, so "top" = the 50 SMALLEST
    // (bucket, doc_id) pairs: map-side partials keep at most 50 rows per
    // (lang, partition) — a dominant language never sorts its whole
    // stratum inside one window task (the skew a per-lang row_number
    // would reintroduce; round-10 review). The oracle replays the same
    // selection as a window — semantics identical, buckets < 2^53 are
    // exact as negated doubles, ties break on doc_id asc in both.
    "str1_balanced_sample" -> ((s, d) => {
      val topk = udaf(new graft.functions.Aggregators.TopK(50))
      Tables.documents(s, d)
        .select(col("doc_id"), col("lang"),
          md5Bucket(col("text"), 1000000L).as("b"))
        .groupBy("lang")
        .agg(topk(-col("b").cast("double"), col("doc_id")).as("top"))
        .select(col("lang"), posexplode(col("top")))
        .select(col("col._2").as("doc_id"), col("lang"),
          (col("pos") + 1).cast("bigint").as("rk"))
    }),

    // WS1: importance-WEIGHTED sampling — doc-level quality-weighted
    // downsampling (the per-document cousin of mx1's per-language
    // temperature): each doc keeps with probability proportional to its
    // weight (n_chars as the quality proxy — longest doc always kept),
    // applied as the deterministic content-hash Bernoulli the module's
    // no-RNG rule requires: keep iff bucket(text) < (w / w_max) · 10^6.
    // The threshold arithmetic is two IEEE exact-rounded ops in fixed
    // order (divide, multiply), so DuckDB replays the comparison
    // bit-for-bit. Scale shape: one |corpus|→1 max aggregation broadcast
    // back + a pure map filter — no corpus shuffle.
    "ws1_weighted_sample" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val maxw = docs.agg(max(col("n_chars")).as("mw"))
      docs.crossJoin(broadcast(maxw))
        .filter(md5Bucket(col("text"), 1000000L).cast("double") <
          col("n_chars").cast("double") / col("mw").cast("double") * lit(1000000.0))
        .select(col("doc_id"), col("lang"), col("n_chars"))
    }),

    // WS2: weighted sampling WITHOUT replacement — a FIXED-SIZE (50 per
    // language) quality-weighted draw, where ws1's Bernoulli gives a
    // random-sized one. Efraimidis–Spirakis exponential keys: doc i wins
    // iff U_i^(1/w_i) ranks in the stratum's top k. Deterministic U from
    // the content-hash bucket ((b + 0.5)/10^6 ∈ (0,1) — no RNG, the
    // module rule), and the rank key is the monotone transform
    // ln(U)/w — ln + one exact division, no pow (ln is engine-identical,
    // the tx9 precedent; pow is not guaranteed correctly rounded).
    // Docs with w <= 0 are excluded (ES assigns them probability 0).
    // Reduction is the same bounded-heap TopK as str1: map-side partials
    // keep <= 50 rows per (lang, partition), so a dominant language never
    // sorts its stratum in one window task. Oracle replays the key
    // formula as a per-stratum window; the TopK heap's boundary eviction
    // (lowest key, then highest id) matches ORDER BY key DESC, doc_id ASC.
    "ws2_weighted_sample_noreplace" -> ((s, d) => {
      val topk = udaf(new graft.functions.Aggregators.TopK(50))
      val u = (md5Bucket(col("text"), 1000000L).cast("double") + lit(0.5)) /
        lit(1000000.0)
      Tables.documents(s, d)
        .filter(col("n_chars") > 0)
        .select(col("doc_id"), col("lang"),
          (log(u) / col("n_chars").cast("double")).as("es_key"))
        .groupBy("lang")
        .agg(topk(col("es_key"), col("doc_id")).as("top"))
        .select(col("lang"), posexplode(col("top")))
        .select(col("col._2").as("doc_id"), col("lang"),
          (col("pos") + 1).cast("bigint").as("rk"))
    }),

    // MX1: temperature-based language rebalancing (the multilingual-corpus
    // move: raise low-resource languages' share by downsampling the head).
    // Acceptance rate per language = sqrt(n_min / n_l) — alpha = 0.5
    // temperature normalized so the smallest language keeps everything —
    // applied as a deterministic content-hash threshold, no RNG. Two
    // passes by necessity (rates depend on global counts): a map-side
    // partial count to |langs| rows, then a broadcast join + map filter.
    // The only window runs over the LANGUAGE DIMENSION (|langs| rows), never
    // the corpus.
    "mx1_temperature_mix" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val counts = docs.groupBy("lang").agg(count(lit(1)).as("n"))
      val minN = min(col("n")).over(Window.partitionBy())
      val rates = counts.select(col("lang"),
        round(sqrt(minN.cast("double") / col("n")) * 1000000L).cast("bigint").as("thr"))
      docs.join(broadcast(rates), "lang")
        .filter(md5Bucket(col("text"), 1000000L) < col("thr"))
        .select("doc_id", "lang")
    }),

    // MX2: per-language TOKEN budget — the mixture knob production corpus
    // builds actually turn ("this run gets at most B tokens of each
    // language"), where mx1's knob is a sampling RATE. Docs are admitted in
    // deterministic content-hash priority order until the language's
    // running token total crosses the budget.
    //
    // TWO-LEVEL form (round-8 verdict item #2 — the single-window form
    // sorted the WHOLE corpus inside one partition per language, which at
    // 100 TB with English >> budget sorts vastly more than it admits):
    //   1. bucket docs by the TOP bits of the same priority hash — bucket
    //      order is a prefix of the (h, doc_id) priority order, so bucket
    //      boundaries never split the admission order;
    //   2. per-(lang, bucket) token totals (one map-combinable agg), then
    //      a prefix sum over the |langs|x|buckets| TOTALS row set (a
    //      dimension-table window, never the corpus) gives each bucket its
    //      starting offset `prior`;
    //   3. buckets with prior > budget cannot admit anything (every doc's
    //      running total >= prior) and are dropped BEFORE any sort — the
    //      per-doc running-sum window then runs per (lang, bucket) over
    //      only ~budget tokens' worth of docs per language, and with
    //      |buckets|x the parallelism of the per-language window.
    // Offsets make the within-bucket running sums globally exact, so the
    // output hash-matches the unchanged single-window oracle (SplitSpec
    // also pins equality against mx2SingleWindow on two fixtures).
    "mx2_token_budget_mix" -> ((s, d) => {
      val base = mx2Base(s, d)
        .withColumn("bucket", shiftright(col("h"), 60 - mx2BucketBits))
      val offsets = mx2Offsets(base)
      val ww = Window.partitionBy("lang", "bucket").orderBy(col("h"), col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, 0)
      base.join(broadcast(offsets), Seq("lang", "bucket"))
        .withColumn("cum_tok", col("prior") + sum(col("n_tok")).over(ww))
        .filter(col("cum_tok") <= tokenBudget)
        .select("doc_id", "lang", "n_tok", "cum_tok")
    }),

    // REP1: epoch-weighted upsampling — the other half of mixture design:
    // rare languages are REPEATED (multiple epochs) rather than the head
    // being dropped (mx1) or capped (mx2). Epochs per language =
    // min(4, ceil(sqrt(n_max / n_lang))) — the sqrt tempering of mx1 in
    // repeat space, capped at the 4-epoch point where repetition stops
    // helping. The replication is explode(sequence(1, epochs)): a map-side
    // fan-out with NO shuffle after the |langs|-row broadcast join, and the
    // (doc_id, epoch) output is exactly the sample list a packing/shuffle
    // stage downstream consumes.
    "rep1_epoch_upsample" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val counts = docs.groupBy("lang").agg(count(lit(1)).as("n"))
      val maxN = max(col("n")).over(Window.partitionBy())
      val epochs = counts.select(col("lang"),
        least(lit(4L), ceil(sqrt(maxN.cast("double") / col("n"))).cast("bigint"))
          .as("epochs"))
      docs.join(broadcast(epochs), "lang")
        .select(col("doc_id"), col("lang"),
          explode(sequence(lit(1L), col("epochs"))).as("epoch"))
    }),

    // CUR1: quality-curriculum ordering — the corpus emitted as (phase,
    // shard, pos): phase 1 = highest tx2 quality score, later phases
    // noisier, so a trainer consuming phases in order runs a
    // clean-data-first curriculum. Phase boundaries are FIXED score
    // thresholds (no global quantile pass — a deterministic map), and
    // within a phase the order is shuf1's sharded hash permutation: shard
    // = hash mod 8, pos = rank within (phase, shard). The only window is
    // per-(phase, shard) — 32-way parallel, never a global sort.
    "cur1_curriculum" -> ((s, d) => {
      val score = graft.text.TextAnalysis.qualityScore(col("text"))
      val h = conv(substring(md5(concat(lit("cur|"),
        col("doc_id").cast("string")).cast("binary")), 1, 15), 16, 10).cast("bigint")
      val w = Window.partitionBy(col("phase"), col("shard"))
        .orderBy(col("h"), col("doc_id"))
      Tables.documents(s, d)
        .select(col("doc_id"),
          when(score >= 0.4, 1L).when(score >= 0.3, 2L)
            .when(score >= 0.2, 3L).otherwise(4L).as("phase"),
          h.as("h"))
        .withColumn("shard", col("h") % 8)
        .withColumn("pos", row_number().over(w).cast("bigint"))
        .select("doc_id", "phase", "shard", "pos")
    }),

    // SHUF1: seeded global shuffle, sharded — training-order randomization
    // as (shard, position) rather than one global index: a single
    // row_number over the whole corpus would be a one-partition window (the
    // classic scale killer), so the order is declared per shard — shard =
    // key-hash mod 32, position = rank of the hash within the shard. The
    // concatenation shard 0 rows, shard 1 rows, ... IS a deterministic
    // permutation of the corpus, and each shard sorts independently
    // (one shuffle, 32-way parallel window). Keyed on doc_id + literal
    // seed: reshuffling between epochs is a seed change, not a data pass.
    "shuf1_sharded_shuffle" -> ((s, d) => {
      val h = conv(substring(md5(concat(lit("seed42|"),
        col("doc_id").cast("string")).cast("binary")), 1, 15), 16, 10).cast("bigint")
      val w = Window.partitionBy(col("shard")).orderBy(col("h"), col("doc_id"))
      Tables.documents(s, d)
        .select(col("doc_id"), h.as("h"))
        .withColumn("shard", col("h") % 32)
        .withColumn("pos", row_number().over(w).cast("bigint"))
        .select("doc_id", "shard", "pos")
    })
  )

  /** mx2's per-language token budget — ONE constant drives the Spark plan
    * and the oracle. 2000 whitespace tokens binds for every language at the
    * verify scale (sf0.01 languages run 3.5k–12k tokens), so the operator's
    * cutoff path is actually exercised, not just its pass-through.
    */
  private val tokenBudget = 2000L

  /** mx2's priority-hash bucket width: the TOP `mx2BucketBits` bits of the
    * 60-bit hash, i.e. 2^bits range-buckets that partition the (h, doc_id)
    * admission order. 4 bits (16 buckets) keeps every fixture language's
    * docs spread across multiple buckets so the cutoff actually prunes in
    * SplitSpec; production tunes this so budget/2^bits tokens fit one task.
    */
  private[queries] val mx2BucketBits = 4

  /** The shared mx2 scan: (doc_id, lang, n_tok, h). */
  private def mx2Base(s: SparkSession, d: String): DataFrame = {
    val h = conv(substring(md5(col("text").cast("binary")), 1, 15), 16, 10)
      .cast("bigint")
    Tables.documents(s, d)
      .select(col("doc_id"), col("lang"),
        graft.text.TextAnalysis.tokenCountWs(col("text")).as("n_tok"), h.as("h"))
  }

  /** mx2's bucket-cutoff stage, shared by the registry face and
    * [[mx2SortVolume]] (round-9 review: a duplicated pipeline would let
    * SplitSpec's budget-boundedness gate measure a different plan than
    * the registry runs): per-(lang, bucket) token totals, a prefix sum
    * over the TOTALS rows, and the `prior <= budget` cutoff. Returns the
    * admissible (lang, bucket, prior) frame.
    */
  private def mx2Offsets(base: DataFrame): DataFrame = {
    val wb = Window.partitionBy("lang").orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, -1)
    base.groupBy("lang", "bucket").agg(sum(col("n_tok")).as("btok"))
      .withColumn("prior", coalesce(sum(col("btok")).over(wb), lit(0L)))
      .filter(col("prior") <= tokenBudget)
      .select("lang", "bucket", "prior")
  }

  /** The original single-window mx2 (one running sum partitioned by
    * language): kept as the equivalence REFERENCE for SplitSpec — the
    * registry face is the two-level form, which must be indistinguishable
    * from this on any input.
    */
  private[graft] def mx2SingleWindow(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("lang")).orderBy(col("h"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, 0)
    mx2Base(s, d)
      .withColumn("cum_tok", sum(col("n_tok")).over(w))
      .filter(col("cum_tok") <= tokenBudget)
      .select("doc_id", "lang", "n_tok", "cum_tok")
  }

  /** Rows surviving mx2's bucket cutoff (the volume the final per-doc sort
    * actually touches) vs the full corpus — SplitSpec's budget-boundedness
    * gate reads these two counts.
    */
  private[graft] def mx2SortVolume(s: SparkSession, d: String): (Long, Long) = {
    val base = mx2Base(s, d)
      .withColumn("bucket", shiftright(col("h"), 60 - mx2BucketBits))
    val offsets = mx2Offsets(base).select("lang", "bucket")
    (base.join(broadcast(offsets), Seq("lang", "bucket")).count(), base.count())
  }

  /** spl2's candidate-pair input — d6's MinHash→LSH candidate semantics,
    * read from the SHARED band-key index (TextQueries.bandKeyIndex: one
    * Standing-gated signature pass serves d15/d14/spl2; values identical
    * to the inline lineage). Public so SplitSpec can assert the leakage
    * invariant (no candidate pair straddles a split) against the same pair
    * set the query used.
    */
  def leakagePairs(s: SparkSession, d: String): DataFrame =
    Dedup.candidatePairs(TextQueries.bandKeyIndex(s, d), "doc_id",
      materialize = false)

  val oracles: Map[String, String] = Map(
    "str1_balanced_sample" ->
      """SELECT doc_id, lang, rk FROM (
           SELECT doc_id, lang,
             row_number() OVER (PARTITION BY lang
               ORDER BY ('0x' || substr(md5(text), 1, 15))::BIGINT % 1000000,
                        doc_id)::BIGINT AS rk
           FROM documents)
         WHERE rk <= 50""",
    // same hash-uniform U and ln(U)/w key, replayed as a window — the
    // (add, divide, ln, divide) chain is fixed-order and engine-identical
    "ws2_weighted_sample_noreplace" ->
      """SELECT doc_id, lang, rk FROM (
           SELECT doc_id, lang,
             row_number() OVER (PARTITION BY lang
               ORDER BY ln(((('0x' || substr(md5(text), 1, 15))::BIGINT % 1000000)::DOUBLE + 0.5)
                           / 1000000.0) / n_chars::DOUBLE DESC,
                        doc_id)::BIGINT AS rk
           FROM documents WHERE n_chars > 0)
         WHERE rk <= 50""",
    // same md5 bucket, same (divide, multiply) order — the comparison is
    // IEEE-identical across engines
    "ws1_weighted_sample" ->
      """WITH mw AS (SELECT max(n_chars) AS mw FROM documents)
         SELECT doc_id, lang, n_chars
         FROM documents, mw
         WHERE (('0x' || substr(md5(text), 1, 15))::BIGINT % 1000000)::DOUBLE
               < n_chars::DOUBLE / mw::DOUBLE * 1000000.0""",
    "spl1_hash_split" ->
      """SELECT doc_id,
           CASE WHEN b < 980 THEN 'train' WHEN b < 990 THEN 'val' ELSE 'test' END AS split
         FROM (SELECT doc_id, ('0x' || substr(md5(text), 1, 15))::BIGINT % 1000 AS b
               FROM documents)""",
    // d6's recursive-CTE CC rebuild, then the same hash CASE over the
    // cluster label — singleton docs (no candidate pair) are their own
    // cluster via the left join
    "spl2_leakage_safe_split" ->
      s"""WITH RECURSIVE t AS (${TextQueries.shingleCte}),
         sigs AS (
           SELECT doc_id, list_value(${TextQueries.sigEntriesSql.mkString(", ")}) AS sig
           FROM t),
         bands AS (
           SELECT doc_id, i::VARCHAR || ':' || sig[2*i + 1] || '|' || sig[2*i + 2] AS band_key
           FROM sigs, unnest(range(0, 4)) u(i)),
         pairs AS (
           SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
           FROM bands l JOIN bands r USING (band_key)
           WHERE l.doc_id < r.doc_id),
         edges AS (SELECT a AS src, b AS dst FROM pairs UNION ALL SELECT b, a FROM pairs),
         nodes AS (SELECT DISTINCT src AS node FROM edges),
         reach(n, m) AS (
           SELECT node, node FROM nodes
           UNION
           SELECT r.n, e.dst FROM reach r JOIN edges e ON e.src = r.m),
         cc AS (SELECT n AS doc_id, min(m) AS cluster FROM reach GROUP BY n),
         labeled AS (
           SELECT d.doc_id, coalesce(cc.cluster, d.doc_id) AS cluster
           FROM documents d LEFT JOIN cc USING (doc_id))
         SELECT doc_id, cluster,
           CASE WHEN b < 980 THEN 'train' WHEN b < 990 THEN 'val' ELSE 'test' END AS split
         FROM (SELECT doc_id, cluster,
                 ('0x' || substr(md5('split|' || cluster), 1, 15))::BIGINT % 1000 AS b
               FROM labeled)""",
    "mx1_temperature_mix" ->
      """WITH counts AS (SELECT lang, count(*)::BIGINT AS n FROM documents GROUP BY lang),
         rates AS (
           SELECT lang,
             round(sqrt((SELECT min(n) FROM counts)::DOUBLE / n) * 1000000)::BIGINT AS thr
           FROM counts)
         SELECT d.doc_id, d.lang
         FROM documents d JOIN rates r USING (lang)
         WHERE ('0x' || substr(md5(d.text), 1, 15))::BIGINT % 1000000 < r.thr""",
    "shuf1_sharded_shuffle" ->
      """SELECT doc_id, h % 32 AS shard,
           row_number() OVER (PARTITION BY h % 32 ORDER BY h, doc_id) AS pos
         FROM (SELECT doc_id, ('0x' || substr(md5('seed42|' || doc_id), 1, 15))::BIGINT AS h
               FROM documents)""",
    "mx2_token_budget_mix" ->
      s"""SELECT doc_id, lang, n_tok, cum_tok FROM (
           SELECT doc_id, lang, n_tok,
             (sum(n_tok) OVER (PARTITION BY lang ORDER BY h, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::BIGINT AS cum_tok
           FROM (SELECT doc_id, lang,
                   len(regexp_split_to_array(trim(text), '\\s+'))::BIGINT AS n_tok,
                   ('0x' || substr(md5(text), 1, 15))::BIGINT AS h
                 FROM documents))
         WHERE cum_tok <= $tokenBudget""",
    "cur1_curriculum" ->
      """WITH scored AS (
           SELECT doc_id,
             least(stop_hits / n_tok * 5.0, 1.0) * 0.5
               + least(n_tok / 200.0, 1.0) * 0.5 AS score,
             ('0x' || substr(md5('cur|' || doc_id), 1, 15))::BIGINT AS h
           FROM (SELECT doc_id,
                   len(regexp_extract_all(lower(text), '\b(the|a|of|and|to|in|is)\b'))::BIGINT AS stop_hits,
                   len(regexp_split_to_array(trim(text), '\s+'))::DOUBLE AS n_tok
                 FROM documents)),
         phased AS (
           SELECT doc_id,
             CASE WHEN score >= 0.4 THEN 1 WHEN score >= 0.3 THEN 2
                  WHEN score >= 0.2 THEN 3 ELSE 4 END::BIGINT AS phase,
             h, h % 8 AS shard
           FROM scored)
         SELECT doc_id, phase, shard,
           row_number() OVER (PARTITION BY phase, shard ORDER BY h, doc_id) AS pos
         FROM phased""",
    "rep1_epoch_upsample" ->
      """WITH counts AS (SELECT lang, count(*)::BIGINT AS n FROM documents GROUP BY lang),
         ep AS (
           SELECT lang,
             least(4, ceil(sqrt((SELECT max(n) FROM counts)::DOUBLE / n))::BIGINT) AS epochs
           FROM counts)
         SELECT d.doc_id, d.lang, u.epoch::BIGINT AS epoch
         FROM documents d JOIN ep USING (lang),
           unnest(range(1, ep.epochs + 1)) u(epoch)"""
  )
}
