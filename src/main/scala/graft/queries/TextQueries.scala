package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Checkpoints.TrackedOps

import graft.Tables
import graft.dedup.Dedup
import graft.text.TextAnalysis

/** Text-analysis + dedup queries over the documents table (north-star
  * operators; FIXTURES.md §A). Every query here has a full DuckDB oracle —
  * including MinHash/SimHash, whose md5-derived hashes are engine-portable
  * by construction.
  */
object TextQueries {
  private type Q = (SparkSession, String) => DataFrame

  /** tx18's retrieval workload: a (query_id, term) table — ONE Scala value
    * drives both the Spark plan (a broadcast frame) and the oracle's VALUES
    * literal (the plane/centroid-literal pattern), so the two engines score
    * the identical query set by construction. Mixed shapes on purpose:
    * 2- and 3-term queries, one shared term across queries (join), and one
    * rare term (dup, df~5% of docs) so the idf spread actually exercises
    * the ranking.
    */
  private[queries] val tx18QueryTerms: Seq[(Long, String)] = Seq(
    1L -> "hash", 1L -> "join",
    2L -> "filter", 2L -> "scan", 2L -> "column",
    3L -> "sort", 3L -> "merge",
    4L -> "dup", 4L -> "stream", 4L -> "join")

  // Shared doc prep: words + 3-gram shingles, docs with >= 3 words.
  // Repartition first: the md5-minhash work downstream is CPU-bound, and the
  // small local fixture arrives as one split; real 100 TB inputs have many
  // splits, so this only levels the local playing field.
  // private[queries]: SplitQueries reuses the same doc prep (spl2).
  // keyCol parameterizes WHICH column rides along with the shingles (d24
  // groups by source where everything else keys by doc_id) so the
  // shingling definition itself — tokenizer, n-gram width, min-word
  // filter — stays ONE definition for every consumer.
  private[queries] def shingled(s: SparkSession, d: String,
      keyCol: String = "doc_id"): DataFrame =
    Tables.documents(s, d)
      .repartition(s.sparkContext.defaultParallelism)
      .select(col(keyCol), split(col("text"), " ").as("w"))
      .filter(size(col("w")) >= 3)
      .withColumn("sh", Dedup.shingles(col("w")))

  /** The corpus BAND-KEY INDEX — "one index, many consumers" (round-9
    * advice #3). d15/d14/spl2 each rebuilt the full MinHash lineage that
    * d3b already demonstrates persisting; this is that persisted source
    * made shared: built ONCE per (session, fixture) (Standing.artifact —
    * the v9b pattern) as a bucketed catalog table keyed on band_key (the
    * pair-expansion grouping key, so every consumer's size pass and pair
    * aggregation read the bucket layout exchange-free — pass
    * `materialize = false` to candidatePairs, the d3b contract). At 100 TB
    * this is the signatures-as-persisted-columns posture: the signature
    * pass runs when the corpus changes, not once per consumer query.
    * Values are identical to the inline lineage (the build is
    * deterministic), so every consumer's full-rebuild oracle holds
    * unchanged. Table name carries the sanitized fixture path (v9b
    * round-9 rule) so a multi-fixture session never serves a stale index.
    *
    * d3b itself keeps its OWN un-cached build face: its job is to measure
    * the build+exchange-free-read, so a Standing cache hit there would
    * measure away the thing it exists to demonstrate.
    */
  private[queries] def bandKeyIndex(s: SparkSession, d: String): DataFrame = {
    val table = "band_key_index_" + d.replaceAll("[^A-Za-z0-9]", "_")
    graft.sources.Standing.artifact(s, d, "band_key_index") {
      val sigs = Dedup.withMinhashSig(shingled(s, d), "sh", "sig")
        .select("doc_id", "sig")
      graft.sources.Storage.replaceBucketed(
        Dedup.lshBandKeys(sigs, "doc_id", "sig"), table, "band_key", 8)
      java.lang.Boolean.TRUE
    }
    s.table(table)
  }

  /** The survivorship merge shared by d25 (batch) and d25b (incremental):
    * docs labeled by `clusters` (doc_id, cluster; unlabeled docs are their
    * own singleton cluster) collapse to one golden record per cluster.
    * Longest text wins; ties break lexicographically — the zero-padded
    * length prefix makes one string key both engines order identically.
    * 12 digits covers any text length representable in practice (lpad
    * TRUNCATES past the pad width, which would silently break the
    * ordering for 10^pad-char texts).
    */
  // private[graft]: StreamingGoldenRecordSpec drives the same merge through
  // the snapshot store's exactly-once streaming commits
  private[graft] def goldenMerge(docs: DataFrame, clusters: DataFrame): DataFrame = {
    val labeled = docs.join(clusters, Seq("doc_id"), "left")
      .withColumn("cluster", coalesce(col("cluster"), col("doc_id")))
    val textKey = concat(lpad(length(col("text")).cast("string"), 12, "0"),
      col("text"))
    labeled.groupBy("cluster").agg(
      min(col("doc_id")).as("keep_id"),
      count(lit(1)).as("n_members"),
      max_by(col("text"), textKey).as("text"),
      max(col("n_chars")).as("n_chars"),
      array_join(array_sort(collect_set(col("source"))), ",").as("sources"),
      array_join(array_sort(collect_set(col("lang"))), ",").as("langs"))
  }

  /** The touched-component incremental-relabel stage shared by d13
    * (cluster maintenance) and d25b (golden-record maintenance):
    * arrival-batch band keys probe the standing buckets for new candidate
    * pairs (an equi-join — never an old-corpus rescan), the pairs touch a
    * set of standing components, and connected components reruns ONLY over
    * those components' edges ∪ the new pairs. Consumers carry everything
    * untouched verbatim (each face's left-anti join, plan-asserted in
    * RegistryPlanSpec). `newPairs` is checkpointed: three downstream
    * consumers (touchedNodes, the relabel union, and — via them — the
    * faces' scoping joins) would otherwise re-run the probe join each.
    *
    * SKEW GUARD (the candidatePairs contract, applied to the probe): an
    * oversized (boilerplate) band key would concentrate arrival×bucket
    * candidates the way the standing generators' guard routes around, so
    * arrival-touched buckets above `maxBucket` switch to the STAR form —
    * every member (old and new) links to the bucket's min id, preserving
    * connectivity through the bucket exactly (CC labels, and hence
    * apply ≡ recompute, are unchanged) while bounding pairs at n−1 per
    * bucket. Oversized buckets NO arrival lands in contribute nothing,
    * same as the exact path. With no overflow (every fixture here) the
    * plan and results are exactly the unguarded form.
    */
  private[graft] final case class Relabel(newPairs: DataFrame, touchedNodes: DataFrame,
      touchedComps: DataFrame, touchedLabels: DataFrame, relabeled: DataFrame)

  private[graft] def incrementalRelabel(bandsAll: DataFrame, bandsNew: DataFrame,
      oldPairs: DataFrame, labelsOld: DataFrame,
      maxBucket: Int = Dedup.DefaultMaxBucket): Relabel = {
    // incremental candidates: each arrival pairs with every member of the
    // buckets it lands in (old members AND other arrivals). `bandsAll` is
    // the WHOLE index (old ∪ new) — taken as one frame so a caller whose
    // index is a single table (d25b) probes it in one scan instead of
    // union-of-complementary-filters
    def probe(arrivals: DataFrame, members: DataFrame): DataFrame = arrivals
      .select(col("band_key"), col("doc_id").as("x"))
      .join(members
        .select(col("band_key"), col("doc_id").as("y")), "band_key")
      .filter(col("x") =!= col("y"))
      .select(least(col("x"), col("y")).as("a"),
        greatest(col("x"), col("y")).as("b"))
    // the size pass is scoped to ARRIVAL-TOUCHED buckets: an unscoped pass
    // would scan the whole index per invocation — O(corpus) work inside an
    // operator whose contract is cost ∝ touched set. The arrival-key side
    // is batch-bounded, hence BROADCAST explicitly: bandsAll may be
    // checkpointed frames (d13) whose unknown size stats would otherwise
    // plan a sort-merge join shuffling the whole standing index just to
    // run a size check that normally returns "no overflow"
    val touchedBuckets = bandsAll.select("band_key", "doc_id")
      .join(broadcast(bandsNew.select("band_key").distinct()),
        Seq("band_key"), "left_semi")
    val raw = Dedup.oversizedKeys(touchedBuckets,
        Seq("band_key"), maxBucket, "incremental probe") match {
      case None => probe(bandsNew, bandsAll)
      case Some(overTouched) =>
        // oversized here means oversized AND arrival-touched; the rest of
        // the probe stays exact
        val small = probe(
          bandsNew.join(broadcast(overTouched), Seq("band_key"), "left_anti"),
          bandsAll.join(broadcast(overTouched), Seq("band_key"), "left_anti"))
        val reps = bandsAll
          .join(broadcast(overTouched), Seq("band_key"), "left_semi")
          .groupBy("band_key").agg(min(col("doc_id")).as("__rep"))
        // __rep is the bucket minimum, so rep < doc_id by construction —
        // the same star form as candidatePairs (the lockstep NOTE in Dedup)
        val stars = bandsAll
          .join(broadcast(reps), Seq("band_key"))
          .filter(col("doc_id") =!= col("__rep"))
          .select(col("__rep").as("a"), col("doc_id").as("b"))
        small.unionByName(stars)
    }
    val newPairs = raw.distinct().trackedCheckpoint()
    val touchedNodes = newPairs.select(col("a").as("doc_id"))
      .unionByName(newPairs.select(col("b").as("doc_id"))).distinct()
    val touchedComps = labelsOld
      .join(touchedNodes, Seq("doc_id"), "left_semi")
      .select("cluster").distinct()
    val touchedLabels = labelsOld.join(touchedComps, Seq("cluster"), "left_semi")
    // components are closed under their edges, so one-endpoint membership
    // is enough to collect every edge of a touched component
    val touchedEdges = oldPairs
      .join(touchedLabels.select(col("doc_id").as("a")), Seq("a"), "left_semi")
    Relabel(newPairs, touchedNodes, touchedComps, touchedLabels,
      Dedup.connectedComponentsAuto(touchedEdges.unionByName(newPairs)))
  }

  val queries: Map[String, Q] = Map(
    // ----- text analysis -----
    "tx1_token_counts" -> ((s, d) =>
      Tables.documents(s, d).select(
        col("doc_id"),
        TextAnalysis.tokenCountWs(col("text")).as("n_ws"),
        TextAnalysis.tokenCountBpe(col("text")).as("n_bpe"))),

    "tx2_quality_score" -> ((s, d) =>
      Tables.documents(s, d).select(
        col("doc_id"),
        TextAnalysis.stopwordHits(col("text")).as("stop_hits"),
        TextAnalysis.qualityScore(col("text")).as("score"))),

    "tx3_lang_id" -> ((s, d) =>
      Tables.documents(s, d).select(
        col("doc_id"),
        TextAnalysis.langId(col("text")).as("lang_pred"))),

    "tx4_fingerprint_bow" -> ((s, d) =>
      Tables.documents(s, d).select(
        col("doc_id"),
        TextAnalysis.fingerprintBow(col("text")).as("fp"))),

    // TX20: MIXED-LANGUAGE detection — the curation screen tx3's whole-doc
    // lang-id can't give (a doc that is half English half German id's
    // confidently as one of them and poisons both language buckets): run
    // the same marker heuristic on each HALF and flag disagreement.
    // The fixture's text is synthetic English-ish regardless of its lang
    // label, so the pathology is INJECTED deterministically (the
    // dq1/stat3 precedent): every %31 doc gets a German-marker tail
    // appended — the concatenated-pages shape a crawler produces — and
    // must flag as mixed with an oracle-replayed count. Scale: pure
    // per-row regex work, shuffle-free; the real pipeline drops or
    // splits flagged docs before anything tokenizes them.
    "tx20_mixed_lang" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val mixed = docs.select(col("doc_id"),
        when(col("doc_id") % 31 === 0,
          concat(col("text"), lit(mixTail))).otherwise(col("text"))
          .as("text"))
      val half = floor(length(col("text")) / 2).cast("int")
      val head = TextAnalysis.langId(col("text").substr(lit(1), half))
      val tail = TextAnalysis.langId(
        col("text").substr(half + 1, length(col("text"))))
      mixed.select(col("doc_id"), head.as("lang_head"), tail.as("lang_tail"),
        (head =!= tail).as("is_mixed"))
    }),

    // TX9: per-doc top-3 tf-idf terms — the relational tf-idf composition
    // (term explode -> tf agg -> df agg -> broadcast N -> score window).
    // Two shuffles (tf and df, both keyed) + a broadcast of the scalar doc
    // count and the word->df side, the 100 TB shape for corpus-level term
    // weighting. ln/× double math is engine-identical; ties broken by word.
    "tx9_tfidf_top_terms" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val words = docs
        .repartition(s.sparkContext.defaultParallelism)
        .select(col("doc_id"),
          explode(split(lower(trim(col("text"))), "\\s+")).as("word"))
        .filter(col("word") =!= "")
      val tf = words.groupBy("doc_id", "word").agg(count(lit(1)).as("tf"))
      val dfreq = words.select("doc_id", "word").distinct()
        .groupBy("word").agg(count(lit(1)).as("df"))
      val nDocs = docs.agg(count(lit(1)).as("n_docs"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("doc_id").orderBy(col("score").desc, col("word").asc)
      tf.join(dfreq, "word")
        .crossJoin(broadcast(nDocs))
        .withColumn("score", col("tf") * log(col("n_docs").cast("double") / col("df")))
        .withColumn("rank", row_number().over(w).cast("bigint"))
        .filter(col("rank") <= 3)
        .select(col("doc_id"), col("rank"), col("word"), round(col("score"), 6).as("score"))
    }),

    // TX19: DISTINCTIVE TERMS per corpus slice — log-odds ratio with a
    // Dirichlet prior (Monroe et al. 2008, "Fightin' Words"), the
    // corpus-COMPARISON face next to tx9's within-doc tf-idf: which words
    // are overrepresented in THIS language's slice vs the rest, z-scored
    // so rare flukes don't top the list (raw log-odds without the
    // variance term ranks hapaxes first). The curation use: slice
    // fingerprinting and contamination screening between corpus sources.
    // Shapes: one token explode, three keyed aggregations off the same
    // (lang, word) counts, a 1-row broadcast for the corpus totals, one
    // per-lang top-k window. Every z input is an integer count, and the
    // scoring chain is one fixed parenthesization mirrored textually in
    // the oracle (the tx17 discipline) — engine-exact without rounding
    // anything but the output.
    "tx19_distinctive_terms" -> ((s, d) => {
      val words = Tables.documents(s, d)
        .repartition(s.sparkContext.defaultParallelism)
        .select(col("lang"),
          explode(split(lower(trim(col("text"))), "\\s+")).as("word"))
        .filter(col("word") =!= "")
      val lw = words.groupBy("lang", "word").agg(count(lit(1)).as("y"))
        .localCheckpoint() // three consumers below — explode the corpus once
      val perLang = lw.groupBy("lang").agg(sum("y").as("n"))
      val perWord = lw.groupBy("word").agg(sum("y").as("t"))
      val globals = lw.agg(sum("y").as("big_n"),
        countDistinct("word").as("vocab"))
      val a0 = lit(0.01) * col("vocab")
      val scored = lw.join(perLang, "lang").join(perWord, "word")
        .crossJoin(broadcast(globals))
        .withColumn("yr", col("t") - col("y"))
        .withColumn("nr", col("big_n") - col("n"))
        .withColumn("delta",
          log((col("y") + lit(0.01)) /
              (col("n") + a0 - col("y") - lit(0.01))) -
          log((col("yr") + lit(0.01)) /
              (col("nr") + a0 - col("yr") - lit(0.01))))
        .withColumn("z", col("delta") /
          sqrt(lit(1.0) / (col("y") + lit(0.01)) +
               lit(1.0) / (col("yr") + lit(0.01))))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("lang").orderBy(col("z").desc, col("word").asc)
      scored.withColumn("rank", row_number().over(w).cast("bigint"))
        .filter(col("rank") <= 3)
        .select(col("lang"), col("rank"), col("word"),
          round(col("z"), 6).as("z"))
    }),

    // TX17: Okapi BM25 top-k retrieval for a fixed 3-term query — the
    // ranking function actually used where tx9's raw tf-idf is the teaching
    // form. Shapes: the tx9 token pipeline filtered to the query terms
    // BEFORE any aggregation (so the tf shuffle carries only matching
    // tokens), doc lengths as one keyed agg, corpus stats and per-term dfs
    // as 1-row broadcasts, then TakeOrderedAndProject for the top-k — no
    // global window, the o2 shape. Score determinism: each per-term BM25
    // factor is one fixed parenthesized expression over integer counts
    // (ln is engine-identical at round-6, the tx9 precedent), and the
    // cross-term sum is THREE terms added in fixed left-assoc order — never
    // a fold over a variable-length list, so fp order can't drift.
    "tx17_bm25_topk" -> ((s, d) => {
      val terms = Seq("hash", "join", "filter")
      val docs = Tables.documents(s, d)
      val words = docs
        .repartition(s.sparkContext.defaultParallelism)
        .select(col("doc_id"),
          explode(split(lower(trim(col("text"))), "\\s+")).as("word"))
        .filter(col("word") =!= "")
      // ONE pass over the token stream: dl and the per-term tfs come out of
      // the same doc-keyed aggregate, checkpointed so the downstream stats/
      // dfs/score consumers re-read doc-cardinality rows instead of
      // re-exploding the corpus once each (the first cut scanned the text
      // column four times; at 100 TB the explode IS the query's cost).
      val aggCols = count(lit(1)).as("dl") +: terms.map(t =>
        sum(when(col("word") === t, 1L).otherwise(0L)).as(s"tf_$t"))
      val perDoc = graft.ops.Checkpoints.tracked(
        words.groupBy("doc_id").agg(aggCols.head, aggCols.tail: _*))
      val stats = perDoc.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"))
      // mirror the oracle's tfs CTE: only docs containing >= 1 query term
      // are scored (a 0-tf doc scores 0 and must not pad a thin top-k)
      val tfs = perDoc.filter(terms.map(t => col(s"tf_$t") > 0).reduce(_ || _))
      val dfCols = terms.map(t =>
        sum(when(col(s"tf_$t") > 0, 1L).otherwise(0L)).as(s"df_$t"))
      val dfs = tfs.agg(dfCols.head, dfCols.tail: _*)
      // one parenthesization, mirrored token for token in the oracle:
      // idf(t) * ((tf*(k1+1)) / (tf + k1*((1-b) + b*(dl/(sum_dl/n_docs)))))
      def bm25(t: String) =
        log((col("n_docs") - col(s"df_$t") + lit(0.5)) / (col(s"df_$t") + lit(0.5)) + lit(1.0)) *
          ((col(s"tf_$t") * lit(2.2)) /
            (col(s"tf_$t") + lit(1.2) *
              (lit(0.25) + lit(0.75) * (col("dl") / (col("sum_dl") / col("n_docs"))))))
      tfs
        .crossJoin(broadcast(stats))
        .crossJoin(broadcast(dfs))
        .withColumn("score", bm25("hash") + bm25("join") + bm25("filter"))
        .orderBy(col("score").desc, col("doc_id"))
        .limit(20)
        .select(col("doc_id"), round(col("score"), 6).as("bm25"))
    }),

    // TX18: BM25 retrieval for a QUERY TABLE — the generalization round-12
    // asked for: tx17's per-term-column form caps the workload at a
    // compile-time term set, while real retrieval joins a (query_id, term)
    // table against the token stream (tx17 stays as the fixed-term fast
    // path). Shapes, scale-first:
    //   - ONE pass over the exploded corpus into (doc_id, word) counts —
    //     the inverted-index build (linear, one shuffle), checkpointed so
    //     dl / tf / df consumers re-read (doc x distinct-word)-cardinality
    //     rows instead of re-exploding the corpus each;
    //   - the query table, per-term dfs, and corpus stats are broadcasts
    //     (queries are human-authored — thousands, never corpus-scale);
    //   - per-query top-k via the bounded TopK aggregator (v5's shape):
    //     k rows per (query, partition) cross the wire, never a global
    //     window sort of every matching doc on one reducer.
    // Score determinism with a VARIABLE number of terms per query: the
    // tx17 fixed-parenthesization trick doesn't survive a fold over a
    // query-dependent term list (fp addition is order-sensitive), so each
    // per-term contribution — itself one fixed expression both engines
    // compute identically — is scaled to an integer (x 1e9, round) and the
    // per-(query, doc) score is an exact LONG sum: order-free, engine-free.
    // Magnitudes stay far below 2^53, so ranking on the long (desc, then
    // doc_id) and dividing back out for display are both exact.
    // (The operator itself is text.Retrieval.bm25TopK — this face binds it
    // to the fixture corpus and the tx18QueryTerms workload; RetrievalSpec
    // pins the operator against hand-computed scores and edge cases.)
    "tx18_bm25_query_table" -> ((s, d) => {
      import s.implicits._
      graft.text.Retrieval.bm25TopK(
        Tables.documents(s, d).repartition(s.sparkContext.defaultParallelism),
        tx18QueryTerms.toDF("query_id", "term"), k = 10)
    }),

    // JS1: JSONL round-trip — export the corpus as sharded JSONL
    // (sources.JsonlCorpus), re-read it FAILFAST with the explicit schema,
    // and return the re-read rows; the oracle reads the original parquet,
    // so a hash match proves the JSON codec is byte-lossless for every
    // value in the fixture (unicode text, embedded punctuation, nulls).
    // The export runs once per (session, fixture) via Standing.artifact —
    // concurrent Verify threads share one write.
    // CSV1: RFC-4180 CSV round-trip under deliberately hostile content —
    // the fixture text is too clean to prove anything (no quotes, commas,
    // or newlines), so the payload INJECTS all three per row before the
    // write. The oracle rebuilds the same payload from the parquet
    // original: only a correct quote/escape/multiline cycle hash-matches.
    // Scale trap (multiLine read = one task per file) pinned in
    // CsvCorpusSpec.
    "csv1_roundtrip" -> ((s, d) => {
      val gnarly = Tables.documents(s, d).select(col("doc_id"),
        concat(lit("say \""), col("lang"), lit("\", then,\n"), col("source"))
          .as("payload"),
        col("n_chars"))
      val dir = graft.sources.Standing.artifact(s, d, "csv1_export") {
        val t = graft.sources.JsonlCorpus.tempCorpusDir("graft-csv1")
        graft.sources.CsvCorpus.write(gnarly, t, shards = 4)
        t
      }
      graft.sources.CsvCorpus.readStrict(s, dir, gnarly.schema)
        .select(gnarly.columns.map(col): _*)
    }),

    "js1_jsonl_roundtrip" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val dir = graft.sources.Standing.artifact(s, d, "js1_jsonl") {
        val t = graft.sources.JsonlCorpus.tempCorpusDir("graft-js1")
        graft.sources.JsonlCorpus.write(docs, t, shards = 4)
        t
      }
      graft.sources.JsonlCorpus.readStrict(s, dir, docs.schema)
        .select(docs.columns.map(col): _*)
    }),

    // JS2: the COMPRESSED JSONL round-trip — corpora on disk are almost
    // always gzip JSONL, and gzip is the codec with the scale trap: it is
    // not line-splittable, so each shard is one read task forever (the
    // consequence is measured and pinned in JsonlCorpusSpec — gzip shard
    // = 1 partition regardless of split size, bzip2 shard still fans
    // out). This face proves the codec path is byte-lossless end-to-end
    // against the same parquet oracle as js1: same rows through
    // deflate + base64-free JSON escaping and back.
    "js2_jsonl_gzip_roundtrip" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val dir = graft.sources.Standing.artifact(s, d, "js2_jsonl_gz") {
        val t = graft.sources.JsonlCorpus.tempCorpusDir("graft-js2")
        graft.sources.JsonlCorpus.write(docs, t, shards = 4, codec = Some("gzip"))
        t
      }
      graft.sources.JsonlCorpus.readStrict(s, dir, docs.schema)
        .select(docs.columns.map(col): _*)
    }),

    // ORC1: the third interchange format next to JSONL (js1/js2) and CSV
    // (csv1) — ORC is the columnar one, so unlike the text codecs the
    // round-trip preserves types natively (no string re-parse) AND the
    // re-read scan keeps columnar virtues: splittable stripes, predicate
    // pushdown, column pruning (asserted in CsvCorpusSpec alongside the
    // text formats' partition-count pins). Same oracle as js1: transport
    // must be byte-lossless.
    "orc1_orc_roundtrip" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val dir = graft.sources.Standing.artifact(s, d, "orc1_export") {
        val t = graft.sources.JsonlCorpus.tempCorpusDir("graft-orc1")
        docs.repartition(4).write.mode("overwrite").orc(t)
        t
      }
      // inferred schema, deliberately: ORC files are self-describing, and
      // forcing docs.schema would let ORC's schema evolution silently
      // widen a degraded physical type back to the requested one — the
      // inferred read ATTESTS type fidelity instead of assuming it (a
      // type drop would surface as a dtype mismatch at the oracle gate)
      s.read.orc(dir)
        .select(docs.columns.map(col): _*)
    }),

    // ----- dedup -----
    // D1: exact dedup via hash-groupBy — one shuffle on the content hash.
    "d1_exact_dedup" -> ((s, d) =>
      Tables.documents(s, d)
        .groupBy(md5(col("text").cast("binary")).as("h"))
        .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_dups"))),

    // BF1: incremental exact dedup against a prior snapshot (yesterday's
    // crawl = docs with doc_id % 3 != 0), Bloom-prefiltered: definitely-new
    // rows skip the confirm join entirely, only the maybe-seen sliver
    // shuffles. The output is exactly `batch ANTI JOIN prior` on the
    // content hash (the oracle) — the Bloom filter moves cost, never rows.
    "bf1_bloom_incremental" -> ((s, d) => {
      val withH = Tables.documents(s, d)
        .withColumn("h", md5(col("text").cast("binary")))
      val prior = withH.filter(col("doc_id") % 3 =!= 0)
      Dedup.bloomNewRows(prior.select("h"), withH, "h")
        .select(col("doc_id"), col("lang"), col("n_chars"))
    }),

    // D2: MinHash signatures (8 portable hash functions over 3-gram shingles).
    "d2_minhash_signature" -> ((s, d) =>
      Dedup.withMinhashSig(shingled(s, d), "sh", "sig")
        .select(col("doc_id"), array_join(col("sig"), "|").as("sig"))),

    // D24: GROUP-level MinHash — the sketch is MERGEABLE (each component
    // is a min, and min is associative/commutative), so a group's
    // signature is the componentwise min of its members' signatures and
    // EQUALS the signature of the group's shingle union computed from
    // scratch. That is the property that matters at 100 TB: per-shard
    // signatures roll up map-side-combinably (one groupBy, no re-scan of
    // text) into per-source signatures, and source-vs-source similarity
    // (matching components / 8 — the standard MinHash Jaccard estimator)
    // costs |groups|² over 8-element sketches, never corpus². With many
    // groups the same LSH banding as d3 applies to the group signatures.
    // Answers "which sources overlap enough to cross-dedup first".
    // Plan note: the group minima are 8 PLAIN min(element_at) aggregates,
    // deliberately not posexplode + groupBy(source, pos) — a Generate over
    // the unmaterialized signature lineage makes Catalyst infer a
    // size(sig) > 0 filter whose predicate CONTAINS the full 8-way minhash
    // expression and pushes it into the scan, so the corpus md5 pass ran
    // 2x per join side (measured: 27 s vs 0.7 s at sf0.1). The wide
    // per-source frame (|sources| rows) is checkpointed so the self-join's
    // two sides read materialized rows instead of re-running the corpus
    // pass each, and only THEN unpivoted for the pos-keyed pair join.
    "d24_group_minhash" -> ((s, d) => {
      val sigs = Dedup.withMinhashSig(
        shingled(s, d, keyCol = "source"), "sh", "sig", num = minhashWidth)
      val mins = (0 until minhashWidth).map(j =>
        min(element_at(col("sig"), j + 1)).as(s"s$j"))
      val wide = graft.ops.Checkpoints.tracked(
        sigs.groupBy("source").agg(mins.head, mins.tail: _*))
      val long = wide.select(col("source"), posexplode(array(
          (0 until minhashWidth).map(j => col(s"s$j")): _*)))
        .toDF("source", "pos", "h")
      long.as("a").join(long.as("b"),
          col("a.pos") === col("b.pos") && col("a.source") < col("b.source"))
        .groupBy(col("a.source").as("src_a"), col("b.source").as("src_b"))
        .agg((sum(when(col("a.h") === col("b.h"), 1L).otherwise(0L))
          / minhashWidth.toDouble).as("jaccard_est"))
    }),

    // D3: LSH candidate pairs — docs agreeing on any of the 4 bands of 2
    // hashes each (r=2, b=4: S-curve centered near J≈0.5; see
    // Dedup.lshBandKeys). Banded equi-join replaces the quadratic cross-join.
    "d3_lsh_candidate_pairs" -> ((s, d) => {
      val sigs = Dedup.withMinhashSig(shingled(s, d), "sh", "sig").select("doc_id", "sig")
      Dedup.candidatePairs(Dedup.lshBandKeys(sigs, "doc_id", "sig"), "doc_id")
    }),

    // D3b: the SAME candidate generation, but from PERSISTED signatures —
    // the SCALE.md claim ("signatures would be persisted columns at
    // 100 TB") made executable: the band keys are written as a bucketed
    // catalog table keyed on band_key (Storage.replaceBucketed), so the
    // candidate bucket-aggregation reads the bucket layout with NO
    // exchange (plan-asserted in StorageSpec) and a re-run never repeats
    // the md5 signature pass. Oracle = d3's: layout must not change
    // results.
    "d3b_lsh_candidates_persisted" -> ((s, d) => {
      val sigs = Dedup.withMinhashSig(shingled(s, d), "sh", "sig").select("doc_id", "sig")
      graft.sources.Storage.replaceBucketed(
        Dedup.lshBandKeys(sigs, "doc_id", "sig"), "d3b_band_keys", "band_key", 8)
      // materialize=false: the input IS a persisted bucketed table — the
      // guard's size pass and the pair pass both read the bucket layout
      // exchange-free, and a checkpoint would throw that layout away.
      Dedup.candidatePairs(s.table("d3b_band_keys"), "doc_id", materialize = false)
    }),

    // D4: true n-gram Jaccard on a bounded id range (verification stage of
    // the MinHash pipeline; exact set semantics).
    "d4_ngram_jaccard" -> ((s, d) => {
      val t = shingled(s, d).filter(col("doc_id") < 60)
      val a = t.select(col("doc_id").as("a"), col("sh").as("sha"))
      val b = t.select(col("doc_id").as("b"), col("sh").as("shb"))
      a.crossJoin(b).filter(col("a") < col("b"))
        .select(col("a"), col("b"), Dedup.jaccard(col("sha"), col("shb")).as("jaccard"))
    }),

    // D17: LSH RECALL AUDIT — the dedup-family twin of v14's ANN recall
    // audit: what fraction of TRUE near-dup pairs (exact n-gram Jaccard >=
    // threshold) does the banded MinHash candidate generator (d3) actually
    // surface, at the three thresholds a dedup rollout tunes against. The
    // number that justifies (or indicts) the band/row configuration before
    // a 100 TB run commits to it.
    //
    // Ground truth WITHOUT corpus²: any pair with J > 0 shares at least one
    // shingle, so the complete truth set for every positive threshold is
    // exact Jaccard over the shingle-keyed equi-join's distinct pairs — the
    // tx15/df shape, never a cross join (fixture join volume: max shingle
    // df 7; a crawl's stop-shingle hot keys would route through the
    // Dedup.oversizedKeys guard before this audit ran). The audit itself is
    // one left join + three filtered aggregates over the checkpointed
    // truth frame.
    "d17_lsh_recall_audit" -> ((s, d) => {
      // the shingled frame has ONE consumer now that candidates read the
      // standing index (below) — checkpointing the exploded grams alone
      // replaces the former two-checkpoint chain
      val ex = graft.ops.Checkpoints.tracked(
        // per-doc dedup is row-local (array_distinct) — no distinct
        // shuffle; see the tx15 note
        shingled(s, d)
          .select(col("doc_id"), explode(array_distinct(col("sh"))).as("g")))
      // exact Jaccard as pure AGGREGATION, never per-pair array ops:
      // |A∩B| is the sharing join's group count, |A∪B| = |A|+|B|-|A∩B| from
      // per-doc distinct counts — the same integers the oracle's
      // list_intersect/list_distinct lengths produce, so the division is
      // bit-identical, at a fraction of the cost (first cut intersected
      // arrays per pair: 10.9s at sf0.1, the registry's most expensive row)
      val counts = ex.groupBy("doc_id").agg(count(lit(1)).as("nsh"))
      val truth = ex.as("l").join(ex.as("r"), "g")
        .filter(col("l.doc_id") < col("r.doc_id"))
        .groupBy(col("l.doc_id").as("a"), col("r.doc_id").as("b"))
        .agg(count(lit(1)).as("ninter"))
        .join(counts.select(col("doc_id").as("a"), col("nsh").as("na")), "a")
        .join(counts.select(col("doc_id").as("b"), col("nsh").as("nb")), "b")
        .select(col("a"), col("b"),
          (col("ninter").cast("double") /
            (col("na") + col("nb") - col("ninter"))).as("jaccard"))
      // candidates from the SHARED standing band-key index (the d15/d10
      // pattern — "one index, many consumers"): the generator under audit
      // is d3's banded MinHash, and the persisted index IS that
      // generator's output (identical deterministic values), so the audit
      // no longer re-runs the signature lineage it is not auditing
      val cand = Dedup.candidatePairs(bandKeyIndex(s, d), "doc_id",
        materialize = false)
      val f = graft.ops.Checkpoints.tracked(
        truth.join(cand.withColumn("hit", lit(1L)), Seq("a", "b"), "left")
          .select(col("jaccard"), coalesce(col("hit"), lit(0L)).as("hit")))
      def at(th: Double) = f.filter(col("jaccard") >= th)
        .agg(lit(th).as("threshold"), count(lit(1)).as("n_true"),
          sum(col("hit")).as("n_found"))
        .withColumn("recall",
          round(col("n_found").cast("double") / col("n_true"), 6))
      at(0.5).unionByName(at(0.7)).unionByName(at(0.9))
    }),

    // D18: LSH PRECISION AUDIT — d17's other axis: of the candidate pairs
    // the banded generator emits (= the pairs the verify stage must pay
    // exact Jaccard for), what fraction are true near-dups at each
    // threshold. Low precision means wasted verification compute at 100 TB;
    // d17's recall means missed dups — together they ARE the band/row
    // tuning curve. Every candidate doc has a shingle row (signatures come
    // FROM the shingled frame), so the set join is inner and a pure
    // signature collision simply scores J = 0.0 exactly.
    "d18_lsh_precision_audit" -> ((s, d) => {
      val t = shingled(s, d)
      // candidates from the shared standing band-key index (see d17)
      val cand = Dedup.candidatePairs(bandKeyIndex(s, d), "doc_id",
        materialize = false)
      val withSets = cand
        .join(t.select(col("doc_id").as("a"), col("sh").as("sha")), "a")
        .join(t.select(col("doc_id").as("b"), col("sh").as("shb")), "b")
      val f = graft.ops.Checkpoints.tracked(
        withSets.select(Dedup.jaccard(col("sha"), col("shb")).as("jaccard")))
      def at(th: Double) = f
        .agg(lit(th).as("threshold"), count(lit(1)).as("n_candidates"),
          sum(when(col("jaccard") >= th, 1L).otherwise(0L)).as("n_true"))
        .withColumn("precision",
          round(col("n_true").cast("double") / col("n_candidates"), 6))
      at(0.5).unionByName(at(0.7)).unionByName(at(0.9))
    }),

    // D19: d17's recall audit made CORPUS-SCALE-RUNNABLE (round-12 verdict
    // #1): d17's exact-Jaccard truth set is the repo's one superlinear
    // shape (its shingle-sharing pair count grows with duplication density
    // squared — 100x leg ratio 21, and a duplication-dense real crawl is
    // worse), so the production audit estimates recall from a SAMPLED
    // truth set instead. The sample is a fixed-COUNT anchor-doc set (the
    // v14 bounded-query-set posture; a fixed FRACTION would only scale the
    // superlinear term by a constant) picked in deterministic content-hash
    // order (the str1 rank-by-md5 pattern — both engines order the same hex
    // strings), and the sampled truth is every shingle-sharing pair whose
    // SMALLER-id endpoint is an anchor. Inclusion is decided by the md5 of
    // the min-id doc alone — independent of the pair's jaccard and of
    // whether LSH surfaces it — so per-threshold recall over the sample is
    // an unbiased estimate of d17's full-truth recall, at anchor-side cost:
    // |anchors| posting lists joined against the corpus shingle index
    // (linear in the corpus for fixed auditAnchors), never all pairs.
    // d17 keeps the full truth set unchanged — at fixture scale it is the
    // oracle this estimator is judged against.
    "d19_lsh_recall_sampled" -> ((s, d) => {
      val t = graft.ops.Checkpoints.tracked(shingled(s, d))
      val anchors = anchorDocs(t)
      // exact Jaccard as pure aggregation (the d17 form), over anchor-rooted
      // pairs only — the anchorTruth helper shared with d21/d22
      val truth = anchorTruth(t, anchors)
      // candidates from the shared standing band-key index (see d17) —
      // generation is still the production d3 generator, read from its
      // persisted output; restricted to the same anchor-rooted pairs the
      // truth set holds
      val cand = Dedup.candidatePairs(bandKeyIndex(s, d), "doc_id",
          materialize = false)
        .join(broadcast(anchors.withColumnRenamed("doc_id", "a")), "a")
      val f = graft.ops.Checkpoints.tracked(
        truth.join(cand.withColumn("hit", lit(1L)), Seq("a", "b"), "left")
          .select(col("jaccard"), coalesce(col("hit"), lit(0L)).as("hit")))
      def at(th: Double) = f.filter(col("jaccard") >= th)
        .agg(lit(th).as("threshold"), count(lit(1)).as("n_true"),
          sum(col("hit")).as("n_found"))
        .withColumn("recall",
          round(col("n_found").cast("double") / col("n_true"), 6))
      at(0.5).unionByName(at(0.7)).unionByName(at(0.9))
    }),

    // D20: the sampled face of d18's precision audit — exact-Jaccard
    // verification is paid only for candidate pairs whose smaller-id
    // endpoint is an anchor doc (same deterministic anchor set and the same
    // unbiasedness argument as d19: candidate membership and jaccard don't
    // depend on the min-id md5). d18's full-candidate face remains the
    // fixture-scale oracle; this is the audit a 100 TB run can afford —
    // candidate generation is the production path, the verify join is
    // |anchor-rooted candidates| instead of all candidates.
    "d20_lsh_precision_sampled" -> ((s, d) => {
      val t = shingled(s, d)
      val anchors = anchorDocs(t).withColumnRenamed("doc_id", "a")
      // candidates from the shared standing band-key index (see d17)
      val cand = Dedup.candidatePairs(bandKeyIndex(s, d), "doc_id",
          materialize = false)
        .join(broadcast(anchors), "a")
      val withSets = cand
        .join(t.select(col("doc_id").as("a"), col("sh").as("sha")), "a")
        .join(t.select(col("doc_id").as("b"), col("sh").as("shb")), "b")
      val f = graft.ops.Checkpoints.tracked(
        withSets.select(Dedup.jaccard(col("sha"), col("shb")).as("jaccard")))
      def at(th: Double) = f
        .agg(lit(th).as("threshold"), count(lit(1)).as("n_candidates"),
          sum(when(col("jaccard") >= th, 1L).otherwise(0L)).as("n_true"))
        .withColumn("precision",
          round(col("n_true").cast("double") / col("n_candidates"), 6))
      at(0.5).unionByName(at(0.7)).unionByName(at(0.9))
    }),

    // D21: the sampled audit's STATISTICAL POWER face (round-13 verdict
    // stretch #8) — d19 reports one pooled recall per threshold, but a
    // rollout tuning anchor COUNT needs to know how much precision each
    // anchor buys. The 120 anchors split into anchorStrataK interleaved
    // md5-rank strata (each stratum is itself an unbiased md5-ordered
    // sample, so the strata are 3 independent 40-anchor audits); per
    // threshold the query reports the pooled estimate plus the mean and
    // standard error ACROSS strata — se at 40 anchors, and se/sqrt(k)
    // scaling tells you the anchor budget for a target confidence.
    // Same linear anchor-rooted shapes as d19 (the strata ride the same
    // 120-row broadcast); per-stratum recalls are exact integer ratios in
    // both engines, and the cross-stratum mean/se aggregate 3 values.
    "d21_lsh_recall_variance" -> ((s, d) => {
      val t = graft.ops.Checkpoints.tracked(shingled(s, d))
      val anchors = anchorStrata(t)
      val truth = anchorTruth(t, anchors.select("doc_id"))
      // candidates from the shared standing band-key index (see d17)
      val cand = Dedup.candidatePairs(bandKeyIndex(s, d), "doc_id",
          materialize = false)
        .join(broadcast(anchors.select(col("doc_id").as("a"))), "a")
      val f = graft.ops.Checkpoints.tracked(
        truth.join(cand.withColumn("hit", lit(1L)), Seq("a", "b"), "left")
          .join(broadcast(anchors.withColumnRenamed("doc_id", "a")), "a")
          .select(col("jaccard"), coalesce(col("hit"), lit(0L)).as("hit"),
            col("stratum")))
      def at(th: Double) = {
        val per = f.filter(col("jaccard") >= th)
          .groupBy("stratum")
          .agg(count(lit(1)).as("n_true"), sum("hit").as("n_found"))
          .select(col("n_true"), col("n_found"),
            (col("n_found").cast("double") / col("n_true")).as("recall"))
        per.agg(lit(th).as("threshold"), count(lit(1)).as("n_strata"),
          round(sum("n_found").cast("double") / sum("n_true"), 6).as("pooled_recall"),
          round(avg("recall"), 6).as("mean_recall"),
          // guarded: stddev_samp of a single value is NaN in Spark but
          // NULL in DuckDB — both sides emit NULL below 2 strata
          when(count(lit(1)) > 1,
            round(stddev_samp(col("recall")) /
              sqrt(count(lit(1)).cast("double")), 6)).as("se_recall"))
      }
      at(0.5).unionByName(at(0.7)).unionByName(at(0.9))
    }),

    // D22: the BAND/ROW TUNING CURVE measured — the stratified sampled
    // recall audit (d21's machinery) run at TWO bandings of the same
    // 8-hash signature: the production 4 bands x 2 rows (S-curve
    // 1-(1-J²)⁴, centered near J≈0.5) and the coarser 2 bands x 4 rows
    // (1-(1-J⁴)², centered near J≈0.8). The fixture's true-pair Jaccard
    // distribution is bimodal (a mass at J≈0 from single shared shingles,
    // a handful at J≈1 — measured via the truth CTE), so at the tuned
    // thresholds BOTH configs recall 1.0; the curve's measurable point is
    // BELOW the knee: threshold 0.05 admits the fixture's J≈0.1 pairs,
    // which the bandings suppress by design (p≈0.04 for b4r2, ≈2e-4 for
    // b2r4 at J=0.1) — recall there is sub-1 with a real cross-stratum
    // spread, and the config DIFFERENCE is the selectivity a rollout
    // trades against verify-join volume. Truth set and anchors are
    // config-independent and computed once; only candidate generation
    // differs per config.
    "d22_lsh_tuning_curve" -> ((s, d) => {
      val t = graft.ops.Checkpoints.tracked(shingled(s, d))
      val anchors = anchorStrata(t)
      // checkpointed: both band configs consume the same truth set
      val truth = graft.ops.Checkpoints.tracked(
        anchorTruth(t, anchors.select("doc_id")))
      val sigs = Dedup.withMinhashSig(t, "sh", "sig").select("doc_id", "sig")
      def face(label: String, rowsPerBand: Int, numBands: Int) = {
        // the production banding (2x4) IS the standing index's contents —
        // read it there (see d17); only the counterfactual 4x2 banding
        // re-derives band keys from the signatures
        val bk =
          if (rowsPerBand == 2 && numBands == 4) bandKeyIndex(s, d)
          else Dedup.lshBandKeys(sigs, "doc_id", "sig", rowsPerBand, numBands)
        val cand = Dedup.candidatePairs(bk, "doc_id",
            materialize = rowsPerBand != 2 || numBands != 4)
          .join(broadcast(anchors.select(col("doc_id").as("a"))), "a")
        val f = graft.ops.Checkpoints.tracked(
          truth.join(cand.withColumn("hit", lit(1L)), Seq("a", "b"), "left")
            .join(broadcast(anchors.withColumnRenamed("doc_id", "a")), "a")
            .select(col("jaccard"), coalesce(col("hit"), lit(0L)).as("hit"),
              col("stratum")))
        def at(th: Double) = {
          val per = f.filter(col("jaccard") >= th)
            .groupBy("stratum")
            .agg(count(lit(1)).as("n_true"), sum("hit").as("n_found"))
            .select(col("n_true"), col("n_found"),
              (col("n_found").cast("double") / col("n_true")).as("recall"))
          per.agg(lit(label).as("config"), lit(th).as("threshold"),
            count(lit(1)).as("n_strata"),
            round(sum("n_found").cast("double") / sum("n_true"), 6).as("pooled_recall"),
            round(avg("recall"), 6).as("mean_recall"),
            when(count(lit(1)) > 1,
              round(stddev_samp(col("recall")) /
                sqrt(count(lit(1)).cast("double")), 6)).as("se_recall"))
        }
        at(0.05).unionByName(at(0.5)).unionByName(at(0.9))
      }
      face("b4r2", rowsPerBand = 2, numBands = 4)
        .unionByName(face("b2r4", rowsPerBand = 4, numBands = 2))
    }),

    // D6: dedup cluster resolution — connected components over the LSH
    // candidate pairs (transitive duplicates collapse to min-id clusters).
    // INTENTIONALLY on plain min-label propagation, not the auto-router:
    // d6 is the ORACLE face for the clustering itself — it pins the
    // reference algorithm the routed faces (d7/d10/d12/d13/spl2/v8/sd1/
    // pipeline_corpus) must stay result-identical to, so it must not share
    // the router's re-route machinery it exists to check.
    "d6_dedup_clusters" -> ((s, d) => {
      val sigs = Dedup.withMinhashSig(shingled(s, d), "sh", "sig").select("doc_id", "sig")
      val pairs = Dedup.candidatePairs(Dedup.lshBandKeys(sigs, "doc_id", "sig"), "doc_id")
      Dedup.connectedComponents(pairs)
    }),

    // D7: the dedup pipeline's final answer — the surviving corpus. A doc
    // survives unless cluster resolution assigned it a smaller-id duplicate.
    "d7_dedup_survivors" -> ((s, d) => {
      val sigs = Dedup.withMinhashSig(shingled(s, d), "sh", "sig").select("doc_id", "sig")
      val pairs = Dedup.candidatePairs(Dedup.lshBandKeys(sigs, "doc_id", "sig"), "doc_id")
      // the ADAPTIVE resolver (min-label with the star re-route): the
      // production face inherits the O(log) bound on chain-shaped
      // components; either route yields min-id labels, so the oracle's
      // full-rebuild CC holds unchanged
      val dropped = Dedup.connectedComponentsAuto(pairs)
        .filter(col("cluster") =!= col("doc_id"))
        .select("doc_id")
      Tables.documents(s, d).select("doc_id")
        .join(dropped, Seq("doc_id"), "left_anti")
    }),

    // D12: the INCREMENTAL dedup operator's registry face — survivors
    // derived from StreamingDedup.candidatePairsStream (the per-band-key
    // flatMapGroupsWithState pair generator), run here in batch mode (the
    // st1–st5 precedent: same graph, batch face for the oracle; true
    // cross-micro-batch incrementality is proven in StreamingSpec against
    // d3/d7). Oracle = d7's: the stateful route must be indistinguishable
    // from the batch pipeline.
    "d12_survivors_incremental" -> ((s, d) => {
      val sigs = Dedup.withMinhashSig(shingled(s, d), "sh", "sig").select("doc_id", "sig")
      val pairs = graft.streaming.StreamingDedup
        .candidatePairsStream(Dedup.lshBandKeys(sigs, "doc_id", "sig"))
        .toDF("a", "b").distinct()
      val dropped = Dedup.connectedComponentsAuto(pairs)
        .filter(col("cluster") =!= col("doc_id"))
        .select("doc_id")
      Tables.documents(s, d).select("doc_id")
        .join(dropped, Seq("doc_id"), "left_anti")
    }),

    // D13: INCREMENTAL cluster maintenance — the cdc3/cdc6 touched-key
    // pattern applied to dedup clusters. A new batch of docs (doc_id % 10
    // == 0 here) arrives against an EXISTING clustering: new candidate
    // pairs come from probing the standing band-key buckets (an equi-join,
    // the d12 state shape — never an old-corpus rescan); the pairs touch a
    // set of existing components; connected components reruns ONLY over
    // those components' edges ∪ the new pairs, and every untouched label
    // is carried verbatim through a left-anti join (plan-asserted in
    // RegistryPlanSpec). The ORACLE is d6's full-rebuild CC over the whole
    // corpus, so the hash match proves apply(labels, newDocs) ≡
    // recompute(allDocs) — including cross-component merges a new doc
    // causes.
    "d13_clusters_incremental" -> ((s, d) => {
      val isNew = col("doc_id") % 10 === 0
      // The STANDING clustering — the old corpus's band keys, candidate
      // pairs, and component labels — is what a production maintainer has
      // on disk when an arrival batch lands; it is built once per
      // (session, fixture) and pinned via eager localCheckpoint, so each
      // invocation pays only the incremental path: shingle+MinHash the
      // arrivals, probe the standing buckets, relabel touched components.
      // (Before this split, every invocation re-ran the full-corpus
      // shingle+MinHash+CC rebuild — the exact cost the operator exists to
      // avoid.)
      val (bandsOld, oldPairs, labelsOld) =
        graft.sources.Standing.artifact(s, d, "d13_standing") {
          val sigsOld = Dedup
            .withMinhashSig(shingled(s, d).filter(!isNew), "sh", "sig")
            .select("doc_id", "sig")
          val b = Dedup.lshBandKeys(sigsOld, "doc_id", "sig").localCheckpoint()
          val p = Dedup.candidatePairs(b, "doc_id").localCheckpoint()
          val l = Dedup.connectedComponents(p).localCheckpoint()
          (b, p, l)
        }
      // Arrival-batch band keys feed both sides of the probe join below —
      // checkpoint so shingle+MinHash over the arrivals runs once.
      val bandsNew = Dedup
        .withMinhashSig(shingled(s, d).filter(isNew), "sh", "sig")
        .select("doc_id", "sig")
        .transform(Dedup.lshBandKeys(_, "doc_id", "sig"))
        .trackedCheckpoint()
      val r = incrementalRelabel(bandsOld.unionByName(bandsNew), bandsNew,
        oldPairs, labelsOld)
      labelsOld.join(r.touchedComps, Seq("cluster"), "left_anti")
        .select("doc_id", "cluster")
        .unionByName(r.relabeled)
    }),

    // CC1: the corpus CARD — the per-(lang, source) profile table a
    // dataset release ships: doc/token volumes, mean length, and the
    // exact-dup rate (docs whose content hash repeats corpus-wide). One
    // content-hash window + one keyed aggregation; every stat is
    // slice-local so the 100 TB form is the same two exchanges.
    "cc1_corpus_card" -> ((s, d) => {
      val w = org.apache.spark.sql.expressions.Window.partitionBy(col("h"))
      Tables.documents(s, d)
        .select(col("doc_id"), col("lang"), col("source"),
          graft.text.TextAnalysis.tokenCountWs(col("text")).as("n_tok"),
          md5(col("text").cast("binary")).as("h"))
        .withColumn("dup", when(count(lit(1)).over(w) > 1, 1L).otherwise(0L))
        .groupBy("lang", "source")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tok")).as("total_tok"),
          round(avg(col("n_tok")), 2).as("avg_tok"),
          sum(col("dup")).as("n_dup_docs"))
    }),

    // D15: CONTAINMENT detection over LSH candidates — the asymmetric
    // near-dup Jaccard misses: a short doc embedded verbatim in a long one
    // has low Jaccard (|∩|/|∪| shrinks with the size gap) but containment
    // |∩|/min(|A|,|B|) ≈ 1. Quote-chains, boilerplate-wrapped reposts, and
    // excerpt pages are exactly this shape. Candidates come from the SAME
    // d3 LSH generator (equi-join on band key — never corpus²); the
    // intersection is counted by joining each pair side to the candidate
    // docs' distinct shingles on (doc, shingle) — pair-bounded work, and
    // the shingle explode is semi-join-restricted to candidate docs.
    "d15_containment" -> ((s, d) => {
      // candidates come from the SHARED band-key index (bandKeyIndex) —
      // "one index, many consumers": d15 was rebuilding the full MinHash
      // lineage that d3b already demonstrates persisting; reading the
      // Standing bucketed table cuts the query's dominant cost to the
      // pair expansion + containment joins. materialize=false: both the
      // guard's size pass and the pair pass read the bucket layout
      // exchange-free (the d3b contract).
      val pairs = Dedup
        .candidatePairs(bandKeyIndex(s, d), "doc_id", materialize = false)
        .trackedCheckpoint()
      val cand = pairs.select(col("a").as("doc_id"))
        .unionByName(pairs.select(col("b").as("doc_id"))).distinct()
      val sh = shingled(s, d)
        // per-doc dedup is row-local (array_distinct) — no distinct
        // shuffle; see the tx15 note
        .select(col("doc_id"), explode(array_distinct(col("sh"))).as("g"))
        .join(cand, Seq("doc_id"), "left_semi")
        .trackedCheckpoint()
      val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
      pairs
        .join(sh.select(col("doc_id").as("a"), col("g")), "a")
        .join(sh.select(col("doc_id").as("b"), col("g")), Seq("b", "g"))
        .groupBy("a", "b").agg(count(lit(1)).as("n_common"))
        .join(sizes.select(col("doc_id").as("a"), col("n").as("n_a")), "a")
        .join(sizes.select(col("doc_id").as("b"), col("n").as("n_b")), "b")
        .select(col("a"), col("b"), col("n_common"),
          round(col("n_common").cast("double") / least(col("n_a"), col("n_b")), 6)
            .as("containment"))
    }),

    // D16: CHUNK-LEVEL exact dedup — the C4/CCNet line-level step in
    // word-window form (fixture text has no line structure): every doc
    // splits into consecutive 8-word chunks, chunks dedup EXACTLY by md5
    // with first-occurrence-wins order (doc_id, chunk_idx), and the output
    // is each doc's duplicated-chunk profile — the signal the pipeline
    // uses to strip boilerplate shared across pages without dropping whole
    // documents (d1-d15 dedup DOCS; this dedups WITHIN them). Scale shape:
    // one explode pass, then FIRST-OCCURRENCE VIA MIN-STRUCT AGGREGATION,
    // not a hash-partitioned window: min(struct(doc_id, chunk_idx)) per
    // chunk hash combines MAP-SIDE with a constant buffer, so a
    // boilerplate chunk shared by millions of docs costs one tiny
    // aggregate, where a window would sort the whole multi-million-row
    // hash group inside one task (the skew the dedup star guards exist
    // for). Two keyed exchanges (agg + join-back), both corpus-linear,
    // nothing pairwise. The oracle replays the same first-occurrence
    // order with a window — semantics identical, physical route free.
    "d16_chunk_dedup" -> ((s, d) => {
      val chunks = Tables.documents(s, d)
        .repartition(s.sparkContext.defaultParallelism)
        .select(col("doc_id"), split(col("text"), " ").as("w"))
        .select(col("doc_id"), posexplode(
          transform(sequence(lit(0), ((size(col("w")) - 1) / 8).cast("int")),
            i => concat_ws(" ", slice(col("w"), i * 8 + 1, lit(8)))))
          .as(Seq("chunk_idx", "chunk")))
        .withColumn("h", md5(col("chunk").cast("binary")))
        // both the first-occurrence aggregate and the join probe side read
        // this — checkpoint so the corpus-wide explode+md5 runs once, not
        // once per consumer (the d15/sd1 convention)
        .select(col("doc_id"), col("chunk_idx"), col("h"))
        .trackedCheckpoint()
      val firsts = chunks.groupBy("h")
        .agg(min(struct(col("doc_id"), col("chunk_idx"))).as("f"))
      chunks.join(firsts, "h")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_chunks"),
          sum(when(col("f.doc_id") =!= col("doc_id") ||
              col("f.chunk_idx") =!= col("chunk_idx"), 1L).otherwise(0L))
            .as("n_dup_chunks"))
    }),

    // D23: EXACT SUBSTRING SPANS — the one headline dedup modality d1–d16
    // don't cover: Lee et al. 2021's ExactSubstr (arXiv:2107.06499), which
    // removes VERBATIM token spans (>= minSpan tokens) repeated from earlier
    // docs — finer than doc-level near-dup (d2/d3), sliding where d16's
    // chunk grid is disjoint (a span straddling a chunk boundary is
    // invisible to d16). Design + scale shape in Dedup.substringSpans: the
    // paper's corpus-wide suffix array is single-machine; the distributed
    // form is k-gram ownership (min-owner aggregate, the d16/tx15 shape) +
    // per-doc gaps-and-islands — corpus-linear, nothing pairwise. Output:
    // one row per maximal duplicated span (doc_id, start_pos, span_len).
    "d23_substring_spans" -> ((s, d) =>
      Dedup.substringSpans(Tables.documents(s, d)
        .repartition(s.sparkContext.defaultParallelism))),

    // D14: cluster resolution by large-star/small-star contraction — the
    // O(log n)-round CC (Kiveris et al., SoCC'14) next to d6's O(diameter)
    // min-label propagation. Near-dup clusters are usually shallow (d6's
    // sweet spot); chain-shaped components (template corpora where doc i
    // pairs only with doc i±1) make propagation's round count linear in
    // corpus size, while star contraction halves depth every round pair.
    // Same pairs, same contract; oracle = d6's full-rebuild CC, so the
    // hash match proves the two algorithms agree on every cluster.
    "d14_cc_largestar" -> ((s, d) => {
      // shared band-key index (see d15) — the algorithm under test here is
      // the star contraction, not the signature pass
      val pairs = Dedup.candidatePairs(bandKeyIndex(s, d), "doc_id",
        materialize = false)
      Dedup.connectedComponentsStar(pairs)
    }),

    // SP1: SEQUENCE PACKING — assign documents to fixed-capacity training
    // context windows (cap tokens), the batch-construction step every LLM
    // trainer runs over the final corpus. Packing is inherently sequential,
    // so the scalable form shards first (the shard key is the packing
    // parallelism knob — production sets it to the writer task count) and
    // packs WITHIN each shard by running-token-count: a doc starting before
    // a capacity boundary stays in that bin (bounded overflow: a bin
    // overruns by at most max_doc_tokens − 1; per-doc counts are capped at
    // cap so no single doc exceeds a window). One window + one keyed agg —
    // no iteration, no driver loop, shards pack in parallel.
    "sp1_sequence_packing" -> ((s, d) =>
      packSequences(Tables.documents(s, d), cap = 512L, nShards = sp1Shards)),

    // SP2: LENGTH-BUCKETED BATCHING — the padding-minimization half of
    // batch construction: where sp1 CONCATENATES docs into fixed windows,
    // dynamic batching GROUPS similar-length docs into fixed-size batches
    // so each batch pads only to ITS max length, not the corpus max
    // (padding waste is compute burned on pad tokens). Docs bucket by
    // log2 length (power-of-two buckets — the standard bucketing ladder),
    // batch within (bucket, shard) in doc_id order via a running count,
    // and each batch reports its padding waste: n_docs·max_len − Σ len.
    // One window partitioned by (bucket, shard) + one keyed agg — same
    // parallel shape as sp1, nothing global.
    "sp2_length_bucketed_batches" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val batchSize = sp2BatchSize
      val docs = Tables.documents(s, d).select(
        col("doc_id"),
        graft.text.TextAnalysis.tokenCountWs(col("text")).as("n_tok"))
        // binary-length bucket (= floor(log2)+1) — INTEGER-exact in both
        // engines; a float log2 can straddle floor() at exact powers of 2
        .withColumn("bucket", length(bin(col("n_tok"))).cast("bigint"))
        .withColumn("shard", (col("doc_id") % sp1Shards).as("shard"))
      val w = Window.partitionBy("bucket", "shard").orderBy("doc_id")
      docs.withColumn("batch",
          floor((row_number().over(w) - 1) / batchSize).cast("bigint"))
        .groupBy("bucket", "shard", "batch")
        .agg(count(lit(1)).as("n_docs"),
          max(col("n_tok")).as("max_len"),
          sum(col("n_tok")).as("tok_sum"),
          (count(lit(1)) * max(col("n_tok")) - sum(col("n_tok"))).as("pad_waste"))
    }),

    // TX15: N-GRAM NOVELTY — per document, the fraction of its distinct
    // 3-gram shingles not seen in any EARLIER document (doc_id order): the
    // corpus-freshness score used to down-weight boilerplate and measure
    // how much new text a crawl snapshot actually adds. First-seen owner =
    // min(doc_id) per shingle — one shingle-keyed aggregation + one
    // equi-join back, the tf-idf df shape (the 100 TB posture: the join is
    // keyed on the shingle, never a cross-join).
    "tx15_ngram_novelty" -> ((s, d) => {
      // first-seen owner via checkpoint + map-side-combining min aggregate
      // + join-back (the d16/d23 shape). This replaced the round-11
      // window-min form in round 14 (measured at sf0.1: 5.3 s -> 1.6 s
      // warm): the window executed the shingle pipeline once but needed a
      // corpus-wide distinct SHUFFLE plus WindowExec's sort of every
      // (doc_id, g) row; the owner aggregate combines map-side instead
      // (the d16 skew argument: a boilerplate shingle costs one buffer,
      // not a sorted million-row hash group).
      // "distinct (doc_id, g)" is a PER-DOC property — array_distinct
      // dedups inside the row before exploding, so the corpus never pays
      // a distinct shuffle at all (the old form exchanged every exploded
      // row just to dedup within documents)
      val e = shingled(s, d)
        .select(col("doc_id"), explode(array_distinct(col("sh"))).as("g"))
        .trackedCheckpoint()
      val owners = e.groupBy("g").agg(min(col("doc_id")).as("first_doc"))
      e.join(owners, "g")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_shingles"),
          sum(when(col("first_doc") === col("doc_id"), 1L).otherwise(0L)).as("n_novel"))
        .withColumn("novelty",
          round(col("n_novel").cast("double") / col("n_shingles"), 6))
    }),

    // D5: 60-bit SimHash per document (native expression; the declarative
    // Dedup.simhash is the executable spec, parity-tested in NorthStarSpec).
    "d5_simhash" -> ((s, d) => {
      graft.functions.SimHash.register(s)
      Tables.documents(s, d)
        .repartition(s.sparkContext.defaultParallelism)
        .select(col("doc_id"), split(col("text"), " ").as("w"))
        .select(col("doc_id"), graft.functions.SimHash.simhash(col("w")).as("simhash"))
    }),

    // CH1: overlapping document chunking — the LLM context-window prep step
    // (chunk 40 words, stride 30, 10-word overlap). Pure per-row explode:
    // shuffle-free, and the chunk count per doc is closed-form so both
    // engines enumerate identical windows.
    "ch1_doc_chunks" -> ((s, d) => {
      val chunk = 40
      val step = 30
      val overlap = chunk - step
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), split(col("text"), " ").as("w"))
      val starts = sequence(
        lit(0), greatest(size(col("w")) - overlap - 1, lit(0)), lit(step))
      docs.select(col("doc_id"), col("w"), posexplode(starts).as(Seq("chunk_idx", "start")))
        .select(col("doc_id"), col("chunk_idx").cast("bigint").as("chunk_idx"),
          array_join(slice(col("w"), col("start") + 1, lit(chunk)), " ").as("chunk_text"),
          least(size(col("w")) - col("start"), lit(chunk)).cast("bigint").as("n_words"))
    }),

    // D8: SimHash band candidates + exact Hamming verify — one pass, no
    // signature rejoin; exact (no false negatives) for hamming <= 3.
    "d8_simhash_candidates" -> ((s, d) => {
      graft.functions.SimHash.register(s)
      val sigs = Tables.documents(s, d)
        .repartition(s.sparkContext.defaultParallelism)
        .select(col("doc_id"),
          graft.functions.SimHash.simhash(split(col("text"), " ")).as("sh"))
      Dedup.simhashCandidates(sigs, "doc_id", "sh", maxHamming = 3)
    }),

    // D9: LSH candidates with the signature-only Jaccard ESTIMATE (matching
    // minima / 8) — the sketch verify stage that never rereads raw text.
    "d9_minhash_jaccard_est" -> ((s, d) => {
      val sigs = Dedup.withMinhashSig(shingled(s, d), "sh", "sig").select("doc_id", "sig")
      Dedup.candidatePairsWithEstimate(sigs, "doc_id", "sig")
    }),

    // TX5: winnowing fingerprint — per 4-shingle window keep the minimum
    // k-gram hash; the distinct minima are the document's fingerprint set
    // (rolling-window selection over content hashes, as in MOSS winnowing).
    // Native one-pass expression; the declarative slice/array_min form it
    // replaced is pinned by the same DuckDB oracle.
    "tx5_winnow_fingerprint" -> ((s, d) => {
      graft.functions.Winnow.register(s)
      Tables.documents(s, d)
        .repartition(s.sparkContext.defaultParallelism)
        .select(col("doc_id"), split(col("text"), " ").as("w"))
        .filter(size(col("w")) >= 6) // >= 4 three-word shingles
        .select(col("doc_id"), graft.functions.Winnow.winnow(col("w"), 3, 4).as("fp"))
    }),

    // TX6: token-length histogram — fixed-width buckets over the corpus
    // (the "what does my data look like" op every pipeline runs first).
    "tx6_length_histogram" -> ((s, d) =>
      Tables.documents(s, d)
        .select((floor(TextAnalysis.tokenCountWs(col("text")) / 10) * 10).as("bucket_lo"))
        .groupBy("bucket_lo").agg(count(lit(1)).as("n_docs"))),

    // TX7: language-stratified deterministic sampling — keep a per-language
    // fraction using a content-hash threshold, so the sample is stable
    // across runs/executors (no RNG) and oracle-checkable. Fractions: en
    // heavily downsampled, others kept — the balancing move of multilingual
    // corpus construction.
    "tx7_stratified_sample" -> ((s, d) => {
      // 60-bit md5 bucket: portable across engines (Spark hash() is not).
      val bucket = conv(substring(md5(col("text").cast("binary")), 1, 15), 16, 10)
        .cast("bigint") % 100
      val keepPct = when(col("lang") === "en", 25).otherwise(75)
      Tables.documents(s, d)
        .filter(bucket < keepPct)
        .select("doc_id", "lang")
    }),

    // TX8: per-language top-3 bigrams — the n-gram frequency profile used
    // for corpus inspection and as language-model features. Explode word
    // bigrams, count per (lang, bigram), rank within language.
    "tx8_bigram_profile" -> ((s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("lang")).orderBy(col("n").desc, col("bigram").asc)
      Tables.documents(s, d)
        .select(col("lang"), split(col("text"), " ").as("words"))
        .filter(size(col("words")) >= 2)
        // explode_outer + null filter: see d11 — plain explode re-inlines
        // the shingle lambda into an inferred pre-Generate filter
        .select(col("lang"), explode_outer(Dedup.shingles(col("words"), 2)).as("bigram"))
        .filter(col("bigram").isNotNull)
        .groupBy("lang", "bigram").agg(count(lit(1)).as("n"))
        .withColumn("rank", row_number().over(w).cast("bigint"))
        .filter(col("rank") <= 3)
    }),

    // TX10: corpus-statistics quality score — each doc's mean log-likelihood
    // of its bigrams under the whole-corpus bigram distribution (fluency
    // scoring with corpus stats, the n-gram-LM flavor of quality filtering).
    // Shape: per-doc bigrams ⋈ the profile on bigram, ⋈ one broadcast
    // scalar total. The profile join is deliberately UNHINTED: natural
    // corpora have bounded vocab (AQE broadcasts it), but synthetic/random
    // text makes the profile corpus-sized — forcing a broadcast there
    // measured 2x slower than the shuffled join AQE picks.
    // TX16: per-doc TOKEN ENTROPY — the vocabulary-diversity quality
    // signal (low-entropy docs are keyword stuffing / boilerplate / tag
    // soup even when length and stopword gates pass; the composite
    // quality filters of published pretraining pipelines all carry one).
    // Shape: tx9's two keyed aggregations (per-(doc, word) counts, then a
    // doc-keyed entropy fold) — nothing corpus-quadratic; the sum of
    // p·ln p folds doubles, so it rounds to 6dp like tx10's avg ln.
    "tx16_token_entropy" -> ((s, d) => {
      val words = Tables.documents(s, d)
        .repartition(s.sparkContext.defaultParallelism)
        .select(col("doc_id"),
          explode(split(lower(trim(col("text"))), "\\s+")).as("w"))
        .filter(col("w") =!= "")
      val wc = words.groupBy("doc_id", "w").agg(count(lit(1)).as("c"))
      val tot = wc.groupBy("doc_id")
        .agg(sum(col("c")).as("n"), count(lit(1)).as("n_distinct"))
      wc.join(tot, "doc_id")
        .groupBy("doc_id")
        .agg(
          max(col("n")).as("n_tokens"),
          max(col("n_distinct")).as("n_distinct"),
          round(-sum((col("c").cast("double") / col("n")) *
            log(col("c").cast("double") / col("n"))), 6).as("entropy_nats"))
    }),

    "tx10_bigram_loglik" -> ((s, d) => {
      val bigrams = Tables.documents(s, d)
        .repartition(s.sparkContext.defaultParallelism)
        .select(col("doc_id"), split(col("text"), " ").as("words"))
        .filter(size(col("words")) >= 2)
        // explode_outer + null filter: see d11
        .select(col("doc_id"), explode_outer(Dedup.shingles(col("words"), 2)).as("bigram"))
        .filter(col("bigram").isNotNull)
      val profile = bigrams.groupBy("bigram").agg(count(lit(1)).as("n"))
      val total = profile.agg(sum(col("n")).as("total"))
      bigrams.join(profile, "bigram")
        .crossJoin(broadcast(total))
        .withColumn("ll", log(col("n").cast("double") / col("total").cast("double")))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_bigrams"), round(avg(col("ll")), 6).as("avg_ll"))
    }),

    // D10: best-member survivor policy — instead of d7's min-id rule, each
    // dedup cluster keeps its LONGEST document (quality-aware survivorship),
    // tie-broken by id. One window over the cluster assignment.
    "d10_dedup_best_survivor" -> ((s, d) => {
      // shared band-key index (see d15) — d10's subject is the survivor
      // POLICY, not the signature pass
      val pairs = Dedup.candidatePairs(bandKeyIndex(s, d), "doc_id",
        materialize = false)
      // production face: the adaptive resolver (min-label with the star
      // re-route) — result-identical to d6's plain propagation (CcRouteSpec),
      // O(log n) on chain-shaped components
      val clusters = Dedup.connectedComponentsAuto(pairs)
      val docs = Tables.documents(s, d).select(col("doc_id"), col("n_chars"))
      val labeled = docs.join(clusters, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_chars"),
          coalesce(col("cluster"), col("doc_id")).as("cluster"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("cluster").orderBy(col("n_chars").desc, col("doc_id").asc)
      labeled.withColumn("r", row_number().over(w))
        .filter(col("r") === 1)
        .select(col("doc_id"), col("cluster"), col("n_chars"))
    }),

    // D25: GOLDEN RECORD — field-level survivorship, the merge policy
    // next to d10's row-level pick: instead of electing one member row
    // per duplicate cluster, each FIELD takes its own best value
    // (completeness-max text with a deterministic tiebreak, max n_chars,
    // the union of provenance). This is what an entity-resolution
    // pipeline actually ships downstream; rides the same shared band-key
    // index + auto-routed components as d6/d10 (already scale-audited),
    // so the merge itself is ONE keyed groupBy over the labeled corpus.
    "d25_golden_record" -> ((s, d) => {
      val pairs = Dedup.candidatePairs(bandKeyIndex(s, d), "doc_id",
        materialize = false)
      val clusters = Dedup.connectedComponentsAuto(pairs)
      goldenMerge(Tables.documents(s, d), clusters)
    }),

    // D25B: INCREMENTAL golden-record maintenance — the survivorship face a
    // production ER pipeline actually re-runs per arrival batch. The d13
    // recipe applied to d25's merge: standing state = the old corpus's
    // pairs, labels, and GOLDEN RECORDS; an arrival batch probes the
    // standing band-key buckets for new candidate pairs, the pairs touch a
    // set of standing clusters, and ONLY those clusters' records are
    // re-merged (from their member docs ∪ the arrivals) — every untouched
    // golden record is carried verbatim through a left-anti join
    // (plan-asserted in RegistryPlanSpec). The ORACLE is d25's full
    // recompute over the whole corpus, so the hash match proves
    // apply(golden, batch) ≡ recompute(allDocs) — including cross-cluster
    // merges an arrival causes, and arrivals that land as new singletons.
    "d25b_golden_record_incremental" -> ((s, d) => {
      val isNew = col("doc_id") % 10 === 0
      val docs = Tables.documents(s, d)
      // Band keys are per-doc (MinHash of the doc's own shingles), so the
      // old corpus's index is exactly the shared standing index filtered
      // to old ids — one index, many consumers, including the incremental
      // maintainer. Exchange-free for the probe join below (d3b contract).
      val bk = bandKeyIndex(s, d)
      val (pairsOld, labelsOld, goldenOld) =
        graft.sources.Standing.artifact(s, d, "d25b_standing") {
          val p = Dedup.candidatePairs(bk.filter(!isNew), "doc_id",
            materialize = false).localCheckpoint()
          val l = Dedup.connectedComponentsAuto(p).localCheckpoint()
          val g = goldenMerge(docs.filter(!isNew), l).localCheckpoint()
          (p, l, g)
        }
      val r = incrementalRelabel(bk, bk.filter(isNew), pairsOld, labelsOld)
      // re-merge scope: touched components' members ∪ touched old
      // SINGLETONS (in touchedNodes but absent from labelsOld — their
      // golden cluster is their own id) ∪ ALL arrivals (a pairless
      // arrival becomes its own singleton record via goldenMerge's label
      // coalesce)
      val remergeDocs = docs
        .join(r.touchedLabels.select("doc_id")
          .unionByName(r.touchedNodes)
          .unionByName(docs.filter(isNew).select("doc_id")).distinct(),
          Seq("doc_id"), "left_semi")
      // retire: whole touched clusters, plus touched old singletons'
      // self-keyed records (a labeled touched doc's cluster is already in
      // touchedComps)
      val retired = r.touchedComps
        .unionByName(r.touchedNodes.select(col("doc_id").as("cluster"))).distinct()
      goldenOld.join(retired, Seq("cluster"), "left_anti")
        .unionByName(goldenMerge(remergeDocs, r.relabeled))
    }),

    // D11: benchmark decontamination — the pre-training hygiene op: a
    // training doc is contaminated if it shares any content n-gram with the
    // held-out set (docs < 20 stand in for the benchmark). Shape: explode
    // shingles once, the distinct benchmark grams are the (small) join
    // side, per-doc overlap counts come from one keyed aggregation.
    "d11_decontaminate" -> ((s, d) => {
      // per-doc DISTINCT grams first: repeated shingles inside a doc would
      // otherwise fan the join out by occurrence count, and the final agg
      // becomes a plain count instead of a count-distinct expand. The
      // dedup is row-local (array_distinct) — no distinct shuffle; see
      // the tx15 note.
      // explode_OUTER deliberately: plain explode lets Catalyst infer a
      // pre-Generate `size(sh)>0 AND isnotnull(sh)` filter that inlines the
      // whole (interpreted, codegen-fallback) shingle lambda a second and
      // third time per row — measured 5s vs 2s at sf0.1. The outer form
      // blocks that inference; the cheap null filter lands on the exploded
      // column instead.
      val grams = shingled(s, d)
        .select(col("doc_id"), explode_outer(array_distinct(col("sh"))).as("g"))
        .filter(col("g").isNotNull)
      val bench = grams.filter(col("doc_id") < 20).select("g").distinct()
      grams.filter(col("doc_id") >= 20)
        .join(bench, "g")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_shared"))
    }),

    // TX14: vocabulary coverage cutoff — the minimal frequency-ranked
    // vocabulary covering 95% of corpus token occurrences (the classic
    // vocab-size/coverage tradeoff curve behind every tokenizer decision).
    // One corpus-keyed aggregation; the cumulative share is a global-order
    // window over the VOCAB (distinct words), which is vocab-sized, not
    // corpus-sized — fine on one partition even when the corpus is 100 TB.
    "tx14_vocab_coverage" -> ((s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(col("n").desc, col("word").asc)
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      val freqs = Tables.documents(s, d)
        .select(explode(split(col("text"), " ")).as("word"))
        .filter(col("word") =!= "")
        .groupBy("word").agg(count(lit(1)).as("n"))
      val total = freqs.agg(sum(col("n")).as("tot"))
      freqs.crossJoin(broadcast(total))
        .withColumn("cum", sum(col("n")).over(w))
        .filter((col("cum") - col("n")).cast("double") / col("tot") < 0.95)
        .select(col("word"), col("n"),
          round(col("cum").cast("double") / col("tot"), 6).as("cum_share"))
    }),

    // BPE1: byte-pair-encoding merge training — THE tokenizer-training
    // primitive: k rounds of (count adjacent symbol pairs across the
    // corpus, weighted by word frequency; merge the globally most frequent
    // pair everywhere). Each round is one keyed aggregation + a 1-row
    // driver collect (the scalar-only pattern of connectedComponents /
    // pageRank-tol); the merge itself is a per-row regex pass. MERGE
    // SEMANTICS, pinned: leftmost non-overlapping replacement of the
    // space-delimited pair — java.util.regex and RE2 replace identically,
    // so the DuckDB replay (per-iteration generated CTEs computing the
    // same argmax pair) is exact. Corpus bounded to the top-2000 alpha
    // words by (freq, word) — deterministic, and vocab training never
    // needs the tail. Output: the symbol vocabulary after k merges.
    "bpe1_merge_vocab" -> ((s, d) => {
      val (_, seqs) = trainBpeMerges(s, d)
      seqs.select(col("n"), explode(split(trim(col("seq")), " ")).as("symbol"))
        .groupBy("symbol").agg(sum(col("n")).as("total_n"))
    }),

    // BPE2: ENCODE the corpus with the trained vocabulary — the operator a
    // training-data pipeline actually runs at 100 TB (tokenize-and-count).
    // Scale shape: the k merges are applied once to the DISTINCT corpus
    // vocabulary (vocab-sized work, never per-occurrence), producing a
    // word -> token-count map; per-doc counts are then one equi-join of the
    // exploded doc words against that map (AQE broadcasts the vocab side)
    // plus one doc-keyed aggregation. Merges apply in training order via
    // the same quoted regex step as training (TextAnalysis.mergePair), so
    // encode(word) is byte-identical to how training segmented it.
    "bpe2_encode" -> ((s, d) => {
      val (merges, _) = trainBpeMerges(s, d)
      val docWords = Tables.documents(s, d)
        .repartition(s.sparkContext.defaultParallelism)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
        .filter(col("word").rlike("^[a-z]+$"))
      val vocab0 = docWords.select("word").distinct()
        .withColumn("seq",
          concat(lit(" "), regexp_replace(col("word"), "(.)", "$1 ")))
      val encoded = merges.foldLeft(vocab0) { (df, pair) =>
          df.withColumn("seq", graft.text.TextAnalysis.mergePair(col("seq"), pair))
        }
        .select(col("word"),
          size(split(trim(col("seq")), " ")).cast("bigint").as("n_tokens"))
      docWords.join(encoded, "word")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_words"), sum(col("n_tokens")).as("n_tokens"))
    }),

    // BPE3: full corpus TOKENIZATION — the token-ID sequences a training
    // run actually consumes, not just counts (bpe2). Same
    // vocab-sized-work discipline: merges segment the DISTINCT vocabulary
    // once; token ids come from a dense ranking of the DISTINCT trained
    // tokens (a vocabulary is bounded — production BPE vocabs are ~50k —
    // so the id-assignment window runs over a vocab-sized frame, the tx14
    // precedent, never the corpus); the corpus-sized work is two
    // equi-joins (word → its token list, token → id) and a bounded
    // per-word explode. Output: one row per (doc, word position, token
    // position within the word) with the token id.
    "bpe3_tokenize" -> ((s, d) => {
      val (merges, _) = trainBpeMerges(s, d)
      val docWords = Tables.documents(s, d)
        .repartition(s.sparkContext.defaultParallelism)
        .select(col("doc_id"),
          posexplode(split(col("text"), " ")).as(Seq("word_pos", "word")))
        .filter(col("word").rlike("^[a-z]+$"))
      val vocab0 = docWords.select("word").distinct()
        .withColumn("seq",
          concat(lit(" "), regexp_replace(col("word"), "(.)", "$1 ")))
      val segmented = merges.foldLeft(vocab0) { (df, pair) =>
          df.withColumn("seq", graft.text.TextAnalysis.mergePair(col("seq"), pair))
        }
        .select(col("word"), split(trim(col("seq")), " ").as("toks"))
      val idWindow = org.apache.spark.sql.expressions.Window.orderBy(col("token"))
      val ids = segmented.select(explode(col("toks")).as("token")).distinct()
        .withColumn("token_id", row_number().over(idWindow).cast("bigint"))
      docWords.join(segmented, "word")
        .select(col("doc_id"), col("word_pos").cast("bigint").as("word_pos"),
          posexplode(col("toks")).as(Seq("tok_pos", "token")))
        .join(ids, "token")
        .select(col("doc_id"), col("word_pos"),
          col("tok_pos").cast("bigint").as("tok_pos"), col("token_id"))
    }),

    // PIPELINE: the end-to-end LLM-corpus face — quality gate (tx12's
    // bands) → near-dup survivorship (d7's MinHash/LSH/CC) → benchmark
    // decontamination (d11's gram join), composed the way a production
    // corpus build chains them. Documents parquet is scanned ONCE: a
    // single projection computes the gate signals AND the shingles, is
    // materialized, and every stage (gate, signatures, benchmark grams,
    // survivor/contamination joins) reads that frame — at 100 TB this is
    // the persisted staging table between pipeline phases (the d3b
    // pattern), not a rescan of raw text per stage.
    "pipeline_corpus" -> ((s, d) => {
      val base = Tables.documents(s, d)
        .repartition(s.sparkContext.defaultParallelism)
        .select(col("doc_id"),
          TextAnalysis.tokenCountWs(col("text")).as("n_words"),
          round(TextAnalysis.meanWordLen(col("text")), 6).as("mwl"),
          round(TextAnalysis.symbolRatio(col("text")), 6).as("sr"),
          split(col("text"), " ").as("w"))
        .withColumn("sh", when(size(col("w")) >= 3, Dedup.shingles(col("w"))))
        .drop("w")
        .trackedCheckpoint()
      // stage 1: quality gate (docs < 20 are the held-out benchmark, never
      // part of the training corpus)
      val corpus = base.filter(col("doc_id") >= 20 &&
          col("n_words").between(40, 100000) &&
          col("mwl").between(2.0, 12.0) && col("sr") < 0.1)
        .select(col("doc_id"), col("n_words"), col("sh"))
      // stage 2: near-dup survivorship among the gated corpus
      val sigs = Dedup.withMinhashSig(
        corpus.filter(col("sh").isNotNull), "sh", "sig").select("doc_id", "sig")
      // adaptive resolver (result-identical to plain propagation, O(log n)
      // on chains — CcRouteSpec) for the production pipeline face
      val dropped = Dedup.connectedComponentsAuto(
          Dedup.candidatePairs(Dedup.lshBandKeys(sigs, "doc_id", "sig"), "doc_id"))
        .filter(col("cluster") =!= col("doc_id")).select("doc_id")
      val survivors = corpus.join(dropped, Seq("doc_id"), "left_anti")
      // stage 3: decontamination — drop survivors sharing any 3-gram with
      // the benchmark docs
      val benchGrams = base.filter(col("doc_id") < 20)
        .select(explode_outer(col("sh")).as("g"))
        .filter(col("g").isNotNull).distinct()
      val contaminated = survivors
        // row-local per-doc dedup (array_distinct) — see the tx15 note
        .select(col("doc_id"), explode_outer(array_distinct(col("sh"))).as("g"))
        .filter(col("g").isNotNull)
        .join(benchGrams, "g").select("doc_id").distinct()
      survivors.join(contaminated, Seq("doc_id"), "left_anti")
        .select(col("doc_id"), col("n_words"))
    }),

    // CH2: content-defined chunking — boundaries where the rolling 3-gram
    // hash lands in bucket 0 of 8 (Rabin-style CDC, word granularity): edits
    // shift fixed windows but leave most content-defined chunks intact,
    // which is what makes chunk-level dedup robust. Flags are built
    // array-side (shuffle-free), the chunk index is one prefix-sum window.
    "ch2_content_chunks" -> ((s, d) => {
      val docs = Tables.documents(s, d)
        .repartition(s.sparkContext.defaultParallelism)
        .select(col("doc_id"), split(col("text"), " ").as("w"))
      // boundary AFTER word i (0-based) when md5 of words (i-2, i-1, i)
      // falls in bucket 0 (same portable 60-bit md5 bucket as tx7)
      val flags = transform(sequence(lit(0), size(col("w")) - 1), i =>
        when(i >= 2,
          (conv(substring(md5(concat_ws(" ", slice(col("w"), i - 1, lit(3)))
            .cast("binary")), 1, 15), 16, 10).cast("bigint") % 8 === 0).cast("int"))
          .otherwise(0))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("doc_id").orderBy("pos")
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
      docs.select(col("doc_id"), posexplode(flags).as(Seq("pos", "f")))
        .withColumn("chunk_idx", coalesce(sum(col("f")).over(w), lit(0)).cast("bigint"))
        .groupBy("doc_id", "chunk_idx")
        .agg(count(lit(1)).as("n_words"))
    }),

    // TX11: repetition ratio — the most frequent bigram's share of all
    // bigram occurrences per doc (a Gopher-style repetitiousness signal;
    // boilerplate and degenerate generations spike it). Two keyed shuffles:
    // (doc, bigram) counts, then a per-doc max/sum.
    "tx11_repetition_ratio" -> ((s, d) =>
      Tables.documents(s, d)
        .repartition(s.sparkContext.defaultParallelism)
        .select(col("doc_id"), split(col("text"), " ").as("words"))
        .filter(size(col("words")) >= 2)
        // explode_outer + null filter: see d11
        .select(col("doc_id"), explode_outer(Dedup.shingles(col("words"), 2)).as("bg"))
        .filter(col("bg").isNotNull)
        .groupBy("doc_id", "bg").agg(count(lit(1)).as("n"))
        .groupBy("doc_id")
        .agg(round(max(col("n")).cast("double") / sum(col("n")), 6)
          .as("top_bigram_share"))),

    // TX12: composite quality gate — word count, mean word length, and
    // symbol ratio against fixed acceptance bands (the Gopher-rule shape:
    // each signal is cheap per-row Column math, the gate is their AND).
    "tx12_quality_gate" -> ((s, d) =>
      Tables.documents(s, d).select(
        col("doc_id"),
        TextAnalysis.tokenCountWs(col("text")).as("n_words"),
        round(TextAnalysis.meanWordLen(col("text")), 6).as("mean_word_len"),
        round(TextAnalysis.symbolRatio(col("text")), 6).as("symbol_ratio"))
        .withColumn("keep",
          col("n_words").between(40, 100000) &&
            col("mean_word_len").between(2.0, 12.0) &&
            col("symbol_ratio") < 0.1)),

    // TX13: PII redaction — emails and URLs replaced with typed placeholder
    // tokens. The fixture text carries no PII, so each doc deterministically
    // injects one of each and the oracle replays the same construction: the
    // hashes match only if both engines' global regex replacement agrees.
    "tx13_redact_pii" -> ((s, d) =>
      Tables.documents(s, d).filter(col("doc_id") < 500)
        .select(col("doc_id"),
          TextAnalysis.redactPii(concat(
            substring(col("text"), 1, 80),
            lit(" contact user"), col("doc_id").cast("string"),
            lit("@mail.example.com or https://example.org/doc/"),
            col("doc_id").cast("string"), lit("?ref=x next"))).as("clean"))),

    // ----- multimodal plumbing (binary columns) -----
    // MM1: opaque binary payload + typed metadata: byte length and a content
    // digest — the schema/partitioning pattern for image/audio blobs.
    "mm1_binary_meta" -> ((s, d) =>
      Tables.documents(s, d).select(
        col("doc_id"),
        octet_length(col("text").cast("binary")).cast("bigint").as("n_bytes"),
        sha2(col("text").cast("binary"), 256).as("digest")))
  )

  // the one SQL mirror of shingled(): keyCol varies, the shingling never
  private[queries] def shingleCteFor(keyCol: String): String =
    s"""SELECT $keyCol, w, list_transform(range(len(w) - 2), i -> w[i+1] || ' ' || w[i+2] || ' ' || w[i+3]) AS sh
       FROM (SELECT $keyCol, string_split(text, ' ') AS w FROM documents)
       WHERE len(w) >= 3"""
  private[queries] val shingleCte = shingleCteFor("doc_id")

  /** tx20's injected German tail — one constant shared by the Spark face
    * and the oracle (four marker repetitions: comfortably outscores the
    * ~half-doc of English markers the tail half retains). ASCII only, no
    * quote characters, so the SQL literal is the verbatim string.
    */
  private val mixTail =
    " der die das und ist nicht" * 4

  // Oracle mirror of Dedup.withMinhashSig: two 60-bit values per seeded md5.
  // minhashWidth is THE signature width — the face passes it to
  // withMinhashSig and the oracle loops/divisors derive from it, so a
  // width change is a one-constant edit, never a hash mismatch.
  private[queries] val minhashWidth = 8
  private[queries] val sigEntriesSql: Seq[String] = (0 until minhashWidth).map { j =>
    s"list_min(list_transform(sh, s -> substr(md5('${j / 2}|' || s), ${1 + 16 * (j % 2)}, 15)))"
  }
  private val minhashSigExpr = sigEntriesSql.mkString(" || '|' || ")

  /** sp1's packing parallelism — in production the writer task count; here
    * the host's scheduler width (what `local[*]`'s defaultParallelism
    * resolves to), so the packing window is exactly as parallel as the
    * machine instead of a hard-coded 8 (round-8 verdict item #3). One
    * constant drives BOTH the Spark face and the DuckDB oracle (the
    * lloydIters/bpeIters pattern — the oracle string and the face are
    * generated in the same JVM, so they always agree); the shard count is
    * a parallelism knob, not data, so any agreeing value is correct and
    * SplitSpec pins a non-default value too.
    */
  val sp1Shards: Long = math.max(1, Runtime.getRuntime.availableProcessors()).toLong

  /** sp2's batch size — ONE constant drives the face and the oracle (the
    * sp1Shards pattern; a hardcoded literal on either side could drift).
    */
  val sp2BatchSize: Long = 16L

  /** SEQUENCE PACKING — assign documents to fixed-capacity training
    * context windows (`cap` tokens). Packing is inherently sequential, so
    * the scalable form shards first (`nShards` IS the packing-parallelism
    * knob) and packs WITHIN each shard by running token count: a doc
    * starting before a capacity boundary stays in that bin (bounded
    * overflow: a bin overruns by at most max_doc_tokens − 1; per-doc
    * counts are capped at `cap` so no single doc exceeds a window). One
    * window + one keyed agg — no iteration, no driver loop, shards pack
    * in parallel.
    */
  def packSequences(docs: DataFrame, cap: Long, nShards: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d = docs.select(
      col("doc_id"), (col("doc_id") % nShards).as("shard"),
      least(size(split(col("text"), " ")).cast("bigint"), lit(cap)).as("n_tok"))
    val w = Window.partitionBy("shard").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, 0)
    d.withColumn("cum", sum(col("n_tok")).over(w))
      .withColumn("bin", floor((col("cum") - col("n_tok")) / cap).cast("bigint"))
      .groupBy("shard", "bin")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("tok_sum"))
  }

  /** BPE constants: ONE pair of constants drives both the Spark loop and
    * the generated per-iteration oracle CTEs (the pr1/v4b pattern).
    */
  private val bpeIters = 3
  private val bpeWords = 2000

  /** BPE merge training (shared by bpe1/bpe2/bpe3): `bpeIters` rounds of
    * weighted adjacent-pair counting over the top-`bpeWords` alpha words,
    * each round merging the globally most frequent pair everywhere.
    * Returns the merges in training order plus the final merged training
    * frame (word, n, seq).
    *
    * DRIVER-SIDE training over the collected word-count table (round-9
    * advice #4): the r9 form ran one distributed argmax JOB per merge —
    * 32k driver jobs at a production vocab. The standard production shape
    * trains on the weighted DISTINCT-word dictionary instead: the only
    * corpus-scaled stage is the word count (one distributed groupBy +
    * top-`bpeWords`, exactly as before); the dictionary itself is
    * vocab-sized (bounded by the `bpeWords` constant, ≪ corpus at any
    * scale), so every merge round is a local fold over ≤ `bpeWords`
    * short strings — total driver jobs per training run: 1 (the vocab
    * collect), independent of merge count. The merge list then broadcasts
    * into the encode faces as before.
    *
    * Exactness: pair counting replays the distributed form verbatim
    * (split on trimmed seq, adjacent pairs, weight n, argmax by
    * (cnt DESC, pair ASC) — ASCII-only symbols, so Scala/UTF8/DuckDB
    * orderings agree), and merges apply via
    * [[graft.text.TextAnalysis.mergePairStr]] — the property-pinned JVM
    * twin of the `mergePair` Column (Spark's regexp_replace IS
    * java.util.regex). The per-iteration oracle CTEs are unchanged: the
    * physical route moved, the computation didn't — bpe1/2/3 hashes pin
    * that.
    */
  private def trainBpeMerges(s: SparkSession, d: String): (Seq[String], DataFrame) = {
    val words = Tables.documents(s, d)
      .select(explode(split(col("text"), " ")).as("word"))
      .filter(col("word").rlike("^[a-z]+$"))
      .groupBy("word").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("word").asc).limit(bpeWords)
    val vocab = words.collect().map(r => (r.getString(0), r.getLong(1)))
    // seq init replays concat(" ", regexp_replace(word, "(.)", "$1 "))
    var seqs = vocab.map { case (w, n) =>
      (w, n, " " + w.map(ch => s"$ch ").mkString)
    }
    val merges = Seq.newBuilder[String]
    (1 to bpeIters).foreach { _ =>
      val counts = scala.collection.mutable.HashMap.empty[String, Long]
      seqs.foreach { case (_, n, seq) =>
        val t = seq.trim.split(" ")
        var i = 0
        while (i < t.length - 1) {
          val p = t(i) + " " + t(i + 1)
          counts.update(p, counts.getOrElse(p, 0L) + n)
          i += 1
        }
      }
      val top = counts.min(Ordering.by[(String, Long), (Long, String)] {
        case (p, c) => (-c, p)
      })._1
      merges += top
      seqs = seqs.map { case (w, n, seq) =>
        (w, n, graft.text.TextAnalysis.mergePairStr(seq, top))
      }
    }
    import s.implicits._
    (merges.result(), seqs.toSeq.toDF("word", "n", "seq"))
  }

  /** Shared bpe1/bpe2 training CTEs: it{j} applies the argmax pair of p{j}
    * (computed by the same weighted adjacent-pair count and (cnt DESC,
    * pair) tie-break as the Spark side) to it{j-1}.
    */
  private def bpeTrainCtes(iters: Int): String = {
    val head =
      s"""WITH words AS (
           SELECT word, count(*)::BIGINT AS n FROM (
             SELECT unnest(string_split(text, ' ')) AS word FROM documents)
           WHERE regexp_full_match(word, '[a-z]+')
           GROUP BY word ORDER BY n DESC, word LIMIT $bpeWords),
         it0 AS (
           SELECT word, n, ' ' || regexp_replace(word, '(.)', '\\1 ', 'g') AS seq
           FROM words)"""
    val iterations = (1 to iters).map { j =>
      s""",
         p$j AS (
           SELECT pair FROM (
             SELECT t[i+1] || ' ' || t[i+2] AS pair, sum(n) AS cnt
             FROM (SELECT n, string_split(trim(seq), ' ') AS t FROM it${j - 1}),
                  unnest(range(len(t) - 1)) u(i)
             GROUP BY 1)
           ORDER BY cnt DESC, pair LIMIT 1),
         it$j AS (
           SELECT word, n, regexp_replace(seq,
             ' ' || (SELECT pair FROM p$j) || ' ',
             ' ' || replace((SELECT pair FROM p$j), ' ', '') || ' ', 'g') AS seq
           FROM it${j - 1})"""
    }.mkString
    head + iterations
  }

  /** bpe1 oracle: the final vocab aggregates it{iters}. */
  private def bpeOracle(iters: Int): String =
    bpeTrainCtes(iters) +
      s"""
         SELECT symbol, sum(n)::BIGINT AS total_n FROM (
           SELECT n, unnest(string_split(trim(seq), ' ')) AS symbol FROM it$iters)
         GROUP BY symbol"""

  /** bpe2 oracle: the SAME trained pairs p1..p{iters} applied in order to
    * the full distinct corpus vocabulary, then per-doc token counts via the
    * word -> n_tokens map (the same vocab-join shape as the Spark side).
    */
  /** Shared bpe2/bpe3 prefix: training CTEs, the per-doc word list WITH
    * word positions (bpe2 only counts them; bpe3 emits them), and the
    * merge-application chain over the distinct vocabulary.
    */
  private def bpeEncodePrefix(iters: Int): String = {
    val encodeCtes = (1 to iters).map { j =>
      s""",
         enc$j AS (
           SELECT word, regexp_replace(seq,
             ' ' || (SELECT pair FROM p$j) || ' ',
             ' ' || replace((SELECT pair FROM p$j), ' ', '') || ' ', 'g') AS seq
           FROM enc${j - 1})"""
    }.mkString
    bpeTrainCtes(iters) +
      s""",
         docw AS (
           SELECT doc_id, i::BIGINT AS word_pos, w[i+1] AS word
           FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
             unnest(range(len(w))) u(i)
           WHERE regexp_full_match(w[i+1], '[a-z]+')),
         enc0 AS (
           SELECT word, ' ' || regexp_replace(word, '(.)', '\\1 ', 'g') AS seq
           FROM (SELECT DISTINCT word FROM docw))""" +
      encodeCtes
  }

  private def bpe2Oracle(iters: Int): String =
    bpeEncodePrefix(iters) +
      s""",
         encn AS (
           SELECT word, len(string_split(trim(seq), ' '))::BIGINT AS n_tokens
           FROM enc$iters)
         SELECT doc_id, count(*)::BIGINT AS n_words, sum(n_tokens)::BIGINT AS n_tokens
         FROM docw JOIN encn USING (word)
         GROUP BY doc_id"""

  /** bpe3: the same trained segmentation, emitted as token-id sequences —
    * ids are a dense rank over the DISTINCT trained tokens (vocab-sized).
    */
  private def bpe3Oracle(iters: Int): String =
    bpeEncodePrefix(iters) +
      s""",
         wordtoks AS (
           SELECT word, string_split(trim(seq), ' ') AS toks FROM enc$iters),
         ids AS (
           SELECT token, row_number() OVER (ORDER BY token)::BIGINT AS token_id
           FROM (SELECT DISTINCT unnest(toks) AS token FROM wordtoks)),
         flat AS (
           SELECT d.doc_id, d.word_pos, i::BIGINT AS tok_pos, t.toks[i+1] AS token
           FROM docw d JOIN wordtoks t USING (word),
             unnest(range(len(t.toks))) u(i))
         SELECT f.doc_id, f.word_pos, f.tok_pos, ids.token_id
         FROM flat f JOIN ids USING (token)"""

  // Shared by d7 and d12: identical survivor semantics, batch vs stateful
  // physical route.
  private lazy val survivorsOracle =
    s"""WITH RECURSIVE t AS ($shingleCte),
       sigs AS (
         SELECT doc_id, list_value(${sigEntriesSql.mkString(", ")}) AS sig
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
       dropped AS (
         SELECT n FROM reach GROUP BY n HAVING min(m) != n)
       SELECT doc_id FROM documents
       WHERE doc_id NOT IN (SELECT n FROM dropped)"""

  // d25/d25b: d10's cluster derivation verbatim, then the field-wise merge.
  // One oracle serves both faces — d25b's incremental apply must be
  // hash-identical to the full recompute.
  private lazy val goldenRecordOracle =
    s"""WITH RECURSIVE t AS ($shingleCte),
       sigs AS (
         SELECT doc_id, list_value(${sigEntriesSql.mkString(", ")}) AS sig
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
       labels AS (SELECT n AS doc_id, min(m) AS cluster FROM reach GROUP BY n),
       labeled AS (
         SELECT d.*, coalesce(l.cluster, d.doc_id) AS cluster
         FROM documents d LEFT JOIN labels l ON d.doc_id = l.doc_id)
       SELECT cluster, min(doc_id) AS keep_id, count(*)::BIGINT AS n_members,
         max_by(text, lpad(length(text)::VARCHAR, 12, '0') || text) AS text,
         max(n_chars) AS n_chars,
         list_aggr(list_sort(list(DISTINCT source)), 'string_agg', ',') AS sources,
         list_aggr(list_sort(list(DISTINCT lang)), 'string_agg', ',') AS langs
       FROM labeled GROUP BY cluster"""

  // d15: the d3 candidate CTEs + distinct-shingle intersection counts and
  // min-size normalization (asymmetric containment).
  private lazy val containmentOracle =
    s"""WITH t AS ($shingleCte),
       sigs AS (
         SELECT doc_id, list_value(${sigEntriesSql.mkString(", ")}) AS sig
         FROM t),
       bands AS (
         SELECT doc_id, i::VARCHAR || ':' || sig[2*i + 1] || '|' || sig[2*i + 2] AS band_key
         FROM sigs, unnest(range(0, 4)) u(i)),
       pairs AS (
         SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
         FROM bands l JOIN bands r USING (band_key)
         WHERE l.doc_id < r.doc_id),
       e AS (SELECT DISTINCT doc_id, unnest(sh) AS g FROM t),
       sizes AS (SELECT doc_id, count(*)::BIGINT AS n FROM e GROUP BY doc_id),
       inter AS (
         SELECT p.a, p.b, count(*)::BIGINT AS n_common
         FROM pairs p
         JOIN e ea ON ea.doc_id = p.a
         JOIN e eb ON eb.doc_id = p.b AND eb.g = ea.g
         GROUP BY p.a, p.b)
       SELECT i.a, i.b, i.n_common,
         round(i.n_common::DOUBLE / least(sa.n, sb.n), 6) AS containment
       FROM inter i
       JOIN sizes sa ON sa.doc_id = i.a
       JOIN sizes sb ON sb.doc_id = i.b"""

  // Shared by d3 and d3b: identical candidate semantics, different storage.
  private lazy val lshPairsOracle =
    s"""WITH t AS ($shingleCte),
       sigs AS (
         SELECT doc_id, list_value(${sigEntriesSql.mkString(", ")}) AS sig
         FROM t),
       bands AS (
         SELECT doc_id, i::VARCHAR || ':' || sig[2*i + 1] || '|' || sig[2*i + 2] AS band_key
         FROM sigs, unnest(range(0, 4)) u(i)),
       pairs AS (
         SELECT l.doc_id AS a, r.doc_id AS b
         FROM bands l JOIN bands r USING (band_key)
         WHERE l.doc_id < r.doc_id)
       SELECT DISTINCT a, b FROM pairs"""

  /** d19/d20 sample size: a fixed COUNT of anchor docs, not a fraction —
    * the audit's cost and statistical power then stay constant as the
    * corpus grows (a fraction keeps power but inherits the truth set's
    * superlinear growth). ONE constant drives the Spark faces and the
    * generated oracle CTE (the sp1Shards pattern). 120 of the 500-doc
    * fixture keeps every threshold's sampled n_true comfortably nonzero
    * while still exercising the "most pairs excluded" path.
    */
  val auditAnchors: Int = 120

  /** Deterministic anchor-doc selection for the sampled audits: rank the
    * shingled corpus by md5("audit|" + doc_id) — a content-independent,
    * engine-portable pseudo-random order — and keep the first
    * [[auditAnchors]]. A TakeOrdered over doc-cardinality rows: linear,
    * broadcast-sized result.
    */
  private def anchorDocs(t: DataFrame): DataFrame =
    t.select(col("doc_id"),
        md5(concat(lit("audit|"), col("doc_id").cast("string"))).as("hk"))
      .orderBy(col("hk"), col("doc_id"))
      .limit(auditAnchors)
      .select("doc_id")

  // Oracle twin of anchorDocs, over the shingle CTE `t`.
  private lazy val anchorsCte =
    s"""SELECT doc_id FROM t
       ORDER BY md5('audit|' || doc_id::VARCHAR), doc_id LIMIT $auditAnchors"""

  /** d21's stratification width: the anchor set splits into this many
    * interleaved md5-rank strata (each an independent unbiased sub-audit).
    * ONE constant drives the Spark face and the oracle CTE.
    */
  val anchorStrataK: Int = 3

  /** [[anchorDocs]] plus an interleaved stratum id ((md5-rank - 1) mod K):
    * interleaving by the SAME hash order that selected the anchors makes
    * each stratum its own unbiased md5-ordered sample. The row_number
    * window runs over the already-limited 120-row frame (one partition by
    * construction — broadcast-sized, the warning Spark emits is the point).
    */
  private def anchorStrata(t: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("hk"), col("doc_id"))
    t.select(col("doc_id"),
        md5(concat(lit("audit|"), col("doc_id").cast("string"))).as("hk"))
      .orderBy(col("hk"), col("doc_id"))
      .limit(auditAnchors)
      .withColumn("stratum",
        ((row_number().over(w) - 1) % anchorStrataK).cast("bigint"))
      .select("doc_id", "stratum")
  }

  // Oracle twin of anchorStrata: row_number over ALL of t in the same md5
  // order, then the LIMIT keeps exactly ranks 1..120 — identical strata.
  private lazy val anchorStrataCte =
    s"""SELECT doc_id,
         ((row_number() OVER (ORDER BY md5('audit|' || doc_id::VARCHAR), doc_id)
           - 1) % $anchorStrataK)::BIGINT AS stratum
       FROM t
       ORDER BY md5('audit|' || doc_id::VARCHAR), doc_id LIMIT $auditAnchors"""

  /** ONE anchor-rooted exact-Jaccard truth set, shared by d19/d21/d22
    * (before round 14's review pass each face carried its own copy — a
    * future fix to the Jaccard or the smaller-id-is-anchor asymmetry would
    * have had to land three times): every shingle-sharing pair whose
    * SMALLER-id endpoint is in `anchorIds`, scored as pure aggregation
    * (|A∩B| = sharing-join group count, |A∪B| from per-doc distinct
    * counts — the d17 integer arithmetic the oracles replay closed-form).
    * Returns (a, b, jaccard).
    */
  private def anchorTruth(t: DataFrame, anchorIds: DataFrame): DataFrame = {
    // per-doc dedup is row-local (array_distinct) — (doc_id, g) rows are
    // then unique by construction, so the historical corpus-wide
    // `.distinct()` here was a full extra Exchange over the largest
    // intermediate (docs x shingles) for rows already distinct (the d17
    // form; guide §2.4 — remove shuffles outright)
    val ex = graft.ops.Checkpoints.tracked(
      t.select(col("doc_id"), explode(array_distinct(col("sh"))).as("g")))
    val exA = ex.join(broadcast(anchorIds), "doc_id")
    val counts = ex.groupBy("doc_id").agg(count(lit(1)).as("nsh"))
    exA.as("l").join(ex.as("r"), "g")
      .filter(col("l.doc_id") < col("r.doc_id"))
      .groupBy(col("l.doc_id").as("a"), col("r.doc_id").as("b"))
      .agg(count(lit(1)).as("ninter"))
      .join(counts.select(col("doc_id").as("a"), col("nsh").as("na")), "a")
      .join(counts.select(col("doc_id").as("b"), col("nsh").as("nb")), "b")
      .select(col("a"), col("b"),
        (col("ninter").cast("double") /
          (col("na") + col("nb") - col("ninter"))).as("jaccard"))
  }

  // d17's oracle: exact-Jaccard truth over the shingle-sharing pairs (the
  // complete set for any positive threshold) ⟕ d3's banded candidates
  // (replayed verbatim from its oracle body), then one filtered aggregate
  // per tuning threshold. recall is a single division, round-6.
  private lazy val d17RecallOracle = {
    def at(th: String) =
      s"""SELECT $th::DOUBLE AS threshold, count(*)::BIGINT AS n_true,
           sum(hit)::BIGINT AS n_found,
           round(sum(hit)::DOUBLE / count(*), 6) AS recall
         FROM f WHERE jaccard >= $th"""
    s"""WITH t AS ($shingleCte),
       e AS (SELECT DISTINCT doc_id, unnest(sh) AS g FROM t),
       sharing AS (
         SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
         FROM e l JOIN e r USING (g) WHERE l.doc_id < r.doc_id),
       truth AS (
         SELECT s.a, s.b,
           len(list_distinct(list_intersect(la.sh, lb.sh)))::DOUBLE /
           len(list_distinct(la.sh || lb.sh))::DOUBLE AS jaccard
         FROM sharing s
         JOIN t la ON la.doc_id = s.a
         JOIN t lb ON lb.doc_id = s.b),
       sigs AS (
         SELECT doc_id, list_value(${sigEntriesSql.mkString(", ")}) AS sig
         FROM t),
       bands AS (
         SELECT doc_id, i::VARCHAR || ':' || sig[2*i + 1] || '|' || sig[2*i + 2] AS band_key
         FROM sigs, unnest(range(0, 4)) u(i)),
       cand AS (
         SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
         FROM bands l JOIN bands r USING (band_key)
         WHERE l.doc_id < r.doc_id),
       f AS (
         SELECT tr.jaccard, CASE WHEN c.a IS NOT NULL THEN 1 ELSE 0 END AS hit
         FROM truth tr LEFT JOIN cand c ON c.a = tr.a AND c.b = tr.b)
       ${at("0.5")} UNION ALL ${at("0.7")} UNION ALL ${at("0.9")}"""
  }

  // d18's oracle: d3's candidates joined back to their shingle sets; exact
  // Jaccard per candidate, conditional count per threshold.
  private lazy val d18PrecisionOracle = {
    def at(th: String) =
      s"""SELECT $th::DOUBLE AS threshold, count(*)::BIGINT AS n_candidates,
           sum(CASE WHEN jaccard >= $th THEN 1 ELSE 0 END)::BIGINT AS n_true,
           round(sum(CASE WHEN jaccard >= $th THEN 1 ELSE 0 END)::DOUBLE
                 / count(*), 6) AS precision
         FROM f"""
    s"""WITH t AS ($shingleCte),
       sigs AS (
         SELECT doc_id, list_value(${sigEntriesSql.mkString(", ")}) AS sig
         FROM t),
       bands AS (
         SELECT doc_id, i::VARCHAR || ':' || sig[2*i + 1] || '|' || sig[2*i + 2] AS band_key
         FROM sigs, unnest(range(0, 4)) u(i)),
       cand AS (
         SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
         FROM bands l JOIN bands r USING (band_key)
         WHERE l.doc_id < r.doc_id),
       f AS (
         SELECT len(list_distinct(list_intersect(la.sh, lb.sh)))::DOUBLE /
           len(list_distinct(la.sh || lb.sh))::DOUBLE AS jaccard
         FROM cand c
         JOIN t la ON la.doc_id = c.a
         JOIN t lb ON lb.doc_id = c.b)
       ${at("0.5")} UNION ALL ${at("0.7")} UNION ALL ${at("0.9")}"""
  }

  /** Shared WITH-prefix of the sampled-audit oracles (d19/d21/d22): the
    * shingled corpus, the anchor set (parameterized — d19 plain ids,
    * d21/d22 strata), the anchor-rooted exact-Jaccard truth, and the
    * minhash signatures. ONE definition (review r14): editing the truth
    * CTE in one audit's oracle but not another's would make two audits
    * disagree on the same fixture.
    */
  private def sampledAuditCtes(anchorsSql: String): String =
    s"""t AS ($shingleCte),
       anchors AS ($anchorsSql),
       e AS (SELECT DISTINCT doc_id, unnest(sh) AS g FROM t),
       sharing AS (
         SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
         FROM e l JOIN e r USING (g)
         WHERE l.doc_id < r.doc_id
           AND l.doc_id IN (SELECT doc_id FROM anchors)),
       truth AS (
         SELECT s.a, s.b,
           len(list_distinct(list_intersect(la.sh, lb.sh)))::DOUBLE /
           len(list_distinct(la.sh || lb.sh))::DOUBLE AS jaccard
         FROM sharing s
         JOIN t la ON la.doc_id = s.a
         JOIN t lb ON lb.doc_id = s.b),
       sigs AS (
         SELECT doc_id, list_value(${sigEntriesSql.mkString(", ")}) AS sig
         FROM t)"""

  // d19's oracle: d17's truth/candidate replay with both sides restricted
  // to pairs whose smaller-id endpoint is in the deterministic anchor set.
  private lazy val d19RecallOracle = {
    def at(th: String) =
      s"""SELECT $th::DOUBLE AS threshold, count(*)::BIGINT AS n_true,
           sum(hit)::BIGINT AS n_found,
           round(sum(hit)::DOUBLE / count(*), 6) AS recall
         FROM f WHERE jaccard >= $th"""
    s"""WITH ${sampledAuditCtes(anchorsCte)},
       bands AS (
         SELECT doc_id, i::VARCHAR || ':' || sig[2*i + 1] || '|' || sig[2*i + 2] AS band_key
         FROM sigs, unnest(range(0, 4)) u(i)),
       cand AS (
         SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
         FROM bands l JOIN bands r USING (band_key)
         WHERE l.doc_id < r.doc_id
           AND l.doc_id IN (SELECT doc_id FROM anchors)),
       f AS (
         SELECT tr.jaccard, CASE WHEN c.a IS NOT NULL THEN 1 ELSE 0 END AS hit
         FROM truth tr LEFT JOIN cand c ON c.a = tr.a AND c.b = tr.b)
       ${at("0.5")} UNION ALL ${at("0.7")} UNION ALL ${at("0.9")}"""
  }

  // d21's oracle: d19's sampled-truth pipeline with the anchor's stratum
  // carried through, per-stratum recalls as exact integer ratios, then the
  // pooled/mean/se aggregate per threshold (se guarded NULL below 2 strata
  // — Spark's single-value stddev_samp is NaN, DuckDB's is NULL).
  private lazy val d21VarianceOracle = {
    def at(th: String) =
      s"""SELECT $th::DOUBLE AS threshold, count(*)::BIGINT AS n_strata,
           round(sum(n_found)::DOUBLE / sum(n_true), 6) AS pooled_recall,
           round(avg(recall), 6) AS mean_recall,
           CASE WHEN count(*) > 1
             THEN round(stddev_samp(recall) / sqrt(count(*)), 6) END AS se_recall
         FROM (SELECT stratum, count(*)::BIGINT AS n_true,
                 sum(hit)::BIGINT AS n_found,
                 sum(hit)::DOUBLE / count(*) AS recall
               FROM f WHERE jaccard >= $th GROUP BY stratum)"""
    s"""WITH ${sampledAuditCtes(anchorStrataCte)},
       bands AS (
         SELECT doc_id, i::VARCHAR || ':' || sig[2*i + 1] || '|' || sig[2*i + 2] AS band_key
         FROM sigs, unnest(range(0, 4)) u(i)),
       cand AS (
         SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
         FROM bands l JOIN bands r USING (band_key)
         WHERE l.doc_id < r.doc_id
           AND l.doc_id IN (SELECT doc_id FROM anchors)),
       f AS (
         SELECT tr.jaccard,
           CASE WHEN c.a IS NOT NULL THEN 1 ELSE 0 END AS hit,
           an.stratum
         FROM truth tr
         LEFT JOIN cand c ON c.a = tr.a AND c.b = tr.b
         JOIN anchors an ON an.doc_id = tr.a)
       ${at("0.5")} UNION ALL ${at("0.7")} UNION ALL ${at("0.9")}"""
  }

  // d22's oracle: d21's stratified chain with TWO band configurations over
  // the same signatures — the band expression is generated per config from
  // (rowsPerBand, numBands), matching lshBandKeys token for token.
  private lazy val d22TuningOracle = {
    def bandsCte(r: Int, nb: Int) =
      s"""SELECT doc_id, i::VARCHAR || ':' || ${
           (1 to r).map(j => s"sig[$r*i + $j]").mkString(" || '|' || ")} AS band_key
         FROM sigs, unnest(range(0, $nb)) u(i)"""
    def configSelects(label: String) = {
      def at(th: String) =
        s"""SELECT '$label' AS config, $th::DOUBLE AS threshold,
             count(*)::BIGINT AS n_strata,
             round(sum(n_found)::DOUBLE / sum(n_true), 6) AS pooled_recall,
             round(avg(recall), 6) AS mean_recall,
             CASE WHEN count(*) > 1
               THEN round(stddev_samp(recall) / sqrt(count(*)), 6) END AS se_recall
           FROM (SELECT stratum, count(*)::BIGINT AS n_true,
                   sum(hit)::BIGINT AS n_found,
                   sum(hit)::DOUBLE / count(*) AS recall
                 FROM f_$label WHERE jaccard >= $th GROUP BY stratum)"""
      s"${at("0.05")} UNION ALL ${at("0.5")} UNION ALL ${at("0.9")}"
    }
    def configCtes(label: String, r: Int, nb: Int) =
      s"""bands_$label AS (${bandsCte(r, nb)}),
         cand_$label AS (
           SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
           FROM bands_$label l JOIN bands_$label r USING (band_key)
           WHERE l.doc_id < r.doc_id
             AND l.doc_id IN (SELECT doc_id FROM anchors)),
         f_$label AS (
           SELECT tr.jaccard,
             CASE WHEN c.a IS NOT NULL THEN 1 ELSE 0 END AS hit,
             an.stratum
           FROM truth tr
           LEFT JOIN cand_$label c ON c.a = tr.a AND c.b = tr.b
           JOIN anchors an ON an.doc_id = tr.a)"""
    s"""WITH ${sampledAuditCtes(anchorStrataCte)},
       ${configCtes("b4r2", 2, 4)},
       ${configCtes("b2r4", 4, 2)}
       ${configSelects("b4r2")} UNION ALL ${configSelects("b2r4")}"""
  }

  // d20's oracle: d18's candidate verification restricted to anchor-rooted
  // candidates.
  private lazy val d20PrecisionOracle = {
    def at(th: String) =
      s"""SELECT $th::DOUBLE AS threshold, count(*)::BIGINT AS n_candidates,
           sum(CASE WHEN jaccard >= $th THEN 1 ELSE 0 END)::BIGINT AS n_true,
           round(sum(CASE WHEN jaccard >= $th THEN 1 ELSE 0 END)::DOUBLE
                 / count(*), 6) AS precision
         FROM f"""
    s"""WITH t AS ($shingleCte),
       anchors AS ($anchorsCte),
       sigs AS (
         SELECT doc_id, list_value(${sigEntriesSql.mkString(", ")}) AS sig
         FROM t),
       bands AS (
         SELECT doc_id, i::VARCHAR || ':' || sig[2*i + 1] || '|' || sig[2*i + 2] AS band_key
         FROM sigs, unnest(range(0, 4)) u(i)),
       cand AS (
         SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
         FROM bands l JOIN bands r USING (band_key)
         WHERE l.doc_id < r.doc_id
           AND l.doc_id IN (SELECT doc_id FROM anchors)),
       f AS (
         SELECT len(list_distinct(list_intersect(la.sh, lb.sh)))::DOUBLE /
           len(list_distinct(la.sh || lb.sh))::DOUBLE AS jaccard
         FROM cand c
         JOIN t la ON la.doc_id = c.a
         JOIN t lb ON lb.doc_id = c.b)
       ${at("0.5")} UNION ALL ${at("0.7")} UNION ALL ${at("0.9")}"""
  }

  // Oracle mirror of the d5 simhash, as a reusable CTE body.
  private val simhashCte =
    """SELECT doc_id,
         list_sum(list_transform(range(60), b ->
           CASE WHEN list_sum(list_transform(hs, h ->
                  CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END)) > 0
                THEN 1::BIGINT << b ELSE 0::BIGINT END))::BIGINT AS simhash
       FROM (SELECT doc_id,
               list_transform(string_split(text, ' '),
                 x -> ('0x' || substr(md5(x), 1, 15))::BIGINT) AS hs
             FROM documents)"""

  /** Full connected-components rebuild over every LSH candidate pair —
    * shared by d6 (which computes exactly this) and d13 (whose incremental
    * apply must reproduce it bit-for-bit).
    */
  private def ccRebuildOracle: String =
    s"""WITH RECURSIVE t AS ($shingleCte),
       sigs AS (
         SELECT doc_id, list_value(${sigEntriesSql.mkString(", ")}) AS sig
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
         SELECT r.n, e.dst FROM reach r JOIN edges e ON e.src = r.m)
       SELECT n AS doc_id, min(m) AS cluster FROM reach GROUP BY n"""

  val oracles: Map[String, String] = Map(
    "ch1_doc_chunks" ->
      """SELECT doc_id, i AS chunk_idx,
           array_to_string(w[s+1 : s+40], ' ') AS chunk_text,
           least(len(w) - s, 40)::BIGINT AS n_words
         FROM (
           SELECT doc_id, w, u.i, (u.i * 30)::INT AS s
           FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
             unnest(range((greatest(len(w) - 10 - 1, 0) // 30) + 1)) u(i))""",
    "d8_simhash_candidates" ->
      s"""WITH sh AS ($simhashCte),
         bands AS (
           SELECT doc_id, simhash, i, (simhash >> (15 * i::INT)) & 32767 AS bval
           FROM sh, unnest(range(4)) u(i))
         SELECT a, b, hamming FROM (
           SELECT DISTINCT l.doc_id AS a, r.doc_id AS b,
             bit_count(xor(l.simhash, r.simhash))::BIGINT AS hamming
           FROM bands l JOIN bands r ON l.i = r.i AND l.bval = r.bval
           WHERE l.doc_id < r.doc_id)
         WHERE hamming <= 3""",
    "d9_minhash_jaccard_est" ->
      s"""WITH t AS ($shingleCte),
         sigs AS (
           SELECT doc_id, list_value(${sigEntriesSql.mkString(", ")}) AS sig
           FROM t),
         bands AS (
           SELECT doc_id, sig, i::VARCHAR || ':' || sig[2*i + 1] || '|' || sig[2*i + 2] AS band_key
           FROM sigs, unnest(range(0, 4)) u(i))
         SELECT DISTINCT l.doc_id AS a, r.doc_id AS b,
           list_sum(list_transform(range(${sigEntriesSql.length}), i ->
             CASE WHEN l.sig[i+1] = r.sig[i+1] THEN 1 ELSE 0 END))::DOUBLE / ${sigEntriesSql.length} AS est_j
         FROM bands l JOIN bands r USING (band_key)
         WHERE l.doc_id < r.doc_id""",
    "tx16_token_entropy" ->
      """WITH words AS (
           SELECT doc_id, word
           FROM documents,
             unnest(regexp_split_to_array(lower(trim(text)), '\s+')) u(word)
           WHERE word != ''),
         wc AS (SELECT doc_id, word, count(*)::BIGINT AS c FROM words GROUP BY 1, 2),
         tot AS (SELECT doc_id, sum(c)::BIGINT AS n, count(*)::BIGINT AS n_distinct
                 FROM wc GROUP BY doc_id)
         SELECT wc.doc_id, max(tot.n) AS n_tokens, max(tot.n_distinct) AS n_distinct,
           round(-sum((c::DOUBLE / n) * ln(c::DOUBLE / n)), 6) AS entropy_nats
         FROM wc JOIN tot USING (doc_id)
         GROUP BY wc.doc_id""",
    "tx10_bigram_loglik" ->
      s"""WITH bigrams AS (
           SELECT doc_id,
             unnest(list_transform(range(len(w) - 1), i -> w[i+1] || ' ' || w[i+2])) AS bigram
           FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
           WHERE len(w) >= 2),
         profile AS (SELECT bigram, count(*)::BIGINT AS n FROM bigrams GROUP BY bigram),
         tot AS (SELECT sum(n)::BIGINT AS total FROM profile)
         SELECT doc_id, count(*)::BIGINT AS n_bigrams,
           round(avg(ln(n::DOUBLE / total::DOUBLE)), 6) AS avg_ll
         FROM bigrams JOIN profile USING (bigram) CROSS JOIN tot
         GROUP BY doc_id""",
    "d10_dedup_best_survivor" ->
      s"""WITH RECURSIVE t AS ($shingleCte),
         sigs AS (
           SELECT doc_id, list_value(${sigEntriesSql.mkString(", ")}) AS sig
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
         labels AS (SELECT n AS doc_id, min(m) AS cluster FROM reach GROUP BY n),
         labeled AS (
           SELECT d.doc_id, d.n_chars, coalesce(l.cluster, d.doc_id) AS cluster
           FROM documents d LEFT JOIN labels l ON d.doc_id = l.doc_id)
         SELECT doc_id, cluster, n_chars FROM (
           SELECT doc_id, cluster, n_chars,
             row_number() OVER (PARTITION BY cluster
                                ORDER BY n_chars DESC, doc_id ASC) AS r
           FROM labeled)
         WHERE r = 1""",
    // d25: d10's cluster derivation verbatim, then the field-wise merge —
    // max_by's key is the same zero-padded-length string both engines
    // order identically, and the provenance unions are sorted before
    // joining so set order can't differ
    "d25_golden_record" -> goldenRecordOracle,
    // d25b's oracle IS d25's full recompute over the whole corpus: the
    // incremental maintainer (standing records + arrival batch) must be
    // hash-indistinguishable from rebuilding every golden record — the
    // apply ≡ recompute contract, d13's precedent applied to survivorship
    "d25b_golden_record_incremental" -> goldenRecordOracle,
    // tx19: the same fixed parenthesization, every decimal literal cast
    // ::DOUBLE (a naked 0.01 is DECIMAL in DuckDB and its exact arithmetic
    // would diverge from the Spark side's double chain)
    "tx19_distinctive_terms" ->
      """WITH words AS (
           SELECT lang, word
           FROM documents,
             unnest(regexp_split_to_array(lower(trim(text)), '\s+')) u(word)
           WHERE word != ''),
         lw AS (SELECT lang, word, count(*)::BIGINT AS y FROM words GROUP BY 1, 2),
         pl AS (SELECT lang, sum(y)::BIGINT AS n FROM lw GROUP BY 1),
         pw AS (SELECT word, sum(y)::BIGINT AS t FROM lw GROUP BY 1),
         gl AS (SELECT sum(y)::BIGINT AS big_n,
                  count(DISTINCT word)::BIGINT AS vocab FROM lw),
         scored AS (
           SELECT lw.lang, lw.word,
             (ln((y + 0.01::DOUBLE) /
                 (n + 0.01::DOUBLE * vocab - y - 0.01::DOUBLE))
              - ln(((t - y) + 0.01::DOUBLE) /
                   ((big_n - n) + 0.01::DOUBLE * vocab - (t - y) - 0.01::DOUBLE)))
             / sqrt(1.0::DOUBLE / (y + 0.01::DOUBLE)
                    + 1.0::DOUBLE / ((t - y) + 0.01::DOUBLE)) AS z
           FROM lw JOIN pl USING (lang) JOIN pw USING (word) CROSS JOIN gl)
         SELECT lang, rank, word, z FROM (
           SELECT lang, word,
             row_number() OVER (PARTITION BY lang ORDER BY z DESC, word) AS rank,
             round(z, 6) AS z
           FROM scored)
         WHERE rank <= 3""",
    "tx9_tfidf_top_terms" ->
      """WITH words AS (
           SELECT doc_id, word
           FROM documents,
             unnest(regexp_split_to_array(lower(trim(text)), '\s+')) u(word)
           WHERE word != ''),
         tf AS (SELECT doc_id, word, count(*)::BIGINT AS tf FROM words GROUP BY 1, 2),
         dfreq AS (SELECT word, count(*)::BIGINT AS df
                   FROM (SELECT DISTINCT doc_id, word FROM words) GROUP BY 1),
         n AS (SELECT count(*)::BIGINT AS n_docs FROM documents),
         scored AS (
           SELECT doc_id, word, tf * ln(n_docs::DOUBLE / df) AS score
           FROM tf JOIN dfreq USING (word) CROSS JOIN n)
         SELECT doc_id, rank, word, score FROM (
           SELECT doc_id, word,
             row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, word) AS rank,
             round(score, 6) AS score
           FROM scored)
         WHERE rank <= 3""",
    // the oracle reads the ORIGINAL parquet — a hash match means the JSONL
    // codec round-tripped every value losslessly
    "csv1_roundtrip" ->
      """SELECT doc_id,
           'say "' || lang || '", then,' || chr(10) || source AS payload,
           n_chars
         FROM documents""",
    "js1_jsonl_roundtrip" ->
      "SELECT doc_id, text, lang, source, n_chars FROM documents",
    // same oracle as js1: the compressed round-trip must reproduce the
    // original parquet rows exactly — the codec is pure transport
    "js2_jsonl_gzip_roundtrip" ->
      "SELECT doc_id, text, lang, source, n_chars FROM documents",
    // and the same for the columnar interchange format
    "orc1_orc_roundtrip" ->
      "SELECT doc_id, text, lang, source, n_chars FROM documents",
    // one parenthesization per factor, mirrored from the Spark side; the
    // cross-term sum is three fixed left-assoc additions (never a list fold)
    "tx17_bm25_topk" ->
      """WITH words AS (
           SELECT doc_id, word
           FROM documents,
             unnest(regexp_split_to_array(lower(trim(text)), '\s+')) u(word)
           WHERE word != ''),
         lens AS (SELECT doc_id, count(*)::BIGINT AS dl FROM words GROUP BY 1),
         stats AS (SELECT count(*)::BIGINT AS n_docs, sum(dl)::BIGINT AS sum_dl FROM lens),
         tfs AS (
           SELECT doc_id,
             sum(CASE WHEN word = 'hash' THEN 1 ELSE 0 END)::BIGINT AS tf_hash,
             sum(CASE WHEN word = 'join' THEN 1 ELSE 0 END)::BIGINT AS tf_join,
             sum(CASE WHEN word = 'filter' THEN 1 ELSE 0 END)::BIGINT AS tf_filter
           FROM words WHERE word IN ('hash', 'join', 'filter') GROUP BY 1),
         dfs AS (
           SELECT sum(CASE WHEN tf_hash > 0 THEN 1 ELSE 0 END)::BIGINT AS df_hash,
             sum(CASE WHEN tf_join > 0 THEN 1 ELSE 0 END)::BIGINT AS df_join,
             sum(CASE WHEN tf_filter > 0 THEN 1 ELSE 0 END)::BIGINT AS df_filter
           FROM tfs),
         scored AS (
           SELECT t.doc_id,
             ln((n_docs - df_hash + 0.5) / (df_hash + 0.5) + 1.0) *
               ((tf_hash * 2.2) / (tf_hash + 1.2 * (0.25 + 0.75 * (dl / (sum_dl / n_docs)))))
             + ln((n_docs - df_join + 0.5) / (df_join + 0.5) + 1.0) *
               ((tf_join * 2.2) / (tf_join + 1.2 * (0.25 + 0.75 * (dl / (sum_dl / n_docs)))))
             + ln((n_docs - df_filter + 0.5) / (df_filter + 0.5) + 1.0) *
               ((tf_filter * 2.2) / (tf_filter + 1.2 * (0.25 + 0.75 * (dl / (sum_dl / n_docs))))) AS score
           FROM tfs t JOIN lens USING (doc_id) CROSS JOIN stats CROSS JOIN dfs)
         SELECT doc_id, round(score, 6) AS bm25
         FROM scored ORDER BY score DESC, doc_id LIMIT 20""",
    // the qt VALUES literal and the IN-list are emitted from the SAME
    // tx18QueryTerms value the Spark plan broadcasts; per-term scores are
    // integer-scaled (x 1e9) before the per-(query, doc) sum so the
    // variable-length term sum is exact in both engines (see the query's
    // comment), and ranking/rounding both derive from that integer
    "tx18_bm25_query_table" ->
      s"""WITH qt(query_id, term) AS (VALUES ${
            tx18QueryTerms.map { case (q, t) => s"($q, '$t')" }.mkString(", ")}),
         words AS (
           SELECT doc_id, word
           FROM documents,
             unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) u(word)
           WHERE word != ''),
         tc AS (SELECT doc_id, word, count(*)::BIGINT AS cnt FROM words GROUP BY 1, 2),
         lens AS (SELECT doc_id, sum(cnt)::BIGINT AS dl FROM tc GROUP BY 1),
         stats AS (SELECT count(*)::BIGINT AS n_docs, sum(dl)::BIGINT AS sum_dl FROM lens),
         tf AS (SELECT doc_id, word, cnt FROM tc
                WHERE word IN (${tx18QueryTerms.map(_._2).distinct
                  .map(t => s"'$t'").mkString(", ")})),
         dfs AS (SELECT word, count(*)::BIGINT AS df FROM tf GROUP BY 1),
         contrib AS (
           SELECT qt.query_id, tf.doc_id,
             round((ln((n_docs - df + 0.5) / (df + 0.5) + 1.0) *
               ((cnt * 2.2) / (cnt + 1.2 * (0.25 + 0.75 * (dl / (sum_dl / n_docs)))))) * 1e9)::BIGINT AS c
           FROM tf JOIN qt ON qt.term = tf.word JOIN lens USING (doc_id)
           CROSS JOIN stats JOIN dfs ON dfs.word = tf.word),
         scores AS (SELECT query_id, doc_id, sum(c)::BIGINT AS s_e9 FROM contrib GROUP BY 1, 2),
         ranked AS (
           SELECT query_id, doc_id, s_e9,
             row_number() OVER (PARTITION BY query_id ORDER BY s_e9 DESC, doc_id) AS rank
           FROM scores)
         SELECT query_id::BIGINT AS query_id, rank, doc_id, round(s_e9 / 1e9, 6) AS bm25
         FROM ranked WHERE rank <= 10""",
    "tx1_token_counts" ->
      """SELECT doc_id,
           len(regexp_split_to_array(trim(text), '\s+'))::BIGINT AS n_ws,
           len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]'))::BIGINT AS n_bpe
         FROM documents""",
    "tx2_quality_score" ->
      """SELECT doc_id, stop_hits,
           least(stop_hits / n_tok * 5.0, 1.0) * 0.5 + least(n_tok / 200.0, 1.0) * 0.5 AS score
         FROM (SELECT doc_id,
                 len(regexp_extract_all(lower(text), '\b(the|a|of|and|to|in|is)\b'))::BIGINT AS stop_hits,
                 len(regexp_split_to_array(trim(text), '\s+'))::DOUBLE AS n_tok
               FROM documents)""",
    "tx3_lang_id" ->
      """SELECT doc_id,
           CASE WHEN s_en >= s_de AND s_en >= s_es AND s_en >= s_fr AND s_en >= s_zh THEN 'en'
                WHEN s_de >= s_es AND s_de >= s_fr AND s_de >= s_zh THEN 'de'
                WHEN s_es >= s_fr AND s_es >= s_zh THEN 'es'
                WHEN s_fr >= s_zh THEN 'fr'
                ELSE 'zh' END AS lang_pred
         FROM (SELECT doc_id,
                 len(regexp_extract_all(lower(text), '\b(the|a|of|and|to|in|is)\b')) AS s_en,
                 len(regexp_extract_all(lower(text), '\b(der|die|das|und|ist|nicht)\b')) AS s_de,
                 len(regexp_extract_all(lower(text), '\b(el|los|las|es|una)\b')) AS s_es,
                 len(regexp_extract_all(lower(text), '\b(le|la|les|et|est|une)\b')) AS s_fr,
                 len(regexp_extract_all(lower(text), '(的|是|了|在|我)')) AS s_zh
               FROM documents)""",
    "tx4_fingerprint_bow" ->
      """SELECT doc_id,
           md5(array_to_string(list_sort(list_distinct(string_split_regex(trim(lower(text)), '\s+'))), ' ')) AS fp
         FROM documents""",
    // tx20: the lang-id CASE is GENERATED from the same langMarkers table
    // the Spark expression folds over (identical patterns, identical
    // en-wins-ties priority), applied to each half; the injected tail is
    // the same shared constant
    "tx20_mixed_lang" -> {
      def langCase(h: String): String = {
        val ms = graft.text.TextAnalysis.langMarkers
        def score(p: String) = s"len(regexp_extract_all(lower($h), '$p'))"
        val ss = ms.map { case (l, p) => l -> score(p) }
        val whens = ss.init.zipWithIndex.map { case ((l, sc), i) =>
          val conds = ss.drop(i + 1).map(_._2)
            .map(r => s"$sc >= $r").mkString(" AND ")
          s"WHEN $conds THEN '$l'"
        }.mkString("\n                ")
        s"CASE ${whens}\n                ELSE '${ss.last._1}' END"
      }
      s"""WITH m AS (
           SELECT doc_id,
             CASE WHEN doc_id % 31 = 0 THEN text || '$mixTail'
                  ELSE text END AS text
           FROM documents),
         halves AS (
           SELECT doc_id,
             substr(text, 1, (length(text) // 2)::INT) AS ha,
             substr(text, (length(text) // 2)::INT + 1) AS hb
           FROM m),
         scored AS (
           SELECT doc_id,
             ${langCase("ha")} AS lang_head,
             ${langCase("hb")} AS lang_tail
           FROM halves)
         SELECT doc_id, lang_head, lang_tail,
           lang_head != lang_tail AS is_mixed
         FROM scored"""
    },
    "d1_exact_dedup" ->
      """SELECT md5(text) AS h, min(doc_id) AS keep_id, count(*)::BIGINT AS n_dups
         FROM documents GROUP BY 1""",
    "bf1_bloom_incremental" ->
      """SELECT doc_id, lang, n_chars FROM documents d
         WHERE NOT EXISTS (SELECT 1 FROM documents p
                           WHERE p.doc_id % 3 != 0 AND md5(p.text) = md5(d.text))""",
    "d2_minhash_signature" ->
      s"""WITH t AS ($shingleCte)
         SELECT doc_id, $minhashSigExpr AS sig FROM t""",
    // d24: the same seeded-md5 signature entries, minimized per SOURCE
    // (the mergeability property: min over members ≡ signature of the
    // union), then pairwise matching-component counts / 8
    "d24_group_minhash" -> {
      // width and shingle prep both derive from the shared definitions
      // (sigEntriesSql / shingleCteFor) — one constant drives both sides
      val perDoc = sigEntriesSql.zipWithIndex
        .map { case (e, j) => s"$e AS e$j" }.mkString(",\n             ")
      val grouped = (0 until minhashWidth).map(j => s"min(e$j) AS s$j").mkString(", ")
      val matches = (0 until minhashWidth).map(j =>
        s"(CASE WHEN a.s$j = b.s$j THEN 1 ELSE 0 END)").mkString(" + ")
      s"""WITH t AS (${shingleCteFor("source")}),
         sigs AS (
           SELECT source,
             $perDoc
           FROM t),
         g AS (SELECT source, $grouped FROM sigs GROUP BY source)
         SELECT a.source AS src_a, b.source AS src_b,
           ($matches) / $minhashWidth.0 AS jaccard_est
         FROM g a JOIN g b ON a.source < b.source"""
    },
    "tx14_vocab_coverage" ->
      """WITH freqs AS (
           SELECT word, count(*)::BIGINT AS n FROM (
             SELECT unnest(string_split(text, ' ')) AS word FROM documents)
           WHERE word != '' GROUP BY word),
         tot AS (SELECT sum(n) AS t FROM freqs),
         ranked AS (
           SELECT word, n,
             sum(n) OVER (ORDER BY n DESC, word
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
           FROM freqs)
         SELECT word, n, round(cum::DOUBLE / t, 6) AS cum_share
         FROM ranked, tot
         WHERE (cum - n)::DOUBLE / t < 0.95""",
    "sp2_length_bucketed_batches" ->
      s"""WITH d AS (
           SELECT doc_id,
             len(regexp_split_to_array(trim(text), '\\s+'))::BIGINT AS n_tok
           FROM documents),
         b AS (
           SELECT doc_id, n_tok,
             length(bin(n_tok))::BIGINT AS bucket,
             doc_id % $sp1Shards AS shard
           FROM d),
         r AS (
           SELECT bucket, shard, n_tok,
             ((row_number() OVER (PARTITION BY bucket, shard ORDER BY doc_id)) - 1)
               // $sp2BatchSize AS batch
           FROM b)
         SELECT bucket, shard, batch, count(*)::BIGINT AS n_docs,
           max(n_tok) AS max_len, sum(n_tok)::BIGINT AS tok_sum,
           (count(*) * max(n_tok) - sum(n_tok))::BIGINT AS pad_waste
         FROM r GROUP BY bucket, shard, batch""",
    "sp1_sequence_packing" ->
      s"""WITH d AS (
           SELECT doc_id, doc_id % $sp1Shards AS shard,
             least(len(string_split(text, ' '))::BIGINT, 512) AS n_tok
           FROM documents),
         c AS (
           SELECT shard, doc_id, n_tok,
             sum(n_tok) OVER (PARTITION BY shard ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
           FROM d)
         SELECT shard, floor((cum - n_tok) / 512.0)::BIGINT AS bin,
           count(*)::BIGINT AS n_docs, sum(n_tok)::BIGINT AS tok_sum
         FROM c GROUP BY shard, bin""",
    "tx15_ngram_novelty" ->
      s"""WITH t AS ($shingleCte),
         e AS (SELECT DISTINCT doc_id, unnest(sh) AS g FROM t),
         f AS (SELECT g, min(doc_id) AS first_doc FROM e GROUP BY g)
         SELECT e.doc_id, count(*)::BIGINT AS n_shingles,
           sum(CASE WHEN f.first_doc = e.doc_id THEN 1 ELSE 0 END)::BIGINT AS n_novel,
           round(sum(CASE WHEN f.first_doc = e.doc_id THEN 1 ELSE 0 END)::DOUBLE
                 / count(*), 6) AS novelty
         FROM e JOIN f USING (g) GROUP BY e.doc_id""",
    "bpe1_merge_vocab" -> bpeOracle(bpeIters),
    "bpe2_encode" -> bpe2Oracle(bpeIters),
    "bpe3_tokenize" -> bpe3Oracle(bpeIters),
    "d3_lsh_candidate_pairs" -> lshPairsOracle,
    // same SQL: the bucketed layout must be invisible to results
    "d3b_lsh_candidates_persisted" -> lshPairsOracle,
    "d17_lsh_recall_audit" -> d17RecallOracle,
    "d18_lsh_precision_audit" -> d18PrecisionOracle,
    "d19_lsh_recall_sampled" -> d19RecallOracle,
    "d21_lsh_recall_variance" -> d21VarianceOracle,
    "d22_lsh_tuning_curve" -> d22TuningOracle,
    "d20_lsh_precision_sampled" -> d20PrecisionOracle,
    "d7_dedup_survivors" -> survivorsOracle,
    // the stateful (flatMapGroupsWithState) route must match the batch
    // pipeline exactly — same SQL
    "d12_survivors_incremental" -> survivorsOracle,
    "pipeline_corpus" ->
      s"""WITH RECURSIVE sig0 AS (
           SELECT doc_id,
             len(regexp_split_to_array(trim(text), '\\s+'))::BIGINT AS n_words,
             round(length(regexp_replace(text, '\\s', '', 'g'))::DOUBLE /
               len(regexp_split_to_array(trim(text), '\\s+')), 6) AS mwl,
             round((length(text) - length(regexp_replace(text, '[^A-Za-z0-9\\s]', '', 'g')))::DOUBLE /
               length(text), 6) AS sr,
             string_split(text, ' ') AS w
           FROM documents),
         base AS (
           SELECT doc_id, n_words, mwl, sr,
             CASE WHEN len(w) >= 3 THEN
               list_transform(range(len(w) - 2), i -> w[i+1] || ' ' || w[i+2] || ' ' || w[i+3])
             END AS sh
           FROM sig0),
         corpus AS (
           SELECT doc_id, n_words, sh FROM base
           WHERE doc_id >= 20 AND n_words BETWEEN 40 AND 100000
             AND mwl BETWEEN 2.0 AND 12.0 AND sr < 0.1),
         sigs AS (
           SELECT doc_id, list_value(${sigEntriesSql.mkString(", ")}) AS sig
           FROM corpus WHERE sh IS NOT NULL),
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
         dropped AS (
           SELECT n FROM reach GROUP BY n HAVING min(m) != n),
         survivors AS (
           SELECT doc_id, n_words, sh FROM corpus
           WHERE doc_id NOT IN (SELECT n FROM dropped)),
         bench AS (
           SELECT DISTINCT unnest(sh) AS g FROM base WHERE doc_id < 20),
         contaminated AS (
           SELECT DISTINCT s.doc_id
           FROM (SELECT doc_id, unnest(sh) AS g FROM survivors) s
           JOIN bench USING (g))
         SELECT doc_id, n_words FROM survivors
         WHERE doc_id NOT IN (SELECT doc_id FROM contaminated)""",
    "d6_dedup_clusters" -> ccRebuildOracle,
    // d13's oracle IS d6's full CC rebuild over the whole corpus: the
    // incremental touched-component apply must be indistinguishable from
    // recomputing every cluster from scratch
    "d13_clusters_incremental" -> ccRebuildOracle,
    "d15_containment" -> containmentOracle,
    // d16: same 8-word chunking, md5 identity, first-occurrence window
    "d16_chunk_dedup" ->
      """WITH ws AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
         chunks AS (
           SELECT doc_id, i::BIGINT AS chunk_idx,
             array_to_string(w[(i*8+1)::INT : (i*8+8)::INT], ' ') AS chunk
           FROM ws, unnest(range((len(w) - 1) // 8 + 1)) u(i)),
         ranked AS (
           SELECT doc_id, chunk_idx,
             row_number() OVER (PARTITION BY md5(chunk)
               ORDER BY doc_id, chunk_idx) AS rn
           FROM chunks)
         SELECT doc_id, count(*)::BIGINT AS n_chunks,
           sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END)::BIGINT AS n_dup_chunks
         FROM ranked GROUP BY doc_id""",
    // d23: same sliding 5-gram md5 windows, min-owner earlier-doc test,
    // gaps-and-islands span merge, spans >= 8 tokens
    "d23_substring_spans" ->
      """WITH ws AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
         wins AS (
           SELECT doc_id, i::BIGINT AS pos,
             md5(array_to_string(w[(i+1)::INT : (i+5)::INT], ' ')) AS h
           FROM ws, unnest(range(len(w) - 5 + 1)) u(i)
           WHERE len(w) >= 5),
         own AS (SELECT h, min(doc_id) AS first_id FROM wins GROUP BY h),
         dup AS (
           SELECT wins.doc_id, wins.pos FROM wins JOIN own USING (h)
           WHERE own.first_id < wins.doc_id),
         isl AS (
           SELECT doc_id, pos,
             pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
           FROM dup)
         SELECT doc_id, min(pos)::BIGINT AS start_pos,
           (max(pos) - min(pos) + 5)::BIGINT AS span_len
         FROM isl GROUP BY doc_id, grp
         HAVING (max(pos) - min(pos) + 5) >= 8""",
    "cc1_corpus_card" ->
      """WITH base AS (
           SELECT doc_id, lang, source,
             len(regexp_split_to_array(trim(text), '\s+'))::BIGINT AS n_tok,
             md5(text) AS h
           FROM documents),
         flagged AS (
           SELECT lang, source, n_tok,
             CASE WHEN count(*) OVER (PARTITION BY h) > 1 THEN 1 ELSE 0 END AS dup
           FROM base)
         SELECT lang, source, count(*)::BIGINT AS n_docs,
           sum(n_tok)::BIGINT AS total_tok,
           round(avg(n_tok), 2) AS avg_tok,
           sum(dup)::BIGINT AS n_dup_docs
         FROM flagged GROUP BY lang, source""",
    // star contraction must agree with min-label propagation on every label
    "d14_cc_largestar" -> ccRebuildOracle,
    "d4_ngram_jaccard" ->
      s"""WITH t AS ($shingleCte)
         SELECT l.doc_id AS a, r.doc_id AS b,
           len(list_distinct(list_intersect(l.sh, r.sh)))::DOUBLE /
           len(list_distinct(l.sh || r.sh))::DOUBLE AS jaccard
         FROM t l, t r
         WHERE l.doc_id < 60 AND r.doc_id < 60 AND l.doc_id < r.doc_id""",
    "d5_simhash" ->
      """SELECT doc_id,
           list_sum(list_transform(range(60), b ->
             CASE WHEN list_sum(list_transform(hs, h ->
                    CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END)) > 0
                  THEN 1::BIGINT << b ELSE 0::BIGINT END))::BIGINT AS simhash
         FROM (SELECT doc_id,
                 list_transform(string_split(text, ' '),
                   x -> ('0x' || substr(md5(x), 1, 15))::BIGINT) AS hs
               FROM documents)""",
    "tx5_winnow_fingerprint" ->
      s"""WITH t AS ($shingleCte)
         SELECT doc_id,
           array_to_string(list_sort(list_distinct(
             list_transform(range(len(hs) - 3), i -> list_min(hs[i+1:i+4])))), '|') AS fp
         FROM (SELECT doc_id, list_transform(sh, s -> substr(md5(s), 1, 15)) AS hs
               FROM t WHERE len(sh) >= 4)""",
    "tx8_bigram_profile" ->
      """SELECT lang, bigram, n, rank FROM (
           SELECT lang, bigram, count(*)::BIGINT AS n,
             row_number() OVER (PARTITION BY lang ORDER BY count(*) DESC, bigram ASC) AS rank
           FROM (
             SELECT lang, unnest(list_transform(range(len(w) - 1), i -> w[i+1] || ' ' || w[i+2])) AS bigram
             FROM (SELECT lang, string_split(text, ' ') AS w FROM documents)
             WHERE len(w) >= 2)
           GROUP BY lang, bigram)
         WHERE rank <= 3""",
    "tx6_length_histogram" ->
      """SELECT (floor(len(regexp_split_to_array(trim(text), '\s+')) / 10) * 10)::BIGINT AS bucket_lo,
           count(*)::BIGINT AS n_docs
         FROM documents GROUP BY 1""",
    "d11_decontaminate" ->
      s"""WITH t AS ($shingleCte),
         grams AS (SELECT doc_id, unnest(sh) AS g FROM t),
         bench AS (SELECT DISTINCT g FROM grams WHERE doc_id < 20)
         SELECT doc_id, count(DISTINCT g)::BIGINT AS n_shared
         FROM grams JOIN bench USING (g)
         WHERE doc_id >= 20
         GROUP BY doc_id""",
    "ch2_content_chunks" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
         flags AS (
           SELECT doc_id, i AS pos,
             CASE WHEN i >= 2 AND ('0x' || substr(md5(w[i-1] || ' ' || w[i] || ' ' || w[i+1]), 1, 15))::BIGINT % 8 = 0
                  THEN 1 ELSE 0 END AS f
           FROM t, unnest(range(len(w))) u(i)),
         chunked AS (
           SELECT doc_id, pos,
             coalesce(sum(f) OVER (PARTITION BY doc_id ORDER BY pos
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT AS chunk_idx
           FROM flags)
         SELECT doc_id, chunk_idx, count(*)::BIGINT AS n_words
         FROM chunked GROUP BY doc_id, chunk_idx""",
    "tx11_repetition_ratio" ->
      """SELECT doc_id, round(max(n)::DOUBLE / sum(n), 6) AS top_bigram_share
         FROM (
           SELECT doc_id, bg, count(*) AS n FROM (
             SELECT doc_id, unnest(list_transform(range(len(w) - 1), i -> w[i+1] || ' ' || w[i+2])) AS bg
             FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
             WHERE len(w) >= 2)
           GROUP BY doc_id, bg)
         GROUP BY doc_id""",
    "tx12_quality_gate" ->
      """SELECT doc_id, n_words, mean_word_len, symbol_ratio,
           (n_words BETWEEN 40 AND 100000
             AND mean_word_len BETWEEN 2.0 AND 12.0
             AND symbol_ratio < 0.1) AS keep
         FROM (
           SELECT doc_id,
             len(regexp_split_to_array(trim(text), '\s+'))::BIGINT AS n_words,
             round(length(regexp_replace(text, '\s', '', 'g'))::DOUBLE /
               len(regexp_split_to_array(trim(text), '\s+')), 6) AS mean_word_len,
             round((length(text) - length(regexp_replace(text, '[^A-Za-z0-9\s]', '', 'g')))::DOUBLE /
               length(text), 6) AS symbol_ratio
           FROM documents)""",
    "tx13_redact_pii" ->
      """SELECT doc_id,
           regexp_replace(
             regexp_replace(
               substr(text, 1, 80) || ' contact user' || doc_id ||
                 '@mail.example.com or https://example.org/doc/' || doc_id || '?ref=x next',
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
             'https?://[^\s]+', '<URL>', 'g') AS clean
         FROM documents WHERE doc_id < 500""",
    "tx7_stratified_sample" ->
      """SELECT doc_id, lang FROM documents
         WHERE ('0x' || substr(md5(text), 1, 15))::BIGINT % 100 <
               CASE WHEN lang = 'en' THEN 25 ELSE 75 END""",
    "mm1_binary_meta" ->
      """SELECT doc_id, octet_length(encode(text))::BIGINT AS n_bytes, sha256(text) AS digest
         FROM documents"""
  )
}
