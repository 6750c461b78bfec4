package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Checkpoints.TrackedOps

import graft.Tables
import graft.similarity.VectorOps

/** Similarity-search queries over the embeddings table. ALL carry full
  * DuckDB oracles: double math is engine-identical, and the LSH hyperplanes /
  * IVF centroids are deterministic (fixed seed / first-N-by-id), so the
  * bucket assignment replays in closed-form SQL — the plane literals are
  * emitted into the oracle from the very same [[VectorOps.randomPlanes]]
  * call the Spark plan uses.
  */
object VectorQueries {
  private type Q = (SparkSession, String) => DataFrame

  private def corpus(s: SparkSession, d: String): DataFrame = {
    graft.functions.DotProduct.register(s)
    graft.functions.L2Sq.register(s)
    Tables.embeddings(s, d).select(
      col("vec_id").as("n_id"), VectorOps.toDouble(col("embedding")).as("nv"))
  }

  /** qc1's stand-in linear model: deterministic rational weights + bias,
    * emitted identically into the Spark plan and the DuckDB oracle literal
    * (one definition, two faces — they cannot drift).
    */
  private val qcWeights: Seq[Double] =
    (0 until 64).map(i => ((i * 37) % 19 - 9) / 10.0)
  private val qcBias = -0.1

  val queries: Map[String, Q] = Map(
    // V1: brute-force cosine top-5 for the first 20 query vectors.
    "v1_knn_bruteforce" -> ((s, d) => {
      val c = corpus(s, d)
      val q = c.filter(col("n_id") < 20).select(col("n_id").as("q_id"), col("nv").as("qv"))
      VectorOps.bruteForceTopK(c, q, 5)
    }),

    // V2: embedding near-dup pairs above a cosine threshold — exact oracle
    // face, id-bounded (like d4/ld1) so the cross-join is constant-size at
    // any sf. The unbounded scale path is v2b.
    "v2_cosine_dup_pairs" -> ((s, d) =>
      VectorOps.cosineDupPairs(corpus(s, d).filter(col("n_id") < 300), 0.35)),

    // V2b: the same near-dup predicate over LSH bucket candidates — the
    // production form: candidate generation is an equi-join on bucket id,
    // never a cross-join, so it scales to the full corpus. The plane count
    // scales with the corpus (adaptivePlaneCount — expected bucket ~32
    // members at any n) and oversized buckets star-collapse (the r9 text
    // guard, vector flavor) — both replayed closed-form by the oracle.
    "v2b_cosine_dup_lsh" -> ((s, d) => {
      val c = corpus(s, d)
      VectorOps.cosineDupPairsLsh(c, dedupPlanes(c), 0.35)
    }),

    // V3: LSH-bucketed ANN (6 hyperplanes -> 64 buckets). Full closed-form
    // oracle (plane literals replayed in SQL); recall vs v1 in NorthStarSpec.
    "v3_knn_lsh" -> ((s, d) => {
      val c = corpus(s, d)
      VectorOps.lshTopK(c, c.filter(col("n_id") < qBatch), planes, 5)
    }),

    // V4: IVF ANN (corpus-scaled √n cells via ivfCells, probe 4). Full
    // closed-form oracle (kc CTE derives the same cell count; first-k
    // centroids replayed in SQL); recall vs brute force in NorthStarSpec.
    "v4_knn_ivf" -> ((s, d) => {
      val c = corpus(s, d)
      VectorOps.ivfTopK(c, c.filter(col("n_id") < qBatch),
        nCells = annCells(s, d), nProbe = 4, k = 5)
    }),

    // V20: TWO-LEVEL (IMI-style) IVF — v4's serving shape with the corpus
    // assignment restructured as a routing tree: ~√k super-centroids
    // broadcast first, then a per-super children fold reached through a
    // broadcast equi-join. Removes the flat fold's centroid-broadcast
    // ceiling (ONE k·dim array value at k = √n is multi-hundred-MB at
    // 10^10+ vectors — past Spark's per-value limits) and cuts per-row
    // assignment CPU from O(√n·dim) to O(n^(1/4)·dim). The oracle replays
    // the two-level chain closed-form (ks/scent/route/vsuper CTEs);
    // TwoLevelAssignSpec pins the fold ≡ window replay and measures the
    // fixture's flat-vs-two-level agreement.
    "v20_knn_ivf_twolevel" -> ((s, d) => {
      val c = corpus(s, d)
      val cells = annCells(s, d)
      VectorOps.ivfTopK(c, c.filter(col("n_id") < qBatch),
        nCells = cells, nProbe = 4, k = 5,
        superCells = Some(imiSuperCells(cells)))
    }),

    // V24: PROBE-INVERSION serving — v20's exact query (same cells, same
    // two-level corpus assignment, same hyperparameters) with the probe
    // join's BUILD side flipped: broadcast the bounded query batch and
    // stream the k centroid rows through the same keyed rank window.
    // Closes the last documented ANN scale ceiling (the SCALE.md
    // round-19 serving-probe audit, route (a)): at corpus-scaled
    // k = √n ≥ 10^5 centroids the flat probe builds an O(k·dim) hash
    // relation PER QUERY BATCH (~100–160 MB at n = 10^10 vectors,
    // ~0.5 GB at 10^12); inverted, nothing centroid-sized is broadcast
    // anywhere in the probe — the q·k intermediate rows shuffle by q_id
    // exactly as before. Output is bit-identical to v20 (same doubles,
    // same tie contract), so the oracle IS v20's closed form; the
    // flipped build side is plan-pinned in RegistryPlanSpec and the
    // flat-vs-inverted crossover is measured in the 100x scale legs.
    "v24_knn_ivf_inverted_probe" -> ((s, d) => {
      val c = corpus(s, d)
      val cells = annCells(s, d)
      VectorOps.ivfTopK(c, c.filter(col("n_id") < qBatch),
        nCells = cells, nProbe = 4, k = 5,
        superCells = Some(imiSuperCells(cells)),
        invertProbe = true)
    }),

    // V4b: IVF with a TRAINED quantizer — TWO deterministic Lloyd
    // refinements of the first-ivfCells(n) seed (per-cell mean centroids, rounded 6dp
    // per iteration so the SQL replay is exact), then the same 4-probe
    // search. Full closed-form oracle like v4, with the iteration CTEs
    // generated by the same loop count.
    "v4b_knn_ivf_refined" -> ((s, d) => {
      val c = corpus(s, d)
      val cells = annCells(s, d)
      // superCells: every Lloyd pass is a corpus × all-centroids
      // assignment, so the two-level routing tree applies per iteration
      // (and to the final corpus assignment) — the oracle replays it
      VectorOps.ivfTopKRefined(c, c.filter(col("n_id") < qBatch),
        nCells = cells, nProbe = 4, k = 5, iters = lloydIters,
        superCells = Some(imiSuperCells(cells)))
    }),

    // V15: FILTERED ANN — metadata-restricted nearest neighbors ("top-5
    // among even-label vectors only"), the serving face every production
    // vector store needs the moment queries carry a WHERE clause. The
    // predicate is PRE-FILTERED: pushed below the probe equi-join so each
    // query scans only the matching fraction of its nProbe inverted lists
    // — post-filtering a top-k under-fills k wherever matches are sparse,
    // and filtering before INDEXING would need one index per predicate.
    // Centroids stay the full-corpus first-ivfCells(n), so v4's geometry
    // serves this query unchanged; the oracle replays the same closed form
    // with the predicate on the corpus side.
    "v15_knn_filtered" -> ((s, d) => {
      graft.functions.DotProduct.register(s)
      graft.functions.L2Sq.register(s)
      val c = Tables.embeddings(s, d).select(
        col("vec_id").as("n_id"),
        VectorOps.toDouble(col("embedding")).as("nv"),
        col("label"))
      val q = c.filter(col("n_id") < qBatch).select(col("n_id"), col("nv"))
      VectorOps.ivfTopK(c, q, nCells = annCells(s, d), nProbe = 4, k = 5,
        corpusFilter = Some(col("label") % 2 === 0))
    }),

    // V16: MMR DIVERSIFIED RE-RANK — the last stage of a retrieval stack
    // (shortlist by relevance, then greedily trade relevance against
    // redundancy). RAG context assembly runs exactly this: an unre-ranked
    // top-k ships near-duplicate passages and starves coverage. Greedy
    // unroll of mmrK steps, each one anti-join + bounded max-sim join over
    // the |Q|×shortlist frame; the oracle replays the identical unrolled
    // greedy from the same constants (selW/divW as separate exact decimals
    // — never 1−λ, see VectorOps.mmrRerank).
    "v16_mmr_rerank" -> ((s, d) => {
      val c = corpus(s, d)
      val q = c.filter(col("n_id") < 20)
        .select(col("n_id").as("q_id"), col("nv").as("qv"))
      VectorOps.mmrRerank(c, q, mmrShortlist, mmrK, mmrSelW, mmrDivW)
    }),

    // V17: TOMBSTONED ANN — the DELETE leg of the index lifecycle (v9b
    // builds, v9c appends, v9d serves, this FORGETS): takedown/opt-out ids
    // live in a tombstone TABLE anti-joined out of the inverted lists
    // before the probe join, so serving is correct immediately, with no
    // retrain and no index rewrite (the compaction that physically drops
    // them is a maintenance job, not a serving dependency). Fixture
    // tombstones = vec_id % 13 == 0, built as a real DataFrame so the
    // plan carries the LeftAnti the production path would.
    "v17_knn_tombstoned" -> ((s, d) => {
      graft.functions.DotProduct.register(s)
      graft.functions.L2Sq.register(s)
      val c = corpus(s, d)
      val dead = c.filter(col("n_id") % 13 === 0).select("n_id")
      VectorOps.ivfTopK(c, c.filter(col("n_id") < qBatch),
        nCells = annCells(s, d), nProbe = 4, k = 5, tombstones = Some(dead))
    }),

    // V18: ACT on v11's retrain trigger — the maintenance operator that
    // CLOSES the drift loop: cells whose mean reconstruction error
    // (v11's exact metric) exceeds driftFactor x the corpus mean get a
    // CELL-LOCAL codebook (one-pass Lloyd over the cell's own sub-blocks)
    // and ONLY those cells' vectors re-encode; untouched cells keep their
    // codes verbatim (anti-join) — the d13/d25b touched-set recipe applied
    // to the index, so a quarterly drift event costs O(drifted), never an
    // O(corpus) rebuild. Output = the serving face over the mixed index
    // (base LUT for untouched cells, overlay LUT for retrained ones); the
    // oracle replays trigger, per-cell Lloyd, re-encode, and mixed ADC
    // closed-form on top of the v9 chain.
    "v18_pq_retrain_drifted" -> ((s, d) => {
      val c = corpus(s, d)
      val model = standingModel(s, d)
      val ov = VectorOps.ivfpqRetrainDrifted(c, model,
        m = pqBlocks, dsub = pqDsub, ksub = pqKsub, factor = driftFactor)
      VectorOps.ivfpqSearchOverlay(c.filter(col("n_id") < qBatch), model, ov,
        nProbe = 4, m = pqBlocks, dsub = pqDsub, k = 5)
    }),

    // V19: FILTERED + TOMBSTONED serving — v15's metadata predicate AND
    // v17's delete set in ONE query, the real production shape (a WHERE
    // clause over an index with standing takedowns). Both prune the
    // assigned corpus BELOW the probe join — the predicate filter first,
    // then the tombstone anti-join — so each probe scans only live,
    // matching inverted-list entries; composing them post-hoc would
    // under-fill k twice over. Plan-pinned in RegistryPlanSpec before
    // anyone regresses the placement.
    "v19_knn_filtered_tombstoned" -> ((s, d) => {
      graft.functions.DotProduct.register(s)
      graft.functions.L2Sq.register(s)
      val c = Tables.embeddings(s, d).select(
        col("vec_id").as("n_id"),
        VectorOps.toDouble(col("embedding")).as("nv"),
        col("label"))
      val dead = c.filter(col("n_id") % 13 === 0).select("n_id")
      val q = c.filter(col("n_id") < qBatch).select(col("n_id"), col("nv"))
      VectorOps.ivfTopK(c, q, nCells = annCells(s, d), nProbe = 4, k = 5,
        corpusFilter = Some(col("label") % 2 === 0),
        tombstones = Some(dead))
    }),

    // TT2: TIME-TRAVEL SEARCH over the VERSIONED index — the v9b/v9c
    // lifecycle re-homed onto the snapshot store (VectorIndexStore): the
    // trained model publishes as ONE atomic commit group (centroids,
    // codebook, index move in lockstep — group version 0), the arrival
    // batch appends O(batch) index rows exactly-once (group version 1),
    // and serving pins a version the way tt1 pins a table: this query
    // DIFFS the same serving batch against both versions (gained / lost /
    // kept neighbors) — the audit a production maintainer runs after
    // every index mutation ("what did this append change for live
    // queries?"). Oracle replays both searches closed-form (the v9c
    // standing-trained chain; v0 = candidates restricted to the standing
    // corpus, v1 = all) and the same full-outer diff.
    "tt2_index_time_travel" -> ((s, d) => {
      graft.functions.DotProduct.register(s)
      graft.functions.L2Sq.register(s)
      val c = corpus(s, d)
      val isNew = col("n_id") % 10 === 0
      val dir = graft.sources.Standing.artifact(s, d, "tt2_index_group") {
        val path = java.nio.file.Paths.get(freshTmpGroupDir(s, d, "tt2"))
        val standing = c.filter(!isNew)
        // two-level assignment on build AND append (one assignment
        // function per index — the v9c contract)
        val cells = ivfCells(standing.count())
        val supers = Some(imiSuperCells(cells))
        val m0 = VectorOps.ivfpqTrain(standing, nCells = cells,
          m = pqBlocks, dsub = pqDsub, ksub = pqKsub, superCells = supers)
        graft.similarity.VectorIndexStore.build(s, path.toString, m0, Some(0L))
        graft.similarity.VectorIndexStore.append(s, path.toString,
          VectorOps.ivfpqEncode(c.filter(isNew), m0, pqBlocks, pqDsub,
            superCells = supers),
          Some(1L))
        path.toString
      }
      val q = c.filter(col("n_id") < qBatch)
      def searchAt(g: Long) = VectorOps.ivfpqSearch(q,
        graft.similarity.VectorIndexStore.modelAt(s, dir, Some(g)),
        nProbe = 4, m = pqBlocks, dsub = pqDsub, k = 5)
      val r0 = searchAt(0L).select(col("q_id"), col("n_id"),
        col("rank").as("rank_v0"))
      val r1 = searchAt(1L).select(col("q_id"), col("n_id"),
        col("rank").as("rank_v1"))
      r0.join(r1, Seq("q_id", "n_id"), "full_outer")
        .select(col("q_id"), col("n_id"), col("rank_v0"), col("rank_v1"),
          when(col("rank_v0").isNull, "gained")
            .when(col("rank_v1").isNull, "lost")
            .otherwise("kept").as("status"))
    }),

    // V22: the two-level (IMI) assignment applied to the IVF-PQ BUILD —
    // v20 removed the centroid-broadcast ceiling for the flat-IVF face;
    // this closes the same ceiling for the serving family's training pass
    // (ivfpqTrain's corpus assignment is the identical foldAssign shape).
    // Codebooks, codes, and the flat bounded query probe are untouched —
    // only the inverted-list geometry routes through the tree — so the
    // oracle is v9's chain with ccell replayed two-level.
    "v22_knn_ivfpq_twolevel" -> ((s, d) => {
      graft.functions.DotProduct.register(s)
      graft.functions.L2Sq.register(s)
      val c = corpus(s, d)
      // the round-18 "v22_model" is now THE standing model: the two-level
      // build became the default posture for the whole v9d serving family,
      // so this face is the plain ADC search over the shared artifact
      VectorOps.ivfpqSearch(c.filter(col("n_id") < qBatch),
        standingModel(s, d),
        nProbe = 4, m = pqBlocks, dsub = pqDsub, k = 5)
    }),

    // V21: INDEX COMPACTION — the maintenance face that PHYSICALLY applies
    // v17's tombstones: one atomic commit group rewrites the index member
    // without the tombstoned rows and empties the tombstone set, so
    // serving afterwards carries NO anti-join at all (the round-17 gap: a
    // delete-only lifecycle anti-joins an ever-growing set on every
    // query; compaction is the amortization point — one O(index) rewrite,
    // then every query drops the prune). Old readers keep the
    // pre-compaction version through the group pin. The query serves the
    // POST-compaction index with no prune arguments; the oracle replays
    // the pre-compaction tombstone-filtered search — the hash match IS
    // "serving before ≡ after compaction". IndexLifecycleSpec pins the
    // anti-join disappearing from the post-compaction plan and the old
    // version still serving the uncompacted index.
    "v21_index_compaction" -> ((s, d) => {
      graft.functions.DotProduct.register(s)
      graft.functions.L2Sq.register(s)
      val c = corpus(s, d)
      val model = standingModel(s, d) // resolved OUTSIDE the group artifact
      val dir = graft.sources.Standing.artifact(s, d, "v21_index_group") {
        val path = freshTmpGroupDir(s, d, "v21")
        graft.similarity.VectorIndexStore.build(s, path, model, Some(0L))
        graft.similarity.VectorIndexStore.delete(s, path,
          c.filter(col("n_id") % 13 === 0).select("n_id"), Some(1L))
        graft.similarity.VectorIndexStore.compact(s, path, Some(2L))
        path
      }
      VectorOps.ivfpqSearch(c.filter(col("n_id") < qBatch),
        graft.similarity.VectorIndexStore.modelAt(s, dir),
        nProbe = 4, m = pqBlocks, dsub = pqDsub, k = 5)
    }),

    // V23: COMPACTION POLICY — the TRIGGER that decides when v21's
    // physical rewrite is worth its O(index) bill (the v11→v18
    // monitor→act pattern applied to the delete lifecycle): compact only
    // when |tombstones| crosses thresholdPct% of the live index. Two
    // takedown waves run against a fresh group — the first (the %97
    // trickle, ~1%) is HELD (decision recorded, group untouched: serving
    // keeps the cheap anti-join); the second (the %13 wave joining it,
    // ~9%) crosses 5% and fires the rewrite. Output = the decision audit,
    // one row per wave: the counts, the one-IEEE-division ratio, the
    // action, and the measured post-wave live count — the oracle replays
    // the pure-integer trigger (100·dead > 5·live) and the post-fire
    // arithmetic closed-form, so the hash match proves the rewrite
    // dropped EXACTLY the tombstone set and the hold touched nothing.
    "v23_compaction_policy" -> ((s, d) => {
      import s.implicits._
      graft.functions.DotProduct.register(s)
      graft.functions.L2Sq.register(s)
      val c = corpus(s, d)
      val model = standingModel(s, d) // resolved OUTSIDE the group artifact
      val S = graft.similarity.VectorIndexStore
      val decisions = graft.sources.Standing.artifact(s, d, "v23_decisions") {
        val path = freshTmpGroupDir(s, d, "v23")
        S.build(s, path, model, Some(0L))
        def wave(step: Long, dead: org.apache.spark.sql.Column,
            batch: Long): (Long, Long, Long, Double, String, Long) = {
          S.delete(s, path, c.filter(dead).select("n_id"), Some(batch))
          val dec = S.compactIfNeeded(s, path, thresholdPct = 5, Some(batch + 1))
          // rows ÷ |blocks|, not a corpus-wide distinct — the same
          // footer-count id arithmetic the trigger itself uses
          val idx = S.modelAt(s, path).index
          val liveAfter = idx.count() / math.max(1L,
            idx.select("b").distinct().count())
          // max(1, nLive) guards the audit ratio on an empty index (the
          // adjacent liveAfter already guards its divisor the same way);
          // nLive > 0 on every fixture wave, so the guard never changes a
          // published value — it only keeps NaN/Infinity out of the record
          (step, dec.nLive, dec.nDead,
            100.0 * dec.nDead / math.max(1L, dec.nLive),
            if (dec.compacted) "compact" else "hold", liveAfter)
        }
        Seq(
          wave(1L, col("n_id") % 97 === 0, 1L),
          wave(2L, col("n_id") % 13 === 0 || col("n_id") % 97 === 0, 3L))
      }
      decisions.toDF("step", "n_live", "n_dead", "ratio_pct", "action",
        "n_live_after")
    }),

    // TT3: TAKEDOWN AUDIT — tt2's version pin COMPOSED with v19's serving
    // prunes, on the persisted PQ index: "what did this (predicate-scoped)
    // user query see BEFORE the takedown?" The group holds build (v0,
    // trained on the standing corpus), append (v1), takedown (v2 —
    // tombstones); both legs serve with the metadata predicate semi-joined
    // and the VERSION-PINNED tombstone set anti-joined below the probe
    // join (v1 has no tombstones — pre-takedown serving needs no prune),
    // then the tt2 full-outer diff labels gained/lost/kept. The oracle
    // replays predicate + version-pinned tombstones + the ADC chain
    // closed-form; the composed-prune placement is plan-pinned in
    // RegistryPlanSpec (v19's gate, PQ-index edition).
    "tt3_takedown_audit" -> ((s, d) => {
      graft.functions.DotProduct.register(s)
      graft.functions.L2Sq.register(s)
      val c = corpus(s, d)
      val isNew = col("n_id") % 10 === 0
      val dir = graft.sources.Standing.artifact(s, d, "tt3_index_group") {
        val path = freshTmpGroupDir(s, d, "tt3")
        val standing = c.filter(!isNew)
        // two-level build + append, like tt2 (one assignment per index)
        val cells = ivfCells(standing.count())
        val supers = Some(imiSuperCells(cells))
        val m0 = VectorOps.ivfpqTrain(standing, nCells = cells,
          m = pqBlocks, dsub = pqDsub, ksub = pqKsub, superCells = supers)
        graft.similarity.VectorIndexStore.build(s, path, m0, Some(0L))
        graft.similarity.VectorIndexStore.append(s, path,
          VectorOps.ivfpqEncode(c.filter(isNew), m0, pqBlocks, pqDsub,
            superCells = supers),
          Some(1L))
        graft.similarity.VectorIndexStore.delete(s, path,
          c.filter(col("n_id") % 13 === 0).select("n_id"), Some(2L))
        path
      }
      val q = c.filter(col("n_id") < qBatch)
      val keep = Tables.embeddings(s, d).filter(col("label") % 2 === 0)
        .select(col("vec_id").as("n_id"))
      def serveAt(g: Long) = VectorOps.ivfpqSearch(q,
        graft.similarity.VectorIndexStore.modelAt(s, dir, Some(g)),
        nProbe = 4, m = pqBlocks, dsub = pqDsub, k = 5,
        corpusKeep = Some(keep),
        tombstones = graft.similarity.VectorIndexStore
          .tombstonesAt(s, dir, Some(g)))
      val pre = serveAt(1L).select(col("q_id"), col("n_id"),
        col("rank").as("rank_pre"))
      val post = serveAt(2L).select(col("q_id"), col("n_id"),
        col("rank").as("rank_post"))
      pre.join(post, Seq("q_id", "n_id"), "full_outer")
        .select(col("q_id"), col("n_id"), col("rank_pre"), col("rank_post"),
          when(col("rank_pre").isNull, "gained")
            .when(col("rank_post").isNull, "lost")
            .otherwise("kept").as("status"))
    }),

    // V6: int8 scalar-quantization audit — per-vector range + dequantization
    // MSE (shuffle-free per-row math; the go/no-go check before storing
    // embeddings at 1 byte/dim).
    "v6_quantize_stats" -> ((s, d) =>
      VectorOps.quantizeStats(corpus(s, d))),

    // V7: per-language embedding centroids — the corpus-profiling reduction
    // (language drift checks, per-slice quality probes). One equi-join to
    // attach the language, one keyed aggregation whose partials are
    // (sum-vector, count) VectorMean buffers: dim doubles per (lang,
    // partition) cross the shuffle, never per-row exploded positions. The
    // OUTPUT is exploded to scalar (lang, n_docs, dim_idx, value) rows —
    // the aggregation still moves VectorMean buffers, only the final
    // |langs|×dim result fans out (driver-side comparators can't sort
    // array columns, and 64 rows/lang is metadata-sized at any sf).
    "v7_lang_centroids" -> ((s, d) => {
      val vecMean = udaf(new graft.functions.Aggregators.VectorMean)
      val e = corpus(s, d)
      val docs = Tables.documents(s, d).select(col("doc_id"), col("lang"))
      e.join(docs, e("n_id") === docs("doc_id"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"), vecMean(col("nv")).as("mv"))
        .select(col("lang"), col("n_docs"), posexplode(col("mv")))
        .select(col("lang"), col("n_docs"),
          col("pos").cast("bigint").as("dim_idx"),
          round(col("col"), 6).as("value"))
    }),

    // QC1: model-based quality filtering — the learned-classifier face of
    // an LLM data pipeline (the heuristic face is tx2/tx12): a linear
    // classifier trained elsewhere scores every embedding and the margin
    // decides keep/drop before expensive downstream stages. Weights are a
    // deterministic compile-time stand-in (training is out of scope;
    // SERVING is the operator) emitted into the oracle as the identical
    // literal. Scale: one per-row fused dot (codegen'd dot_product) against
    // a broadcast dim-length literal — shuffle-free, linear in corpus, and
    // the keep flag prunes the corpus before anything that shuffles.
    "qc1_quality_classifier" -> ((s, d) => {
      graft.functions.DotProduct.register(s)
      val warr = array(qcWeights.map(lit): _*)
      Tables.embeddings(s, d)
        .select(col("vec_id"), col("label").cast("bigint").as("label"),
          (VectorOps.dot(VectorOps.toDouble(col("embedding")), warr) +
            lit(qcBias)).as("margin"))
        .select(col("vec_id"), col("label"),
          round(lit(1.0) / (lit(1.0) + exp(-col("margin"))), 6).as("score"),
          (col("margin") > 0).as("keep"))
    }),

    // QC2: the classifier's CALIBRATION audit — per-threshold confusion
    // counts and precision/recall/F1 against the fixture labels (positive
    // = even label, deterministic). The decision a 100 TB curation run
    // makes with this table is "which keep-threshold hits the quality/
    // volume target" BEFORE burning a full filtering pass. One scored
    // scan exploded 3x by threshold, then a 3-group aggregate —
    // shuffle-free until the final tiny groupBy. Score bit-equality with
    // the oracle is already proven by qc1 (same margin expression), so
    // the >= threshold cuts cannot straddle engines.
    "qc2_classifier_calibration" -> ((s, d) => {
      graft.functions.DotProduct.register(s)
      val warr = array(qcWeights.map(lit): _*)
      val scored = Tables.embeddings(s, d).select(
        (col("label") % 2 === 0).as("pos"),
        (lit(1.0) / (lit(1.0) + exp(-(VectorOps.dot(
          VectorOps.toDouble(col("embedding")), warr) + lit(qcBias)))))
          .as("score"))
      scored
        .select(col("pos"), col("score"),
          explode(array(Seq(0.3, 0.5, 0.7).map(lit): _*)).as("threshold"))
        .groupBy("threshold")
        .agg(
          sum(when(col("score") >= col("threshold") && col("pos"), 1L)
            .otherwise(0L)).as("tp"),
          sum(when(col("score") >= col("threshold") && !col("pos"), 1L)
            .otherwise(0L)).as("fp"),
          sum(when(col("score") < col("threshold") && col("pos"), 1L)
            .otherwise(0L)).as("fn"),
          sum(when(col("score") < col("threshold") && !col("pos"), 1L)
            .otherwise(0L)).as("tn"))
        .select(col("threshold"), col("tp"), col("fp"), col("fn"), col("tn"),
          round(col("tp") / (col("tp") + col("fp")), 6).as("precision"),
          round(col("tp") / (col("tp") + col("fn")), 6).as("recall"),
          round(lit(2.0) * col("tp") /
            (lit(2.0) * col("tp") + col("fp") + col("fn")), 6).as("f1"))
    }),

    // V8: embedding-cosine dedup SURVIVORS — the embedding analog of
    // d6/d7's cluster resolution: near-dup pairs from the LSH-bucketed
    // scale path (v2b's generator) collapse transitively to min-id
    // clusters, and the corpus keeps one vector per cluster. Oracle
    // replays the bucket pairs closed-form (same plane literals) and the
    // components as a recursive CTE.
    // Corpus-adaptive planes + the oversized-bucket star guard (see v2b)
    // keep candidate volume linear at any scale; cluster resolution is the
    // ADAPTIVE router (result-identical to plain propagation — CcRouteSpec).
    "v8_embedding_dedup" -> ((s, d) => {
      val c = corpus(s, d)
      val pairs = VectorOps.cosineDupPairsLsh(c, dedupPlanes(c), 0.35)
        .select("a", "b")
      val dropped = graft.dedup.Dedup.connectedComponentsAuto(pairs)
        .filter(col("cluster") =!= col("doc_id"))
        .select(col("doc_id").as("vec_id"))
      Tables.embeddings(s, d).select(col("vec_id"))
        .join(dropped, Seq("vec_id"), "left_anti")
    }),

    // V9: IVF-PQ — product-quantized ANN (coarse cells from v4's machinery,
    // 4 sub-blocks × 16 codewords trained with one Lloyd pass, asymmetric-
    // distance search over the stored code ids: the 16x-compressed corpus
    // representation). Full closed-form oracle: seed codebooks are the
    // first-16 sub-blocks, the Lloyd mean is 6dp-rounded, and the block
    // sum replays as list_sum(list(dp ORDER BY b)). Recall vs v1 is pinned
    // in NorthStarSpec. The query side is the FIXED qBatch serving batch
    // (see qBatch) — training/encoding still cover the whole corpus.
    "v9_knn_ivfpq" -> ((s, d) => {
      val c = corpus(s, d)
      VectorOps.ivfpqTopK(c, c.filter(col("n_id") < qBatch),
        nCells = annCells(s, d),
        nProbe = 4, m = pqBlocks, dsub = pqDsub, ksub = pqKsub, k = 5)
    }),

    // V9b: the PERSISTED IVF-PQ index — build once, query many. Training
    // and encoding run ONCE per (session, fixture) — Standing.artifact
    // gates the build, so repeated invocations (bench warm runs, repeated
    // queries) measure pure serve cost — and land in catalog tables (the
    // index bucketed on cell — the probe join's key — via
    // Storage.replaceBucketed; the broadcast-sized codebook/centroids as
    // plain sidecar tables); the search then answers from those tables with
    // a plan containing NO training stage (no VectorMean aggregate, no
    // codebook join-train) and no exchange on the bucketed index side —
    // both plan-asserted in RegistryPlanSpec. Oracle = v9's: persistence
    // must not change a single ranked neighbor.
    "v9b_knn_ivfpq_indexed" -> ((s, d) => {
      val c = corpus(s, d)
      // Table names carry a FIXTURE tag (round-8 advice): the Standing
      // cache is keyed by (session, sfDir) but globally-named tables would
      // be overwritten by a second fixture's build in the same session —
      // a later cache hit for the first fixture would then serve the other
      // fixture's index. The tag makes a cache hit only ever read tables
      // built for its own fixture.
      // full sanitized path, not a hash (round-9 review: a 32-bit
      // String.hashCode collision would resurrect the cross-fixture
      // staleness this tag exists to prevent); fixture dirs are short
      val tag = d.replaceAll("[^A-Za-z0-9]", "_")
      val (idxT, cenT, codT) =
        (s"v9b_pq_index_$tag", s"v9b_pq_centroids_$tag", s"v9b_pq_codebook_$tag")
      // cells computed BEFORE the artifact block: Standing.artifact is a
      // computeIfAbsent, and annCells itself resolves through a Standing
      // artifact (the cached corpus count) — nesting the two is a
      // recursive update on the same map (crashed the r17 scale sweep)
      val cells = annCells(s, d)
      graft.sources.Standing.artifact(s, d, "v9b_index") {
        val model = VectorOps.ivfpqTrain(c, nCells = cells,
          m = pqBlocks, dsub = pqDsub, ksub = pqKsub)
        graft.sources.Storage.replaceBucketed(model.index, idxT, "cell", 8)
        graft.sources.Storage.replaceTable(model.centroids, cenT)
        graft.sources.Storage.replaceTable(model.codebook, codT)
        java.lang.Boolean.TRUE
      }
      VectorOps.ivfpqSearch(c.filter(col("n_id") < qBatch), VectorOps.IvfPqModel(
        s.table(cenT), s.table(codT),
        s.table(idxT)), nProbe = 4, m = pqBlocks, dsub = pqDsub, k = 5)
    }),

    // V9c: INCREMENTAL index append — the maintenance half of the IVF-PQ
    // lifecycle. The model trains on the STANDING corpus only (n_id % 10
    // != 0); arrivals are encoded against that existing model (coarse
    // assign + codeword assign, NO training pass — ivfpqEncode) and their
    // index rows union in. Assignment is a pure function of (vector,
    // quantizer), so append ≡ re-encode-everything-with-the-old-model —
    // which is exactly what the oracle replays (training CTEs filtered to
    // the standing corpus, encoding/search over all vectors).
    "v9c_knn_ivfpq_append" -> ((s, d) => {
      val c = corpus(s, d)
      val isNew = col("n_id") % 10 === 0
      // The standing model is trained once per (session, fixture) and
      // pinned via eager localCheckpoint — each invocation pays only the
      // append path (encode arrivals + union + search), which is the cost
      // a production index maintainer actually pays per batch.
      // two-level (IMI) assignment on BOTH halves of the lifecycle: the
      // model trains with superCells and arrivals encode through the SAME
      // routing tree — append ≡ re-encode must hold under one assignment
      // function, and the append path is the one that runs nightly at
      // 100 TB (the round-18 centroid-broadcast ceiling, closed here)
      val standingCells = graft.sources.Standing.artifact(s, d, "v9c_cells") {
        java.lang.Integer.valueOf(ivfCells(c.filter(!isNew).count()))
      }.intValue()
      val model = graft.sources.Standing.artifact(s, d, "v9c_model") {
        val standing = c.filter(!isNew)
        val trained = VectorOps.ivfpqTrain(standing, nCells = standingCells,
          m = pqBlocks, dsub = pqDsub, ksub = pqKsub,
          superCells = Some(imiSuperCells(standingCells)))
        VectorOps.IvfPqModel(trained.centroids.localCheckpoint(),
          trained.codebook.localCheckpoint(), trained.index.localCheckpoint())
      }
      val appended = VectorOps.ivfpqEncode(c.filter(isNew), model,
        pqBlocks, pqDsub, superCells = Some(imiSuperCells(standingCells)))
      val full = VectorOps.IvfPqModel(model.centroids, model.codebook,
        model.index.unionByName(appended))
      VectorOps.ivfpqSearch(c.filter(col("n_id") < qBatch), full,
        nProbe = 4, m = pqBlocks, dsub = pqDsub, k = 5)
    }),

    // V9d: two-stage retrieval — ADC shortlist (compressed-domain, m code
    // lookups per candidate) then exact-cosine RERANK of the |Q|·20
    // survivors: the standard production IVF-PQ serving shape, recovering
    // the recall PQ loses while the corpus is never scanned uncompressed.
    // The model is the standing full-corpus artifact (Standing cache, v9c
    // pattern); the oracle replays v9's chain truncated at the shortlist
    // and re-ranks it with the exact cosine.
    "v9d_knn_ivfpq_rerank" -> ((s, d) => {
      val c = corpus(s, d)
      val model = standingModel(s, d)
      VectorOps.ivfpqRerank(c, c.filter(col("n_id") < qBatch), model,
        nProbe = 4, m = pqBlocks, dsub = pqDsub, shortlist = rerankShortlist, k = 5)
    }),

    // V9e: OPQ-lite — v9d's two-stage serving shape over a PQ index whose
    // sub-blocks slice an ENERGY-BALANCED coordinate permutation of the
    // unit vectors (VectorOps.energyBalancedPerm: the closed-form,
    // engine-replayable slice of OPQ). A permutation is orthogonal, so
    // dot products — and therefore the exact rerank stage — are unchanged;
    // what improves is the compressed-domain shortlist on anisotropic
    // corpora, at zero extra serve cost. NorthStarSpec pins same-cluster
    // share >= v9d's on the clustered fixture; the oracle replays the
    // permutation (energy/rank CTEs) and the rerank chain end-to-end.
    "v9e_knn_ivfpq_opq" -> ((s, d) => {
      val c = corpus(s, d)
      val perm = graft.sources.Standing.artifact(s, d, "v9e_perm") {
        VectorOps.energyBalancedPerm(c, pqBlocks)
      }
      val cells = annCells(s, d) // hoisted: see v9b
      val model = graft.sources.Standing.artifact(s, d, "v9e_model") {
        val t = VectorOps.ivfpqTrain(c, nCells = cells, m = pqBlocks,
          dsub = pqDsub, ksub = pqKsub, perm = perm)
        VectorOps.IvfPqModel(t.centroids.localCheckpoint(),
          t.codebook.localCheckpoint(), t.index.localCheckpoint())
      }
      VectorOps.ivfpqRerank(c, c.filter(col("n_id") < qBatch), model,
        nProbe = 4, m = pqBlocks, dsub = pqDsub, shortlist = rerankShortlist,
        k = 5, perm = perm)
    }),

    // V11: PQ drift audit over the SAME standing model v9d serves from —
    // per-cell reconstruction error (mean/max of ||u_b − codeword||² summed
    // in block order), the metric that triggers a codebook retrain when
    // the corpus drifts. Index-join + broadcast-codebook + one cell-keyed
    // aggregation; oracle replays the v9 chain through `codes` and folds
    // the same block-ordered error sum.
    "v11_pq_drift_audit" -> ((s, d) => {
      val c = corpus(s, d)
      VectorOps.pqDriftAudit(c, standingModel(s, d),
        m = pqBlocks, dsub = pqDsub)
    }),

    // KM1: spherical k-means corpus clustering — the clustering ITSELF as
    // output (vec_id → cluster + cosine to centroid), not an ANN index.
    // Same deterministic Lloyd recipe as v4b (first-16 seed, 2 iterations,
    // 6dp-rounded means), so the oracle replays it with the v4b iteration
    // CTEs. This is the partition step every cluster-based curation op
    // (sd1, per-cluster sampling, drift audits) builds on.
    "km1_kmeans_assign" -> ((s, d) =>
      VectorOps.kmeansAssign(corpus(s, d), nCells = 16, iters = lloydIters)
        .select(col("n_id").as("vec_id"), col("cell").as("cluster"), col("csim"))),

    // SD1: SemDeDup (Abbas et al., 2023) — semantic dedup via clustering:
    // k-means partitions the corpus, near-duplicate pairs are generated
    // ONLY within a cluster (the cluster id is the equi-join key — the
    // published trick that makes semantic dedup tractable: O(Σ|cell|²)
    // against centroid-bounded cells, never corpus²), transitive groups
    // collapse through the shared CC, and the corpus keeps one vector per
    // group. The embedding analog of d7 with clustering instead of LSH as
    // the blocking step; v8 is the hyperplane-bucket variant.
    "sd1_semdedup" -> ((s, d) => {
      // cell count scales with the corpus (sd1Cells: expected cell ~256
      // members → within-cell pair volume ~n·256, linear), replayed by the
      // oracle's kp CTE. The assignment itself is the SHARED standing
      // artifact (cellAssignment — v13 consumes the identical chain), so
      // the Lloyd pipeline (formerly this query's dominant cost) runs once
      // per (session, fixture), not once per consumer. Oversized cells (a
      // degenerate embedding collapsing a crawl into one cell)
      // star-collapse in guardedCosinePairs instead of expanding
      // all-pairs.
      val asg = cellAssignment(s, d)
      val pairs = VectorOps.guardedCosinePairs(asg, "cell", 0.35,
        graft.dedup.Dedup.DefaultMaxBucket, "sd1 cell pairs")
        .select("a", "b")
      // adaptive router (result-identical — CcRouteSpec) for the
      // production semantic-dedup face
      val dropped = graft.dedup.Dedup.connectedComponentsAuto(pairs)
        .filter(col("cluster") =!= col("doc_id"))
        .select(col("doc_id").as("vec_id"))
      Tables.embeddings(s, d).select(col("vec_id"))
        .join(dropped, Seq("vec_id"), "left_anti")
    }),

    // V10: IVF-PQ with RESIDUAL encoding — true IVFADC. Codebooks quantize
    // u − c_unit(cell(v)) (the within-cell spread) instead of the raw unit
    // vector, and the search scores q·x ≈ q·c_unit + Σ_b q_b·codeword —
    // the q·c_unit term is the csim the probe assignment already computed.
    // Full closed-form oracle (residual arithmetic as list CTEs before the
    // same codebook chain); recall ≥ v9's on the clustered fixture is
    // pinned in NorthStarSpec.
    "v10_knn_ivfpq_residual" -> ((s, d) => {
      val c = corpus(s, d)
      VectorOps.ivfpqSearch(c.filter(col("n_id") < qBatch),
        VectorOps.ivfpqTrain(c, nCells = annCells(s, d),
          m = pqBlocks, dsub = pqDsub, ksub = pqKsub, residual = true),
        nProbe = 4, m = pqBlocks, dsub = pqDsub, k = 5, residual = true)
    }),

    // V12: TRUNCATED-DIMENSION prefilter + exact rerank — the
    // Matryoshka-embedding serving trick: modern embedding models are
    // trained so prefixes of the vector are themselves usable embeddings,
    // so stage 1 scores the corpus on the FIRST tdim dims only (a
    // dim/tdim-times cheaper kernel and a dim/tdim-times smaller scan if
    // the prefix is stored as its own column) and stage 2 exact-reranks
    // the |Q|·shortlist survivors at full dimension. Complements the PQ
    // route (v9d): prefix truncation needs no training at all. Bounded
    // v1-shape prefilter (broadcast 20-query side) + id-keyed rerank.
    "v12_knn_truncated_rerank" -> ((s, d) => {
      val c = corpus(s, d)
      VectorOps.truncatedRerank(c, c.filter(col("n_id") < 20),
        tdim = 16, shortlist = rerankShortlist, k = 5)
    }),

    // V14: ANN RECALL AUDIT — index-quality monitoring as a first-class
    // query (the serving-side sibling of v11's PQ drift audit): for the
    // fixed 20-query batch, compare v3's LSH top-5 against v1's exact
    // top-5 and emit per-query hit counts + recall@5. A production ANN
    // deployment runs exactly this on a sampled query set to decide when
    // to re-bucket/re-train; the ground-truth side is the BOUNDED v1
    // brute force (broadcast 20-query batch — constant work at any
    // corpus), so the audit never scans corpus². Both chains are
    // closed-form in the oracle (plane literals + knn CTEs).
    "v14_recall_audit" -> ((s, d) => {
      val c = corpus(s, d)
      val q = c.filter(col("n_id") < 20)
      val exact = VectorOps.bruteForceTopK(
          c, q.select(col("n_id").as("q_id"), col("nv").as("qv")), 5)
        .select(col("q_id"), col("n_id"))
      val approx = VectorOps.lshTopK(c, q, planes, 5)
        .select(col("q_id"), col("n_id"))
      val hits = exact.join(approx, Seq("q_id", "n_id"), "left_semi")
        .groupBy("q_id").agg(count(lit(1)).as("n_hit"))
      exact.select("q_id").distinct()
        .join(hits, Seq("q_id"), "left")
        .select(col("q_id"), coalesce(col("n_hit"), lit(0L)).as("n_hit"))
        .withColumn("recall", round(col("n_hit").cast("double") / 5.0, 6))
    }),

    // V13: PROTOTYPICALITY PRUNING (Sorscher et al., "Beyond neural
    // scaling laws", NeurIPS'22 — the SSL-prototypes recipe): cluster the
    // corpus (km1's deterministic Lloyd), rank each cluster's members by
    // cosine to their centroid, and DROP the least prototypical 10% per
    // cluster — the data-curation move that prunes low-quality/outlier
    // embeddings without a labeled quality signal. The cutoff is an EXACT
    // rank (row_number over (csim asc, id), drop rank <= ceil(0.1·|cell|)),
    // not a percentile interpolation, so both engines agree bit-for-bit
    // (csim is the 6dp-rounded assignment similarity). Scale shape: the
    // allowlisted Lloyd assignment + one cell-keyed window — nothing
    // pairwise. Cell count scales with the corpus (sd1Cells, replayed by
    // the oracle's kp CTE); km1 keeps the pinned 16 as the clustering
    // oracle face.
    "v13_prototypicality_prune" -> ((s, d) => {
      // shared standing assignment (see cellAssignment): same labels as an
      // inline Lloyd chain, built once per (session, fixture)
      val asg = cellAssignment(s, d)
      val wr = org.apache.spark.sql.expressions.Window
        .partitionBy("cell").orderBy(col("csim").asc, col("n_id").asc)
      val wc = org.apache.spark.sql.expressions.Window.partitionBy("cell")
      asg.withColumn("rk", row_number().over(wr))
        .withColumn("n_cell", count(lit(1)).over(wc))
        .filter(col("rk") > ceil(col("n_cell") * lit(0.1)))
        .select(col("n_id").as("vec_id"), col("cell").as("cluster"), col("csim"))
    }),

    // V5: same brute-force top-5 as v1 but reduced by the bounded-heap TopK
    // Aggregator instead of a window — map-side partial combine keeps at
    // most k pairs per (query, partition), so the shuffle carries heaps,
    // not every scored pair (the 100 TB shape). Same oracle as v1.
    "v5_knn_topk_agg" -> ((s, d) => {
      val c = corpus(s, d)
        .withColumn("nn", VectorOps.l2norm(col("nv")))
        .repartition(s.sparkContext.defaultParallelism)
      val q = c.filter(col("n_id") < 20)
        .select(col("n_id").as("q_id"), col("nv").as("qv"), col("nn").as("qn"))
      val topk = udaf(new graft.functions.Aggregators.TopK(5))
      c.crossJoin(broadcast(q))
        .filter(col("n_id") =!= col("q_id"))
        .withColumn("cos", VectorOps.dot(col("qv"), col("nv")) / (col("qn") * col("nn")))
        .groupBy("q_id")
        .agg(topk(col("cos"), col("n_id")).as("top"))
        .select(col("q_id"), posexplode(col("top")))
        .select(col("q_id"), (col("pos") + 1).cast("bigint").as("rank"),
          col("col._2").as("n_id"), round(col("col._1"), 6).as("cos"))
    })
  )

  /** The deterministic hyperplane POOL (fixed seed): the adaptive dedup
    * generators (v2b/v8) take the first [[VectorOps.adaptivePlaneCount]]
    * planes for the current corpus size; v3's ANN face keeps the fixed
    * 6-plane prefix (bounded query batch — its per-query candidate volume
    * is linear in the corpus already, no quadratic to fix). ONE generation
    * feeds both the Spark plan and the SQL oracle literals below;
    * `randomPlanes` fills plane-by-plane from one seeded stream, so
    * `planePool.take(6)` is byte-identical to the historical
    * `randomPlanes(6, 64)`.
    */
  private val planePool: Seq[Array[Double]] =
    VectorOps.randomPlanes(VectorOps.MaxAdaptivePlanes, 64)
  private val planes: Seq[Array[Double]] = planePool.take(6)

  /** Corpus-adaptive plane prefix for the dedup generators (one count job —
    * the scalar-class driver action the Lloyd/BPE loops already use).
    */
  private def dedupPlanes(c: DataFrame): Seq[Array[Double]] =
    planePool.take(VectorOps.adaptivePlaneCount(c.count()))

  /** sd1's corpus-adaptive cell count: k = max(16, ceil(n / 256)) — the
    * expected cell stays ~256 members, so within-cell pair volume is
    * ~n·256 (linear) at any scale, while the floor keeps the verify
    * fixtures (≤ 4096 vectors) at the historical 16 cells. Pure integer
    * arithmetic, replayed closed-form by the oracle's kp CTE
    * (`greatest(16, (count(*) + 255) // 256)`). Assignment cost n·k is the
    * allowlisted broadcast pass (k = n/256 centroids ≈ 0.2% of corpus
    * bytes); a deployment past ~10^8 vectors would two-level the coarse
    * quantizer, which changes this constant, not the join shapes.
    */
  private[graft] def sd1Cells(n: Long): Int =
    math.max(16L, (n + 255L) / 256L).toInt

  /** Corpus-scaled IVF cell count for the ANN index family (v4/v4b/v15/v17
    * and every IVF-PQ face): k = max(16, ceil(√n)) — the FAISS-lineage
    * √n rule. A FIXED cell count is the serving-side scale-killer: each
    * probe scans nProbe/nCells of the corpus, so with k pinned the probed
    * inverted lists grow LINEARLY with the corpus and the index degrades
    * into a partitioned linear scan (the r14–r16 proofs measured the v9
    * family at r100 ≈ 14–18 for exactly this reason). With k = √n the
    * per-query candidate count is nProbe·√n — the classic IVF balance
    * point where assignment cost (n·k, paid at BUILD time through the
    * no-explosion [[graft.similarity.VectorOps]] foldAssign) and probe
    * cost shrink together.
    *
    * Replay: ceil/sqrt are IEEE-exact in both engines (sqrt is a correctly
    * rounded required op), so the oracle derives the IDENTICAL k
    * closed-form — the kc CTE (`greatest(16, ceil(sqrt(count(*)))`), the
    * sd1Cells/kp pattern. The floor keeps tiny corpora (n ≤ 256) at the
    * historical 16 cells. km1 deliberately KEEPS its pinned 16: its job is
    * the clustering itself, with oracle-faced fixed hyperparameters.
    */
  private[graft] def ivfCells(n: Long): Int =
    math.max(16L, math.ceil(math.sqrt(n.toDouble)).toLong).toInt

  /** v20's super-cell count: √k supers over k cells = n^(1/4) at the √n
    * geometry — the IMI balance point where the level-1 array and each
    * level-2 child array are BOTH O(n^(1/4)·dim). Floor 4 keeps the tiny
    * fixtures' routing tree non-degenerate (k = 16 → 4 supers of ~4
    * children). Replayed closed-form by the ks CTE
    * (`greatest(4, ceil(sqrt(k)))` — ceil/sqrt are IEEE-exact, the
    * [[ivfCells]] argument).
    */
  private[graft] def imiSuperCells(k: Int): Int =
    math.max(4, math.ceil(math.sqrt(k.toDouble)).toInt)

  /** A fresh per-(JVM, fixture) tmp directory for a snapshot-store group
    * artifact (tt2/tt3/v21). The path carries the applicationId: two
    * concurrent JVMs on one fixture (Bench alongside Verify) must not
    * delete the group out from under each other's pinned mid-query reads.
    * Any leftover at the same path (a crashed identical app id) is removed
    * so a previous session's group — possibly built by older code — never
    * serves this session's pinned reads, and a shutdown hook removes the
    * dir on JVM exit (the JsonlCorpus.tempCorpusDir rule: app-id-unique
    * paths never collide, so without the hook every run would leak its
    * index groups into java.io.tmpdir — round-18 review).
    */
  private def freshTmpGroupDir(s: SparkSession, d: String, name: String): String = {
    val tag = d.replaceAll("[^A-Za-z0-9]", "_")
    val app = s.sparkContext.applicationId.replaceAll("[^A-Za-z0-9]", "_")
    val path = java.nio.file.Paths.get(
      System.getProperty("java.io.tmpdir"), s"graft_${name}_${tag}_$app")
    def rmTree(): Unit = if (java.nio.file.Files.exists(path)) {
      import scala.jdk.CollectionConverters._
      val walk = java.nio.file.Files.walk(path)
      try walk.iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
      finally walk.close()
    }
    rmTree()
    Runtime.getRuntime.addShutdownHook(new Thread(() => rmTree()))
    path.toString
  }

  /** The embeddings-corpus row count, once per (session, fixture) — every
    * ANN face derives its cell count from it, and a Standing artifact makes
    * that one count job, not one per invocation.
    */
  private def corpusCount(s: SparkSession, d: String): Long =
    graft.sources.Standing.artifact(s, d, "embeddings_count") {
      java.lang.Long.valueOf(Tables.embeddings(s, d).count())
    }.longValue()

  /** The ANN faces' cell count for this fixture (Spark side of the kc CTE). */
  private def annCells(s: SparkSession, d: String): Int =
    ivfCells(corpusCount(s, d))

  /** The STANDING full-corpus IVF-PQ model — v9d/v11/v18/v21's shared
    * serving model, trained once per (session, fixture) and pinned via
    * eager localCheckpoint. ONE construction site: the Standing cache is
    * keyed by name, so two faces building "v9d_model" with drifting
    * hyperparameters would silently serve whichever ran first. Built with
    * the TWO-LEVEL (IMI) assignment (v22's centroid-broadcast-ceiling
    * removal, made the default posture for the standing model); every
    * consumer's oracle replays the two-level ccell chain.
    */
  private def standingModel(s: SparkSession, d: String): VectorOps.IvfPqModel = {
    // cells BEFORE the artifact block: Standing.artifact is a
    // computeIfAbsent and annCells resolves through one — nesting the two
    // is a recursive update on the same map (crashed the r17 scale sweep)
    val cells = annCells(s, d)
    graft.sources.Standing.artifact(s, d, "v9d_model") {
      val t = VectorOps.ivfpqTrain(corpus(s, d), nCells = cells,
        m = pqBlocks, dsub = pqDsub, ksub = pqKsub,
        superCells = Some(imiSuperCells(cells)))
      VectorOps.IvfPqModel(t.centroids.localCheckpoint(),
        t.codebook.localCheckpoint(), t.index.localCheckpoint())
    }
  }

  /** The corpus CELL ASSIGNMENT — clustering-as-infrastructure, the
    * embedding analog of the band-key index ("one index, many consumers"):
    * sd1 (SemDeDup blocking) and v13 (prototype pruning) consume the
    * IDENTICAL deterministic Lloyd chain (sd1Cells(corpus) cells,
    * lloydIters iterations), so it is built ONCE per (session, fixture)
    * and localCheckpointed (assignment rows are 3 columns per vector —
    * corpus-linear and small; Standing artifacts pin outside the
    * checkpoint tracker by design). At 100 TB this is the labels-as-
    * persisted-columns posture: the partition step runs when the corpus
    * changes, not once per curation query. Values are identical to the
    * inline chain (deterministic Lloyd: first-N seed, 6dp-rounded means),
    * so both consumers' full-rebuild oracles hold unchanged. km1 keeps its
    * OWN un-cached build face (the d3b rule — its job is to measure the
    * clustering build itself; it also pins different, oracle-faced
    * hyperparameters: fixed 16 cells).
    */
  private def cellAssignment(s: SparkSession, d: String): DataFrame =
    graft.sources.Standing.artifact(s, d, "kmeans_cell_assignment") {
      val c = corpus(s, d)
      // two-level (IMI) assignment per Lloyd pass: the curation cell count
      // is corpus-proportional (sd1Cells ≈ n/256), so the flat fold's
      // single k·dim broadcast array grows with the corpus — the same
      // ceiling v20/v22 closed for the ANN family, closed here for the
      // clustering infrastructure (sd1/v13's shared chain; both oracles
      // replay the routed assignment)
      val k = sd1Cells(c.count())
      VectorOps.kmeansAssign(c, nCells = k, iters = lloydIters,
        superCells = Some(imiSuperCells(k))).localCheckpoint()
    }

  /** Lloyd iterations for v4b — ONE constant drives both the Spark plan and
    * the generated per-iteration oracle CTEs.
    */
  private val lloydIters = 2

  /** PQ constants for v9 — ONE set of constants drives the Spark plan and
    * the oracle SQL (4 blocks × 16 dims, 16 codewords per block).
    */
  private val pqBlocks = 4
  private val pqDsub = 16
  private val pqKsub = 16

  /** The FIXED query batch for the PQ search faces (n_id < qBatch, mirrored
    * as `vec_id < qBatch` in the oracles): index search serves bounded
    * query batches, so search cost scales with the CORPUS only — a query
    * side growing with the corpus is quadratic in n, and the registry-wide
    * 10x scale run measured exactly that (v9 ratio 111 before the bound).
    * 500 covers every vector at the verify scales (sf0.001/sf0.01 have
    * ≤ 500 embeddings), so correctness output is unchanged there; at bench
    * and stress scales it is what it claims: a serving batch against a
    * full-corpus index. Corpus-vs-itself similarity is v2b/v8's LSH-pair
    * route, not the index's job.
    */
  private[graft] val qBatch = 500L

  /** v9d's rerank shortlist — ONE constant drives the Spark face and the
    * oracle's truncation CTE.
    */
  private val rerankShortlist = 20

  /** v18's retrain trigger: a cell retrains when its 6dp-rounded mean
    * reconstruction error exceeds driftFactor x the corpus mean (both
    * sides compare the SAME rounded values, so the drifted set is
    * engine-identical).
    */
  private val driftFactor = 1.25

  /** The corpus-scaled ANN cell count as SQL — the exact replay of
    * [[ivfCells]]: sqrt is a correctly rounded IEEE op in both engines, so
    * ceil(sqrt(n)) agrees bit-for-bit with the Scala side's
    * ceil(math.sqrt(n)).
    */
  private val ivfCellsSql = "greatest(16, ceil(sqrt(count(*)))::BIGINT)"

  /** [[sd1Cells]]'s replay (pure integer arithmetic). */
  private val sd1CellsSql = "greatest(16, (count(*) + 255) // 256)"

  /** kc + cent CTEs shared by every ANN oracle: derive k from the corpus
    * (optionally restricted by `where` — v9c's standing-corpus training),
    * then take the first k vectors by id as the coarse centroids. Assumes
    * a preceding `e` CTE with (vec_id, v, nrm).
    */
  private def ivfCentCtes(where: String = ""): String =
    s"""kc AS (SELECT $ivfCellsSql AS k FROM e $where),
       cent AS (SELECT vec_id AS cell, v AS cv, nrm AS cn FROM (
                  SELECT vec_id, v, nrm, row_number() OVER (ORDER BY vec_id) AS rn
                  FROM e $where)
                WHERE rn <= (SELECT k FROM kc))"""

  /** v9 oracle: the same coarse cent/ccell/qcell CTEs as v4, plus the PQ
    * chain with the block id as a plain key — seed codebooks from the
    * first-`pqKsub` sub-blocks, one Lloyd pass (6dp-rounded elementwise
    * mean), L2 codeword assignment (tie by cell), and the ADC sum replayed
    * in block order.
    *
    * `trainFilter` (v9c): when set, the coarse centroids, PQ seeds, and the
    * Lloyd training assignment draw ONLY from vec_ids matching the SQL
    * predicate — the standing corpus — while assignment/encoding/search
    * still cover every vector: the replay of encode-only index append.
    */
  private def ivfpqOracle: String = ivfpqOracleWith(None)

  /** Structured seams of the v9 oracle chain (round-18 advice: the tt2/
    * tt3/v11/v18/v9d composers consume NAMED parts instead of substring
    * landmarks on another generator's output — a rename inside one CTE can
    * no longer silently truncate a downstream oracle).
    *
    * `throughCodes` ends at the `codes` CTE (coarse cells, trained
    * codebooks, per-vector code ids); `lutCte`/`candsCte`/`adcCtes` are
    * the search stages; `finalSelect` the ranked top-k. No part carries a
    * trailing comma — composers join with ",\n".
    */
  private case class IvfpqOracleParts(throughCodes: String, lutCte: String,
      candsCte: String, adcCtes: String, finalSelect: String) {
    def full: String =
      Seq(throughCodes, lutCte, candsCte, adcCtes).mkString(",\n") + finalSelect
    /** CTEs through `lut`, comma-terminated — tt2/tt3/v18 append legs. */
    def throughLut: String = Seq(throughCodes, lutCte).mkString(",\n") + ",\n"
    /** CTEs through `adcs`, un-terminated — v9d/v9e append shortq. */
    def throughAdc: String =
      Seq(throughCodes, lutCte, candsCte, adcCtes).mkString(",\n")
  }

  /** @param candWhere extra predicate on the candidate (corpus) side of
    *                   the probe join — v21 replays "index minus the
    *                   physically compacted tombstones" with it.
    * @param twoLevel  replay the CORPUS cell assignment two-level (v22:
    *                  the v20 ks/scent/route/vsuper chain feeding ccell);
    *                  the query probe stays flat — the bounded serving
    *                  batch ranks all k cells, exactly like the Spark
    *                  side's coarseAssign.
    */
  private def ivfpqOracleWith(trainFilter: Option[String],
      permuted: Boolean = false, candWhere: String = "",
      twoLevel: Boolean = false): String =
    ivfpqOracleParts(trainFilter, permuted, candWhere, twoLevel).full

  private def ivfpqOracleParts(trainFilter: Option[String],
      permuted: Boolean = false, candWhere: String = "",
      twoLevel: Boolean = false): IvfpqOracleParts = {
    // (x-y)*(x-y), NOT ^2: DuckDB's ^ is pow(), which need not equal the
    // exact product Spark's fold computes
    def l2(sv: String, cv: String) =
      s"""list_sum(list_transform(range($pqDsub),
            i -> ($sv[i+1] - $cv[i+1]) * ($sv[i+1] - $cv[i+1])))"""
    val trainWhere = trainFilter.map(f => s"WHERE $f").getOrElse("")
    val asg1Where = trainFilter
      .map(f => s"WHERE s.vec_id IN (SELECT vec_id FROM e WHERE $f)")
      .getOrElse("")
    val throughCodes = s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v,
              sqrt(list_inner_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
            FROM embeddings),
       ${ivfCentCtes(trainWhere)},
       scored AS (
         SELECT e.vec_id, cent.cell,
           row_number() OVER (PARTITION BY e.vec_id
             ORDER BY list_inner_product(e.v, cent.cv) / (e.nrm * cent.cn) DESC,
                      cent.cell) AS r
         FROM e CROSS JOIN cent),${if (twoLevel) s"""
       ks AS (SELECT greatest(4, ceil(sqrt(k))::BIGINT) AS s FROM kc),
       scent AS (SELECT cell AS scell, cv AS scv, cn AS scn FROM (
                   SELECT cell, cv, cn,
                     row_number() OVER (ORDER BY cell) AS rn FROM cent)
                 WHERE rn <= (SELECT s FROM ks)),
       route AS (SELECT child, scell FROM (
         SELECT c.cell AS child, s.scell,
           row_number() OVER (PARTITION BY c.cell
             ORDER BY list_inner_product(c.cv, s.scv) / (c.cn * s.scn) DESC,
                      s.scell) AS r
         FROM cent c CROSS JOIN scent s) WHERE r = 1),
       vsuper AS (SELECT vec_id, scell FROM (
         SELECT e.vec_id, s.scell,
           row_number() OVER (PARTITION BY e.vec_id
             ORDER BY list_inner_product(e.v, s.scv) / (e.nrm * s.scn) DESC,
                      s.scell) AS r
         FROM e CROSS JOIN scent s) WHERE r = 1),
       ccell AS (SELECT vec_id, cell FROM (
         SELECT vs.vec_id, c.cell,
           row_number() OVER (PARTITION BY vs.vec_id
             ORDER BY list_inner_product(e2.v, c.cv) / (e2.nrm * c.cn) DESC,
                      c.cell) AS r
         FROM vsuper vs
         JOIN e e2 ON e2.vec_id = vs.vec_id
         JOIN route rt ON rt.scell = vs.scell
         JOIN cent c ON c.cell = rt.child) WHERE r = 1),""" else """
       ccell AS (SELECT vec_id, cell FROM scored WHERE r <= 1),"""}
       qcell AS (SELECT vec_id, cell FROM scored WHERE r <= 4 AND vec_id < $qBatch),
       u AS (SELECT vec_id, list_transform(v, x -> x / nrm) AS u FROM e),${
         // OPQ-lite (v9e): replay the energy-balancing permutation closed-
         // form — per-coordinate energy (4dp so both engines rank alike,
         // ties by index), rank r lands at block r % m slot r / m, and the
         // sub-blocks slice the PERMUTED unit vectors
         if (permuted) s"""
       energy AS (
         SELECT i, round(sum(u[i+1] * u[i+1]), 4) AS e
         FROM u, unnest(range(${pqBlocks * pqDsub})) t(i)
         GROUP BY i),
       rankedc AS (
         SELECT i, row_number() OVER (ORDER BY e DESC, i) - 1 AS r FROM energy),
       permt AS (
         SELECT list(i ORDER BY (r % $pqBlocks) * $pqDsub + r // $pqBlocks) AS p
         FROM rankedc),
       bu AS (
         SELECT vec_id, list_transform(range(${pqBlocks * pqDsub}), j -> u[p[j+1]+1]) AS u
         FROM u, permt),""" else ""}
       subs AS (
         SELECT vec_id, b, u[(b*$pqDsub+1)::INT : (b*$pqDsub+$pqDsub)::INT] AS sv
         FROM ${if (permuted) "bu" else "u"}, unnest(range($pqBlocks)) t(b)),
       seedids AS (SELECT vec_id FROM e $trainWhere ORDER BY vec_id LIMIT $pqKsub),
       seed AS (SELECT b, vec_id AS cell, sv AS cv FROM subs JOIN seedids USING (vec_id)),
       asg1 AS (
         SELECT vec_id, b, sv, cell FROM (
           SELECT s.vec_id, s.b, s.sv, c.cell,
             row_number() OVER (PARTITION BY s.vec_id, s.b
               ORDER BY ${l2("s.sv", "c.cv")} ASC, c.cell ASC) AS r
           FROM subs s JOIN seed c USING (b) $asg1Where)
         WHERE r = 1),
       dims1 AS (
         SELECT b, cell, i, round(avg(sv[i+1]), 6) AS mval
         FROM asg1, unnest(range($pqDsub)) t(i)
         GROUP BY b, cell, i),
       cb AS (SELECT b, cell, list(mval ORDER BY i) AS cv FROM dims1 GROUP BY b, cell),
       codes AS (
         SELECT vec_id, b, cell FROM (
           SELECT s.vec_id, s.b, c.cell,
             row_number() OVER (PARTITION BY s.vec_id, s.b
               ORDER BY ${l2("s.sv", "c.cv")} ASC, c.cell ASC) AS r
           FROM subs s JOIN cb c USING (b))
         WHERE r = 1)"""
    val lutCte = s"""lut AS (
         SELECT s.vec_id AS q_id, s.b, c.cell, list_inner_product(s.sv, c.cv) AS dp
         FROM subs s JOIN cb c USING (b))"""
    val candsCte = s"""cands AS (
         SELECT q.vec_id AS q_id, n.vec_id AS n_id
         FROM qcell q JOIN ccell n ON q.cell = n.cell AND n.vec_id != q.vec_id
         $candWhere)"""
    val adcCtes = s"""perblock AS (
         SELECT ca.q_id, ca.n_id, co.b, l.dp
         FROM cands ca
         JOIN codes co ON co.vec_id = ca.n_id
         JOIN lut l ON l.q_id = ca.q_id AND l.b = co.b AND l.cell = co.cell),
       adcs AS (
         SELECT q_id, n_id, list_sum(list(dp ORDER BY b)) AS adc
         FROM perblock GROUP BY q_id, n_id)"""
    val finalSelect = s"""
       SELECT q_id, rank, n_id, adc FROM (
         SELECT q_id, n_id,
           row_number() OVER (PARTITION BY q_id ORDER BY adc DESC, n_id) AS rank,
           round(adc, 6) AS adc
         FROM adcs)
       WHERE rank <= 5"""
    IvfpqOracleParts(throughCodes, lutCte, candsCte, adcCtes, finalSelect)
  }

  /** v11 oracle: v9's chain through the `codes` CTE (coarse cells, trained
    * codebooks, code assignments), then the per-vector block-ordered error
    * fold and the per-cell aggregation. Unreferenced CTEs after the splice
    * point are dropped by DuckDB's planner.
    */
  private def pqDriftOracle: String = {
    // twoLevel: v11 audits the STANDING model (v9d's), whose build
    // assignment is the two-level chain
    val parts = ivfpqOracleParts(None, twoLevel = true)
    parts.throughCodes + ",\n" +
      s"""perr AS (
         SELECT s.vec_id, s.b,
           list_sum(list_transform(range($pqDsub),
             i -> (s.sv[i+1] - c.cv[i+1]) * (s.sv[i+1] - c.cv[i+1]))) AS err2
         FROM subs s
         JOIN codes co ON co.vec_id = s.vec_id AND co.b = s.b
         JOIN cb c ON c.b = co.b AND c.cell = co.cell),
       verr AS (
         SELECT vec_id, list_sum(list(err2 ORDER BY b)) AS verr
         FROM perr GROUP BY vec_id)
       -- mean over micro-unit integers (exact, order-independent sums),
       -- one IEEE division — replays the Spark side's straddle-proof mean
       SELECT cc.cell, count(*)::BIGINT AS n_vectors,
         round(sum(CAST(round(verr * 1000000.0) AS BIGINT))::DOUBLE
               / count(*) / 1000000.0, 6) AS mean_err,
         round(max(verr), 6) AS max_err
       FROM verr JOIN ccell cc USING (vec_id)
       GROUP BY cc.cell"""
  }

  /** v18 oracle: v9's chain through `lut`, then the v11 error fold, the
    * rounded-mean trigger, the per-cell one-pass Lloyd retrain, the scoped
    * re-encode, and the mixed ADC (base LUT for untouched cells, overlay
    * LUT keyed by (q, cell, b, code) for drifted ones).
    */
  private def pqRetrainOracle: String = {
    def l2(sv: String, cv: String) =
      s"""list_sum(list_transform(range($pqDsub),
            i -> ($sv[i+1] - $cv[i+1]) * ($sv[i+1] - $cv[i+1])))"""
    // twoLevel: v18 retrains over the standing model's two-level index
    val parts = ivfpqOracleParts(None, twoLevel = true)
    parts.throughLut +
      s"""perr AS (
         SELECT s.vec_id, s.b,
           ${l2("s.sv", "c.cv")} AS err2
         FROM subs s
         JOIN codes co ON co.vec_id = s.vec_id AND co.b = s.b
         JOIN cb c ON c.b = co.b AND c.cell = co.cell),
       verr AS (
         SELECT vec_id, list_sum(list(err2 ORDER BY b)) AS verr
         FROM perr GROUP BY vec_id),
       -- trigger means over micro-unit integers (exact, order-independent
       -- sums; one IEEE division each) — a double avg could straddle a
       -- rounding boundary and flip whole cells between engines
       verri AS (
         SELECT vec_id, CAST(round(verr * 1000000.0) AS BIGINT) AS vi
         FROM verr),
       gerr AS (SELECT sum(vi)::DOUBLE / count(*) AS g FROM verri),
       cellerr AS (
         SELECT cc.cell, sum(vi)::DOUBLE / count(*) AS mean_vi
         FROM verri JOIN ccell cc USING (vec_id) GROUP BY cc.cell),
       drifted AS (
         SELECT cell FROM cellerr, gerr WHERE mean_vi > $driftFactor * g),
       dsubs AS (
         SELECT s.vec_id, cc.cell, s.b, s.sv
         FROM subs s
         JOIN ccell cc ON cc.vec_id = s.vec_id
         JOIN drifted dr ON dr.cell = cc.cell),
       oseedids AS (
         SELECT cell, vec_id FROM (
           SELECT cell, vec_id,
             row_number() OVER (PARTITION BY cell ORDER BY vec_id) AS rn
           FROM (SELECT DISTINCT cell, vec_id FROM dsubs))
         WHERE rn <= $pqKsub),
       oseed AS (
         SELECT d.cell, d.b, d.vec_id AS code, d.sv AS cv
         FROM dsubs d JOIN oseedids o
           ON o.cell = d.cell AND o.vec_id = d.vec_id),
       oasg AS (
         SELECT vec_id, cell, b, sv, code FROM (
           SELECT s.vec_id, s.cell, s.b, s.sv, c.code,
             row_number() OVER (PARTITION BY s.vec_id, s.b
               ORDER BY ${l2("s.sv", "c.cv")} ASC, c.code ASC) AS r
           FROM dsubs s JOIN oseed c ON c.cell = s.cell AND c.b = s.b)
         WHERE r = 1),
       odims AS (
         SELECT cell, b, code, i, round(avg(sv[i+1]), 6) AS mval
         FROM oasg, unnest(range($pqDsub)) t(i)
         GROUP BY cell, b, code, i),
       ocb AS (SELECT cell, b, code, list(mval ORDER BY i) AS cv
               FROM odims GROUP BY cell, b, code),
       ocodes AS (
         SELECT vec_id, cell, b, code FROM (
           SELECT s.vec_id, s.cell, s.b, c.code,
             row_number() OVER (PARTITION BY s.vec_id, s.b
               ORDER BY ${l2("s.sv", "c.cv")} ASC, c.code ASC) AS r
           FROM dsubs s JOIN ocb c ON c.cell = s.cell AND c.b = s.b)
         WHERE r = 1),
       ovlut AS (
         SELECT s.vec_id AS q_id, c.cell, s.b, c.code,
           list_inner_product(s.sv, c.cv) AS dp
         FROM subs s JOIN ocb c USING (b)),
       cands2 AS (
         SELECT q.vec_id AS q_id, n.vec_id AS n_id, n.cell
         FROM qcell q JOIN ccell n ON q.cell = n.cell AND n.vec_id != q.vec_id),
       pb_base AS (
         SELECT ca.q_id, ca.n_id, co.b, l.dp
         FROM cands2 ca
         JOIN codes co ON co.vec_id = ca.n_id
         JOIN lut l ON l.q_id = ca.q_id AND l.b = co.b AND l.cell = co.cell
         WHERE ca.cell NOT IN (SELECT cell FROM drifted)),
       pb_ov AS (
         SELECT ca.q_id, ca.n_id, oc.b, l.dp
         FROM cands2 ca
         JOIN ocodes oc ON oc.vec_id = ca.n_id
         JOIN ovlut l ON l.q_id = ca.q_id AND l.cell = ca.cell
           AND l.b = oc.b AND l.code = oc.code),
       adcs2 AS (
         SELECT q_id, n_id, list_sum(list(dp ORDER BY b)) AS adc
         FROM (SELECT * FROM pb_base UNION ALL SELECT * FROM pb_ov)
         GROUP BY q_id, n_id)
       SELECT q_id, rank, n_id, adc FROM (
         SELECT q_id, n_id,
           row_number() OVER (PARTITION BY q_id ORDER BY adc DESC, n_id) AS rank,
           round(adc, 6) AS adc
         FROM adcs2)
       WHERE rank <= 5"""
  }

  /** tt2 oracle: the v9c chain (standing-trained quantizers, everything
    * encoded), searched twice — v0 candidates restricted to the standing
    * corpus (the only rows version 0's index holds), v1 over all — then
    * the full-outer diff with gained/lost/kept status.
    */
  private def indexTimeTravelOracle: String = {
    // twoLevel: tt2's group is built + appended with the two-level
    // assignment against the standing-trained centroids
    val parts = ivfpqOracleParts(Some("vec_id % 10 != 0"), twoLevel = true)
    def leg(name: String, extra: String) =
      s"""cands$name AS (
           SELECT q.vec_id AS q_id, n.vec_id AS n_id
           FROM qcell q JOIN ccell n ON q.cell = n.cell AND n.vec_id != q.vec_id
           $extra),
         pb$name AS (
           SELECT ca.q_id, ca.n_id, co.b, l.dp
           FROM cands$name ca
           JOIN codes co ON co.vec_id = ca.n_id
           JOIN lut l ON l.q_id = ca.q_id AND l.b = co.b AND l.cell = co.cell),
         r$name AS (
           SELECT q_id, n_id, rank FROM (
             SELECT q_id, n_id,
               row_number() OVER (PARTITION BY q_id ORDER BY adc DESC, n_id) AS rank
             FROM (
               SELECT q_id, n_id, list_sum(list(dp ORDER BY b)) AS adc
               FROM pb$name GROUP BY q_id, n_id))
           WHERE rank <= 5)"""
    parts.throughLut +
      leg("0", "WHERE n.vec_id % 10 != 0") + ",\n" +
      leg("1", "") +
      s"""
       SELECT coalesce(r0.q_id, r1.q_id) AS q_id,
         coalesce(r0.n_id, r1.n_id) AS n_id,
         r0.rank AS rank_v0, r1.rank AS rank_v1,
         CASE WHEN r0.rank IS NULL THEN 'gained'
              WHEN r1.rank IS NULL THEN 'lost'
              ELSE 'kept' END AS status
       FROM r0 FULL OUTER JOIN r1 ON r0.q_id = r1.q_id AND r0.n_id = r1.n_id"""
  }

  /** tt3 oracle: the v9c chain (standing-trained quantizers, everything
    * encoded), searched at both post-append versions with the metadata
    * predicate on the candidate side — the pre-takedown leg (v1) carries
    * only the predicate, the post-takedown leg (v2) adds the tombstone
    * rule — then the tt2 full-outer diff.
    */
  private def takedownAuditOracle: String = {
    // twoLevel: tt3's group shares tt2's two-level build + append
    val parts = ivfpqOracleParts(Some("vec_id % 10 != 0"), twoLevel = true)
    val keepSql =
      "n.vec_id IN (SELECT vec_id FROM embeddings WHERE label % 2 = 0)"
    def leg(name: String, where: String) =
      s"""cands$name AS (
           SELECT q.vec_id AS q_id, n.vec_id AS n_id
           FROM qcell q JOIN ccell n ON q.cell = n.cell AND n.vec_id != q.vec_id
           WHERE $where),
         pb$name AS (
           SELECT ca.q_id, ca.n_id, co.b, l.dp
           FROM cands$name ca
           JOIN codes co ON co.vec_id = ca.n_id
           JOIN lut l ON l.q_id = ca.q_id AND l.b = co.b AND l.cell = co.cell),
         r$name AS (
           SELECT q_id, n_id, rank FROM (
             SELECT q_id, n_id,
               row_number() OVER (PARTITION BY q_id ORDER BY adc DESC, n_id) AS rank
             FROM (
               SELECT q_id, n_id, list_sum(list(dp ORDER BY b)) AS adc
               FROM pb$name GROUP BY q_id, n_id))
           WHERE rank <= 5)"""
    parts.throughLut +
      leg("pre", keepSql) + ",\n" +
      leg("post", s"$keepSql AND n.vec_id % 13 != 0") +
      s"""
       SELECT coalesce(rpre.q_id, rpost.q_id) AS q_id,
         coalesce(rpre.n_id, rpost.n_id) AS n_id,
         rpre.rank AS rank_pre, rpost.rank AS rank_post,
         CASE WHEN rpre.rank IS NULL THEN 'gained'
              WHEN rpost.rank IS NULL THEN 'lost'
              ELSE 'kept' END AS status
       FROM rpre FULL OUTER JOIN rpost
         ON rpre.q_id = rpost.q_id AND rpre.n_id = rpost.n_id"""
  }

  /** v9d oracle: v9's chain truncated to the ADC shortlist, then the exact
    * cosine re-ranks the |Q|·shortlist surviving pairs (the rerank stage's
    * whole contract: recover exact ordering on the compressed-domain
    * shortlist).
    */
  private def ivfpqRerankOracle(shortlist: Int, k: Int,
      permuted: Boolean = false, twoLevel: Boolean = false): String = {
    val parts = ivfpqOracleParts(None, permuted, twoLevel = twoLevel)
    parts.throughAdc +
      s""", shortq AS (
         SELECT q_id, n_id FROM (
           SELECT q_id, n_id,
             row_number() OVER (PARTITION BY q_id ORDER BY adc DESC, n_id) AS r
           FROM adcs)
         WHERE r <= $shortlist)
       SELECT q_id, rank, n_id, cos FROM (
         SELECT s.q_id, s.n_id,
           row_number() OVER (PARTITION BY s.q_id
             ORDER BY list_inner_product(q.v, n.v) / (q.nrm * n.nrm) DESC,
                      s.n_id) AS rank,
           round(list_inner_product(q.v, n.v) / (q.nrm * n.nrm), 6) AS cos
         FROM shortq s
         JOIN e q ON q.vec_id = s.q_id
         JOIN e n ON n.vec_id = s.n_id)
       WHERE rank <= $k"""
  }

  /** v10 oracle: ivfpqOracle with the PQ chain running over RESIDUALS
    * (u − cell-unit-centroid, as list arithmetic CTEs) and the ADC sum
    * opening with the query·cell term — qcell's sim column IS q·c_unit, so
    * the replay is `max(qc) + list_sum(list(dp ORDER BY b))`, matching the
    * Spark side's `qc + fold(0.0)(+)` addition order exactly.
    */
  private def ivfpqResidualOracle: String = {
    def l2(sv: String, cv: String) =
      s"""list_sum(list_transform(range($pqDsub),
            i -> ($sv[i+1] - $cv[i+1]) * ($sv[i+1] - $cv[i+1])))"""
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v,
              sqrt(list_inner_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
            FROM embeddings),
       ${ivfCentCtes()},
       scored AS (
         SELECT e.vec_id, cent.cell,
           list_inner_product(e.v, cent.cv) / (e.nrm * cent.cn) AS sim,
           row_number() OVER (PARTITION BY e.vec_id
             ORDER BY list_inner_product(e.v, cent.cv) / (e.nrm * cent.cn) DESC,
                      cent.cell) AS r
         FROM e CROSS JOIN cent),
       ccell AS (SELECT vec_id, cell FROM scored WHERE r <= 1),
       qcell AS (SELECT vec_id, cell, sim FROM scored
                 WHERE r <= 4 AND vec_id < $qBatch),
       u AS (SELECT vec_id, list_transform(v, x -> x / nrm) AS u FROM e),
       cu AS (SELECT cell, list_transform(cv, x -> x / cn) AS cuv FROM cent),
       ru AS (
         SELECT u.vec_id,
           list_transform(range(${pqBlocks * pqDsub}), i -> u.u[i+1] - cu.cuv[i+1]) AS u
         FROM u JOIN ccell ON u.vec_id = ccell.vec_id
                JOIN cu ON ccell.cell = cu.cell),
       rsubs AS (
         SELECT vec_id, b, u[(b*$pqDsub+1)::INT : (b*$pqDsub+$pqDsub)::INT] AS sv
         FROM ru, unnest(range($pqBlocks)) t(b)),
       qsubs AS (
         SELECT vec_id, b, u[(b*$pqDsub+1)::INT : (b*$pqDsub+$pqDsub)::INT] AS sv
         FROM u, unnest(range($pqBlocks)) t(b)),
       seedids AS (SELECT vec_id FROM e ORDER BY vec_id LIMIT $pqKsub),
       seed AS (SELECT b, vec_id AS cell, sv AS cv FROM rsubs JOIN seedids USING (vec_id)),
       asg1 AS (
         SELECT vec_id, b, sv, cell FROM (
           SELECT s.vec_id, s.b, s.sv, c.cell,
             row_number() OVER (PARTITION BY s.vec_id, s.b
               ORDER BY ${l2("s.sv", "c.cv")} ASC, c.cell ASC) AS r
           FROM rsubs s JOIN seed c USING (b))
         WHERE r = 1),
       dims1 AS (
         SELECT b, cell, i, round(avg(sv[i+1]), 6) AS mval
         FROM asg1, unnest(range($pqDsub)) t(i)
         GROUP BY b, cell, i),
       cb AS (SELECT b, cell, list(mval ORDER BY i) AS cv FROM dims1 GROUP BY b, cell),
       codes AS (
         SELECT vec_id, b, cell FROM (
           SELECT s.vec_id, s.b, c.cell,
             row_number() OVER (PARTITION BY s.vec_id, s.b
               ORDER BY ${l2("s.sv", "c.cv")} ASC, c.cell ASC) AS r
           FROM rsubs s JOIN cb c USING (b))
         WHERE r = 1),
       lut AS (
         SELECT s.vec_id AS q_id, s.b, c.cell, list_inner_product(s.sv, c.cv) AS dp
         FROM qsubs s JOIN cb c USING (b)),
       cands AS (
         SELECT q.vec_id AS q_id, n.vec_id AS n_id, q.sim AS qc
         FROM qcell q JOIN ccell n ON q.cell = n.cell AND n.vec_id != q.vec_id),
       perblock AS (
         SELECT ca.q_id, ca.n_id, ca.qc, co.b, l.dp
         FROM cands ca
         JOIN codes co ON co.vec_id = ca.n_id
         JOIN lut l ON l.q_id = ca.q_id AND l.b = co.b AND l.cell = co.cell),
       adcs AS (
         SELECT q_id, n_id, max(qc) + list_sum(list(dp ORDER BY b)) AS adc
         FROM perblock GROUP BY q_id, n_id)
       SELECT q_id, rank, n_id, adc FROM (
         SELECT q_id, n_id,
           row_number() OVER (PARTITION BY q_id ORDER BY adc DESC, n_id) AS rank,
           round(adc, 6) AS adc
         FROM adcs)
       WHERE rank <= 5"""
  }

  /** The shared Lloyd-training CTE chain (v4b / km1 / sd1): cent0 =
    * first-K seed; cent{j} = per-cell 6dp-rounded mean over the assignment
    * to cent{j-1}. Returns the CTE body WITHOUT the `WITH` keyword so
    * callers can prepend `WITH` or `WITH RECURSIVE` as needed.
    *
    * `kSql` (None = the pinned 16 km1 keeps for its oracle-faced fixed
    * hyperparameters): the seed count K as a SQL aggregate over the corpus —
    * sd1/v13 pass the [[sd1Cells]] replay (expected cell ~256 members),
    * v4b passes the [[ivfCells]] √n replay — emitted as the kp CTE so the
    * engine derives the IDENTICAL count closed-form.
    *
    * `twoLevel` (requires `kSql`): replay EVERY iteration's assignment —
    * and hand `finAssignCte(twoLevel = true)` its routing tree — through
    * the v20/v22 two-level chain (supers = first ks of the CURRENT
    * centroids by cell id, each centroid routes to its nearest super, each
    * vector takes its nearest super then the best child within it), the
    * exact replay of [[graft.similarity.VectorOps.foldAssignTwoLevel]]
    * threaded through the Lloyd loop. The super count ks derives from kp
    * once ([[imiSuperCells]]'s `greatest(4, ceil(sqrt(k)))`).
    */
  private def lloydCtes(iters: Int, kSql: Option[String] = None,
      twoLevel: Boolean = false): String = {
    require(!twoLevel || kSql.isDefined, "twoLevel needs the kp CTE")
    val head = kSql match {
      case Some(k) =>
        s"""e AS (SELECT vec_id, embedding::DOUBLE[] AS v,
                sqrt(list_inner_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
              FROM embeddings),
         kp AS (SELECT $k AS k FROM embeddings),${if (twoLevel) """
         ks AS (SELECT greatest(4, ceil(sqrt(k))::BIGINT) AS s FROM kp),""" else ""}
         cent0 AS (SELECT vec_id AS cell, v AS cv, nrm AS cn FROM (
                     SELECT vec_id, v, nrm,
                       row_number() OVER (ORDER BY vec_id) AS rn FROM e)
                   WHERE rn <= (SELECT k FROM kp))"""
      case None =>
        s"""e AS (SELECT vec_id, embedding::DOUBLE[] AS v,
                sqrt(list_inner_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
              FROM embeddings),
         cent0 AS (SELECT vec_id AS cell, v AS cv, nrm AS cn
                   FROM e ORDER BY vec_id LIMIT 16)"""
    }
    val iterations = (1 to iters).map { j =>
      val assignment =
        if (twoLevel) twoLevelAssignCtes(s"cent${j - 1}", s"_$j",
          s"""asg$j AS (SELECT vec_id, v, nrm, cell
               FROM fin_$j WHERE r = 1)""")
        else s"""score$j AS (
           SELECT e.vec_id, e.v, e.nrm, c.cell,
             row_number() OVER (PARTITION BY e.vec_id
               ORDER BY list_inner_product(e.v, c.cv) / (e.nrm * c.cn) DESC,
                        c.cell) AS r
           FROM e CROSS JOIN cent${j - 1} c),
         asg$j AS (SELECT vec_id, v, nrm, cell FROM score$j WHERE r = 1)"""
      s""",
         $assignment,
         dims$j AS (
           SELECT cell, i, round(avg(v[i+1]), 6) AS m
           FROM asg$j, unnest(range(len(v))) u(i)
           GROUP BY cell, i),
         cent$j AS (
           SELECT cell, list(m ORDER BY i) AS cv,
             sqrt(list_inner_product(list(m ORDER BY i), list(m ORDER BY i))) AS cn
           FROM dims$j GROUP BY cell)"""
    }.mkString
    head + iterations
  }

  /** The two-level assignment of every corpus vector against `cents`,
    * suffix-tagged so one oracle can replay it per Lloyd iteration:
    * scent$sfx (first ks supers by cell id), route$sfx (centroid → nearest
    * super), vsuper$sfx (vector → nearest super), fin$sfx (vector scored
    * against its super's children; r = 1 is the assignment) — then `tail`,
    * the caller's consuming CTE. Ties at both levels: sim DESC, id ASC —
    * the fold contract, applied twice.
    */
  private def twoLevelAssignCtes(cents: String, sfx: String,
      tail: String): String =
    s"""scent$sfx AS (SELECT cell AS scell, cv AS scv, cn AS scn FROM (
             SELECT cell, cv, cn,
               row_number() OVER (ORDER BY cell) AS rn FROM $cents)
           WHERE rn <= (SELECT s FROM ks)),
         route$sfx AS (SELECT child, scell FROM (
           SELECT c.cell AS child, s.scell,
             row_number() OVER (PARTITION BY c.cell
               ORDER BY list_inner_product(c.cv, s.scv) / (c.cn * s.scn) DESC,
                        s.scell) AS r
           FROM $cents c CROSS JOIN scent$sfx s) WHERE r = 1),
         vsuper$sfx AS (SELECT vec_id, v, nrm, scell FROM (
           SELECT e.vec_id, e.v, e.nrm, s.scell,
             row_number() OVER (PARTITION BY e.vec_id
               ORDER BY list_inner_product(e.v, s.scv) / (e.nrm * s.scn) DESC,
                        s.scell) AS r
           FROM e CROSS JOIN scent$sfx s) WHERE r = 1),
         fin$sfx AS (
           SELECT vs.vec_id, vs.v, vs.nrm, c.cell,
             list_inner_product(vs.v, c.cv) / (vs.nrm * c.cn) AS sim,
             row_number() OVER (PARTITION BY vs.vec_id
               ORDER BY list_inner_product(vs.v, c.cv) / (vs.nrm * c.cn) DESC,
                        c.cell) AS r
           FROM vsuper$sfx vs
           JOIN route$sfx rt ON rt.scell = vs.scell
           JOIN $cents c ON c.cell = rt.child),
         $tail"""

  /** Final-iteration assignment CTE (`fin`): every vector scored against
    * cent{iters} with its per-vector rank — r = 1 is the k-means label.
    * `twoLevel` replays the assignment through the routing tree (r is then
    * the rank WITHIN the routed super's children — r = 1 is still the
    * label and sim its cosine, but r > 1 covers only that super).
    */
  private def finAssignCte(iters: Int, twoLevel: Boolean = false): String =
    if (twoLevel)
      twoLevelAssignCtes(s"cent$iters", "_f",
        s"""fin AS (SELECT vec_id, v, nrm, cell, sim, r FROM fin_f)""")
    else
      s"""fin AS (
         SELECT e.vec_id, e.v, e.nrm, c.cell,
           list_inner_product(e.v, c.cv) / (e.nrm * c.cn) AS sim,
           row_number() OVER (PARTITION BY e.vec_id
             ORDER BY list_inner_product(e.v, c.cv) / (e.nrm * c.cn) DESC,
                      c.cell) AS r
         FROM e CROSS JOIN cent$iters c)"""

  /** v4b oracle: the shared Lloyd chain — every iteration's assignment AND
    * the final corpus assignment replayed two-level (the Spark face threads
    * superCells through ivfTopKRefined) — then search probes cent{iters}
    * with the flat bounded query window, exactly like the Spark side.
    */
  private def ivfRefinedOracle(iters: Int): String =
    s"""WITH ${lloydCtes(iters, Some(ivfCellsSql), twoLevel = true)},
         ${finAssignCte(iters, twoLevel = true)},
         ccell AS (SELECT vec_id, v, nrm, cell FROM fin WHERE r = 1),
         qscore AS (
           SELECT e.vec_id, e.v, e.nrm, c.cell,
             row_number() OVER (PARTITION BY e.vec_id
               ORDER BY list_inner_product(e.v, c.cv) / (e.nrm * c.cn) DESC,
                        c.cell) AS r
           FROM e CROSS JOIN cent$iters c
           WHERE e.vec_id < $qBatch),
         qcell AS (SELECT vec_id, v, nrm, cell FROM qscore WHERE r <= 4)
         SELECT q_id, rank, n_id, cos FROM (
           SELECT q.vec_id AS q_id, n.vec_id AS n_id,
             row_number() OVER (PARTITION BY q.vec_id
                                ORDER BY $pairCos DESC, n.vec_id) AS rank,
             round($pairCos, 6) AS cos
           FROM qcell q JOIN ccell n ON q.cell = n.cell AND n.vec_id != q.vec_id)
         WHERE rank <= 5"""

  /** km1 oracle: the shared Lloyd chain, then the r = 1 assignment. */
  private def kmeansOracle(iters: Int): String =
    s"""WITH ${lloydCtes(iters)},
       ${finAssignCte(iters)}
       SELECT vec_id, cell AS cluster, round(sim, 6) AS csim
       FROM fin WHERE r = 1"""

  /** sd1 oracle: Lloyd chain + assignment, within-cluster cosine pairs,
    * recursive-CTE connected components (the v8/d6 replay), survivors.
    */
  private def semdedupOracle(iters: Int): String =
    s"""WITH RECURSIVE ${lloydCtes(iters, Some(sd1CellsSql), twoLevel = true)},
       ${finAssignCte(iters, twoLevel = true)},
       asg AS (SELECT vec_id, v, nrm, cell FROM fin WHERE r = 1),
       pairs AS (
         SELECT a.vec_id AS a, b.vec_id AS b
         FROM asg a JOIN asg b ON a.cell = b.cell AND a.vec_id < b.vec_id
         WHERE list_inner_product(a.v, b.v) / (a.nrm * b.nrm) >= 0.35),
       edges AS (SELECT a AS src, b AS dst FROM pairs UNION ALL SELECT b, a FROM pairs),
       nodes AS (SELECT DISTINCT src AS node FROM edges),
       reach(n, m) AS (
         SELECT node, node FROM nodes
         UNION
         SELECT r.n, e2.dst FROM reach r JOIN edges e2 ON e2.src = r.m),
       dropped AS (SELECT n FROM reach GROUP BY n HAVING min(m) != n)
       SELECT vec_id FROM embeddings
       WHERE vec_id NOT IN (SELECT n FROM dropped)"""

  // v16's greedy contract — shared by the Spark face and the oracle
  // generator. selW/divW are separate exact decimals (1 − 0.7 is
  // 0.30000000000000004 as a double; the SQL literal 0.3 would diverge).
  private val mmrShortlist = 10
  private val mmrK = 3
  private val mmrSelW = 0.7
  private val mmrDivW = 0.3

  private val eCte = "SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings"
  private val cosExpr =
    """list_inner_product(a.v, b.v) /
       (sqrt(list_inner_product(a.v, a.v)) * sqrt(list_inner_product(b.v, b.v)))"""

  /** A plane as a DuckDB DOUBLE[] literal. Scala's Double.toString is the
    * shortest round-trip decimal repr, so DuckDB parses back the identical
    * binary double and the sign-bit bucket replay is exact.
    */
  private def planeLit(p: Array[Double]): String =
    p.mkString("[", ", ", "]::DOUBLE[]")

  /** Replay of [[VectorOps.lshBucket]]: sum of sign bits ≙ when(dot>0, 2^i). */
  private def bucketSql(vCol: String): String =
    planes.zipWithIndex.map { case (p, i) =>
      s"(CASE WHEN list_inner_product($vCol, ${planeLit(p)}) > 0 THEN ${1L << i} ELSE 0 END)"
    }.mkString("(", " + ", ")")

  /** Bucketed corpus CTE for the v3 oracle: per-row norm + fixed-6-plane
    * bucket (the ANN face keeps the pinned prefix — see planePool).
    */
  private def bucketedCte: String =
    s"""WITH e AS ($eCte),
       bk AS (SELECT vec_id, v, sqrt(list_inner_product(v, v)) AS nrm,
                ${bucketSql("v")} AS bucket
              FROM e)"""

  /** The corpus-adaptive plane count as SQL — the exact integer replay of
    * [[VectorOps.adaptivePlaneCount]]: p = clamp(6, maxPlanes,
    * bits(ceilDiv(n, targetBucket) − 1)), with bits via length(bin(m))
    * (= 64 − numberOfLeadingZeros(m) for m ≥ 1; the greatest(0, ·) guard
    * makes the n = 0 edge read bin(0) — one digit — exactly like the Scala
    * side's max(1, ·) floor, both landing on the 6-plane minimum).
    */
  private def adaptivePlaneCountSql: String =
    s"""least(${VectorOps.MaxAdaptivePlanes}, greatest(6,
        length(bin(greatest(0,
          (count(*) + ${VectorOps.LshTargetBucket - 1}) // ${VectorOps.LshTargetBucket} - 1)))))"""

  /** Replay of the adaptive bucket: every pool plane contributes its sign
    * bit only while its index is below the derived count `pp.p` — at the
    * verify fixtures p = 6, so the value equals the fixed-6-plane bucket.
    */
  private def adaptiveBucketSql(vCol: String): String =
    planePool.zipWithIndex.map { case (p, i) =>
      s"""(CASE WHEN $i < pp.p AND list_inner_product($vCol, ${planeLit(p)}) > 0
           THEN ${1L << i} ELSE 0 END)"""
    }.mkString("(", " + ", ")")

  /** Adaptive-plane bucketed corpus CTEs (v2b/v8): the pp CTE derives the
    * plane count from the corpus size; bk buckets with exactly those planes.
    */
  private def adaptiveBucketedCtes: String =
    s"""e AS ($eCte),
       pp AS (SELECT $adaptivePlaneCountSql AS p FROM embeddings),
       bk AS (SELECT vec_id, v, sqrt(list_inner_product(v, v)) AS nrm,
                ${adaptiveBucketSql("v")} AS bucket
              FROM e, pp)"""

  private val pairCos = "list_inner_product(q.v, n.v) / (q.nrm * n.nrm)"
  // (knnOracle below is shared by v1 and v5 — identical semantics, different
  // physical reduction.)

  private val knnOracle =
    s"""WITH e AS ($eCte)
       SELECT q_id, rank, n_id, cos FROM (
         SELECT a.vec_id AS q_id, b.vec_id AS n_id,
           row_number() OVER (PARTITION BY a.vec_id ORDER BY $cosExpr DESC, b.vec_id) AS rank,
           round($cosExpr, 6) AS cos
         FROM e a, e b
         WHERE a.vec_id < 20 AND b.vec_id != a.vec_id)
       WHERE rank <= 5"""

  private val oracles0: Map[String, String] = Map(
    "qc1_quality_classifier" -> {
      val wLit = qcWeights.mkString("[", ", ", "]")
      s"""SELECT vec_id, label::BIGINT AS label,
           round(1.0 / (1.0 + exp(-(list_inner_product(embedding::DOUBLE[],
             $wLit::DOUBLE[]) + ($qcBias)))), 6) AS score,
           (list_inner_product(embedding::DOUBLE[], $wLit::DOUBLE[])
             + ($qcBias)) > 0 AS keep
         FROM embeddings"""
    },
    "qc2_classifier_calibration" -> {
      val wLit = qcWeights.mkString("[", ", ", "]")
      s"""WITH s AS (
           SELECT (label % 2 = 0) AS pos,
             1.0 / (1.0 + exp(-(list_inner_product(embedding::DOUBLE[],
               $wLit::DOUBLE[]) + ($qcBias)))) AS score
           FROM embeddings),
         t AS (SELECT unnest([0.3, 0.5, 0.7]) AS threshold),
         c AS (
           SELECT threshold,
             sum(CASE WHEN score >= threshold AND pos THEN 1 ELSE 0 END)::BIGINT AS tp,
             sum(CASE WHEN score >= threshold AND NOT pos THEN 1 ELSE 0 END)::BIGINT AS fp,
             sum(CASE WHEN score < threshold AND pos THEN 1 ELSE 0 END)::BIGINT AS fn,
             sum(CASE WHEN score < threshold AND NOT pos THEN 1 ELSE 0 END)::BIGINT AS tn
           FROM s, t GROUP BY threshold)
         SELECT threshold, tp, fp, fn, tn,
           round(tp / (tp + fp), 6) AS precision,
           round(tp / (tp + fn), 6) AS recall,
           round(2.0 * tp / (2.0 * tp + fp + fn), 6) AS f1
         FROM c"""
    },
    "v6_quantize_stats" ->
      s"""WITH e AS ($eCte)
         SELECT vec_id AS n_id,
           round(list_min(v), 6) AS q_min,
           round(list_max(v), 6) AS q_max,
           round(list_sum(list_transform(
             list_transform(v, x ->
               x - (CASE WHEN list_max(v) = list_min(v) THEN list_min(v)
                    ELSE list_min(v) + floor((x - list_min(v)) / ((list_max(v) - list_min(v)) / 255.0) + 0.5)
                           * ((list_max(v) - list_min(v)) / 255.0) END)),
             y -> y * y)) / len(v), 12) AS mse
         FROM e""",
    "v5_knn_topk_agg" -> knnOracle,
    "v12_knn_truncated_rerank" ->
      s"""WITH e AS ($eCte),
         t AS (SELECT vec_id, v[1:16] AS tv FROM e),
         sl AS (
           SELECT q_id, n_id FROM (
             SELECT a.vec_id AS q_id, b.vec_id AS n_id,
               row_number() OVER (PARTITION BY a.vec_id
                 ORDER BY list_inner_product(a.tv, b.tv) /
                   (sqrt(list_inner_product(a.tv, a.tv)) *
                    sqrt(list_inner_product(b.tv, b.tv))) DESC, b.vec_id) AS r
             FROM t a JOIN t b ON b.vec_id != a.vec_id
             WHERE a.vec_id < 20)
           WHERE r <= $rerankShortlist)
         SELECT q_id, rank, n_id, cos FROM (
           SELECT s.q_id, s.n_id,
             row_number() OVER (PARTITION BY s.q_id
               ORDER BY list_inner_product(q.v, n.v) /
                 (sqrt(list_inner_product(q.v, q.v)) *
                  sqrt(list_inner_product(n.v, n.v))) DESC, s.n_id) AS rank,
             round(list_inner_product(q.v, n.v) /
               (sqrt(list_inner_product(q.v, q.v)) *
                sqrt(list_inner_product(n.v, n.v))), 6) AS cos
           FROM sl s
           JOIN e q ON q.vec_id = s.q_id
           JOIN e n ON n.vec_id = s.n_id)
         WHERE rank <= 5""",
    "v7_lang_centroids" ->
      s"""WITH joined AS (
           SELECT lang, embedding::DOUBLE[] AS v
           FROM embeddings JOIN documents ON vec_id = doc_id),
         cnt AS (SELECT lang, count(*)::BIGINT AS n_docs FROM joined GROUP BY lang),
         dims AS (
           SELECT lang, i::BIGINT AS dim_idx, round(avg(v[i+1]), 6) AS value
           FROM joined, unnest(range(len(v))) u(i)
           GROUP BY lang, i)
         SELECT lang, n_docs, dim_idx, value FROM cnt JOIN dims USING (lang)""",
    "v1_knn_bruteforce" ->
      s"""WITH e AS ($eCte)
         SELECT q_id, rank, n_id, cos FROM (
           SELECT a.vec_id AS q_id, b.vec_id AS n_id,
             row_number() OVER (PARTITION BY a.vec_id ORDER BY $cosExpr DESC, b.vec_id) AS rank,
             round($cosExpr, 6) AS cos
           FROM e a, e b
           WHERE a.vec_id < 20 AND b.vec_id != a.vec_id)
         WHERE rank <= 5""",
    // v16: the same unrolled greedy from the same constants. The score is
    // deliberately UNROUNDED on both sides: over 6dp-rounded rel/sim it is
    // bit-exact across engines, while rounding it hits decimal ties where
    // the engines' tie-break modes differ (see VectorOps.mmrRerank).
    "v16_mmr_rerank" -> {
      def sim(a: String, b: String) =
        s"""round(list_inner_product($a.v, $b.v) /
            (sqrt(list_inner_product($a.v, $a.v)) *
             sqrt(list_inner_product($b.v, $b.v))), 6)"""
      val head =
        s"""WITH e AS ($eCte),
           sl AS (
             SELECT q_id, n_id, rel FROM (
               SELECT a.vec_id AS q_id, b.vec_id AS n_id,
                 round($cosExpr, 6) AS rel,
                 row_number() OVER (PARTITION BY a.vec_id
                                    ORDER BY $cosExpr DESC, b.vec_id) AS r
               FROM e a, e b
               WHERE a.vec_id < 20 AND b.vec_id != a.vec_id)
             WHERE r <= $mmrShortlist),
           sel1 AS (
             SELECT q_id, n_id, rel, $mmrSelW * rel AS score,
               1::BIGINT AS step
             FROM (
               SELECT q_id, n_id, rel,
                 row_number() OVER (PARTITION BY q_id
                   ORDER BY $mmrSelW * rel DESC, n_id) AS r
               FROM sl) WHERE r = 1)"""
      val steps = (2 to mmrK).map { t =>
        s""",
           c$t AS (
             SELECT sl.q_id, sl.n_id, sl.rel FROM sl
             LEFT JOIN sel${t - 1} s ON s.q_id = sl.q_id AND s.n_id = sl.n_id
             WHERE s.n_id IS NULL),
           ms$t AS (
             SELECT c.q_id, c.n_id, c.rel, max(${sim("nv", "sv")}) AS max_sim
             FROM c$t c
             JOIN sel${t - 1} s ON s.q_id = c.q_id
             JOIN e nv ON nv.vec_id = c.n_id
             JOIN e sv ON sv.vec_id = s.n_id
             GROUP BY c.q_id, c.n_id, c.rel),
           pick$t AS (
             SELECT q_id, n_id, rel,
               $mmrSelW * rel - $mmrDivW * max_sim AS score,
               $t::BIGINT AS step
             FROM (
               SELECT q_id, n_id, rel, max_sim,
                 row_number() OVER (PARTITION BY q_id
                   ORDER BY $mmrSelW * rel - $mmrDivW * max_sim DESC,
                            n_id) AS r
               FROM ms$t) WHERE r = 1),
           sel$t AS (SELECT * FROM sel${t - 1} UNION ALL SELECT * FROM pick$t)"""
      }.mkString
      head + steps +
        s"""
           SELECT q_id, step, n_id, rel, score FROM sel$mmrK"""
    },
    "v2_cosine_dup_pairs" ->
      s"""WITH e AS ($eCte)
         SELECT a.vec_id AS a, b.vec_id AS b, round($cosExpr, 6) AS cos
         FROM e a, e b
         WHERE a.vec_id < 300 AND b.vec_id < 300
           AND a.vec_id < b.vec_id AND $cosExpr >= 0.35""",
    "v2b_cosine_dup_lsh" ->
      s"""WITH $adaptiveBucketedCtes
         SELECT q.vec_id AS a, n.vec_id AS b, round($pairCos, 6) AS cos
         FROM bk q JOIN bk n ON q.bucket = n.bucket AND q.vec_id < n.vec_id
         WHERE $pairCos >= 0.35""",
    "v8_embedding_dedup" ->
      s"""WITH RECURSIVE $adaptiveBucketedCtes,
         pairs AS (
           SELECT q.vec_id AS a, n.vec_id AS b
           FROM bk q JOIN bk n ON q.bucket = n.bucket AND q.vec_id < n.vec_id
           WHERE $pairCos >= 0.35),
         edges AS (SELECT a AS src, b AS dst FROM pairs UNION ALL SELECT b, a FROM pairs),
         nodes AS (SELECT DISTINCT src AS node FROM edges),
         reach(n, m) AS (
           SELECT node, node FROM nodes
           UNION
           SELECT r.n, e2.dst FROM reach r JOIN edges e2 ON e2.src = r.m),
         dropped AS (SELECT n FROM reach GROUP BY n HAVING min(m) != n)
         SELECT vec_id FROM embeddings
         WHERE vec_id NOT IN (SELECT n FROM dropped)""",
    "v3_knn_lsh" ->
      s"""$bucketedCte
         SELECT q_id, rank, n_id, cos FROM (
           SELECT q.vec_id AS q_id, n.vec_id AS n_id,
             row_number() OVER (PARTITION BY q.vec_id
                                ORDER BY $pairCos DESC, n.vec_id) AS rank,
             round($pairCos, 6) AS cos
           FROM bk q JOIN bk n ON q.bucket = n.bucket AND n.vec_id != q.vec_id
           WHERE q.vec_id < $qBatch)
         WHERE rank <= 5""",
    // v14: the v1 exact chain and the v3 LSH chain (both bounded to the
    // 20-query batch), joined into per-query hit counts
    "v14_recall_audit" ->
      s"""$bucketedCte,
         exact AS (
           SELECT q_id, n_id FROM (
             SELECT a.vec_id AS q_id, b.vec_id AS n_id,
               row_number() OVER (PARTITION BY a.vec_id
                 ORDER BY $cosExpr DESC, b.vec_id) AS rank
             FROM e a, e b
             WHERE a.vec_id < 20 AND b.vec_id != a.vec_id)
           WHERE rank <= 5),
         approx AS (
           SELECT q_id, n_id FROM (
             SELECT q.vec_id AS q_id, n.vec_id AS n_id,
               row_number() OVER (PARTITION BY q.vec_id
                 ORDER BY $pairCos DESC, n.vec_id) AS rank
             FROM bk q JOIN bk n ON q.bucket = n.bucket AND n.vec_id != q.vec_id
             WHERE q.vec_id < 20)
           WHERE rank <= 5),
         hits AS (
           SELECT q_id, count(*)::BIGINT AS n_hit
           FROM exact JOIN approx USING (q_id, n_id) GROUP BY q_id)
         SELECT q.q_id, coalesce(h.n_hit, 0)::BIGINT AS n_hit,
           round(coalesce(h.n_hit, 0) / 5.0, 6) AS recall
         FROM (SELECT DISTINCT q_id FROM exact) q LEFT JOIN hits h USING (q_id)""",
    "v4b_knn_ivf_refined" -> ivfRefinedOracle(lloydIters),
    "km1_kmeans_assign" -> kmeansOracle(lloydIters),
    // v13: the adaptive-cell Lloyd chain + the exact per-cell
    // prototypicality rank
    "v13_prototypicality_prune" ->
      s"""WITH ${lloydCtes(lloydIters, Some(sd1CellsSql), twoLevel = true)},
         ${finAssignCte(lloydIters, twoLevel = true)},
         asg AS (SELECT vec_id, cell, round(sim, 6) AS csim FROM fin WHERE r = 1),
         sized AS (
           SELECT vec_id, cell, csim,
             row_number() OVER (PARTITION BY cell ORDER BY csim, vec_id) AS rk,
             count(*) OVER (PARTITION BY cell) AS n_cell
           FROM asg)
         SELECT vec_id, cell AS cluster, csim FROM sized
         WHERE rk > ceil(n_cell * 0.1)""",
    "sd1_semdedup" -> semdedupOracle(lloydIters),
    "v18_pq_retrain_drifted" -> pqRetrainOracle,
    "tt2_index_time_travel" -> indexTimeTravelOracle,
    // v21: serving AFTER compaction carries no prune — the oracle replays
    // the PRE-compaction tombstone-filtered search, so the hash match IS
    // the "before ≡ after" equivalence the compaction must preserve
    "v21_index_compaction" ->
      ivfpqOracleWith(None, candWhere = "WHERE n.vec_id % 13 != 0",
        twoLevel = true),
    "tt3_takedown_audit" -> takedownAuditOracle,
    // v23: the trigger arithmetic closed-form — integer counts, the
    // pure-integer fire rule (100·dead > 5·live), ONE IEEE division for
    // the ratio (100.0·d then /n, the Spark side's operation order —
    // deliberately unrounded: identical integers in, identical double
    // out), and the post-wave live count (hold: unchanged; fire: n − dead)
    "v23_compaction_policy" ->
      s"""WITH c AS (SELECT count(*)::BIGINT AS n FROM embeddings),
         d1 AS (SELECT count(*)::BIGINT AS d FROM embeddings
                WHERE vec_id % 97 = 0),
         d2 AS (SELECT count(*)::BIGINT AS d FROM embeddings
                WHERE vec_id % 13 = 0 OR vec_id % 97 = 0)
         SELECT 1::BIGINT AS step, c.n AS n_live, d1.d AS n_dead,
           100.0 * d1.d / c.n AS ratio_pct,
           CASE WHEN 100 * d1.d > 5 * c.n THEN 'compact' ELSE 'hold' END
             AS action,
           CASE WHEN 100 * d1.d > 5 * c.n THEN c.n - d1.d ELSE c.n END
             AS n_live_after
         FROM c, d1
         UNION ALL
         SELECT 2::BIGINT, c.n, d2.d,
           100.0 * d2.d / c.n,
           CASE WHEN 100 * d2.d > 5 * c.n THEN 'compact' ELSE 'hold' END,
           CASE WHEN 100 * d2.d > 5 * c.n THEN c.n - d2.d ELSE c.n END
         FROM c, d2""",
    "v22_knn_ivfpq_twolevel" -> ivfpqOracleWith(None, twoLevel = true),
    // v19: v15's closed form with BOTH serving-time prunes on the corpus
    // side after assignment, before the probe — predicate and tombstones
    "v19_knn_filtered_tombstoned" ->
      s"""WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v,
                sqrt(list_inner_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
              FROM embeddings),
         ${ivfCentCtes()},
         scored AS (
           SELECT e.vec_id, e.label, e.v, e.nrm, cent.cell,
             row_number() OVER (PARTITION BY e.vec_id
               ORDER BY list_inner_product(e.v, cent.cv) / (e.nrm * cent.cn) DESC,
                        cent.cell) AS r
           FROM e CROSS JOIN cent),
         ccell AS (SELECT vec_id, v, nrm, cell FROM scored
                   WHERE r <= 1 AND label % 2 = 0 AND vec_id % 13 != 0),
         qcell AS (SELECT vec_id, v, nrm, cell FROM scored
                   WHERE r <= 4 AND vec_id < $qBatch)
         SELECT q_id, rank, n_id, cos FROM (
           SELECT q.vec_id AS q_id, n.vec_id AS n_id,
             row_number() OVER (PARTITION BY q.vec_id
                                ORDER BY $pairCos DESC, n.vec_id) AS rank,
             round($pairCos, 6) AS cos
           FROM qcell q JOIN ccell n ON q.cell = n.cell AND n.vec_id != q.vec_id)
         WHERE rank <= 5""",
    // twoLevel: the standing model's build assignment is the two-level
    // chain; serving (LUT, probe, rerank) replays flat as before
    "v9d_knn_ivfpq_rerank" -> ivfpqRerankOracle(rerankShortlist, 5,
      twoLevel = true),
    "v9e_knn_ivfpq_opq" -> ivfpqRerankOracle(rerankShortlist, 5, permuted = true),
    "v11_pq_drift_audit" -> pqDriftOracle,
    "v9_knn_ivfpq" -> ivfpqOracle,
    // layout must not change results: the persisted-index face replays v9's
    // closed-form oracle verbatim
    "v9b_knn_ivfpq_indexed" -> ivfpqOracle,
    // training restricted to the standing corpus, encoding/search over all:
    // the hash match proves append(train(old), new) ≡ encode-all(train(old))
    // — now under the two-level assignment on BOTH build and append
    "v9c_knn_ivfpq_append" -> ivfpqOracleWith(Some("vec_id % 10 != 0"),
      twoLevel = true),
    "v10_knn_ivfpq_residual" -> ivfpqResidualOracle,
    "v4_knn_ivf" ->
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v,
                sqrt(list_inner_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
              FROM embeddings),
         ${ivfCentCtes()},
         scored AS (
           SELECT e.vec_id, e.v, e.nrm, cent.cell,
             row_number() OVER (PARTITION BY e.vec_id
               ORDER BY list_inner_product(e.v, cent.cv) / (e.nrm * cent.cn) DESC,
                        cent.cell) AS r
           FROM e CROSS JOIN cent),
         ccell AS (SELECT vec_id, v, nrm, cell FROM scored WHERE r <= 1),
         qcell AS (SELECT vec_id, v, nrm, cell FROM scored
                   WHERE r <= 4 AND vec_id < $qBatch)
         SELECT q_id, rank, n_id, cos FROM (
           SELECT q.vec_id AS q_id, n.vec_id AS n_id,
             row_number() OVER (PARTITION BY q.vec_id
                                ORDER BY $pairCos DESC, n.vec_id) AS rank,
             round($pairCos, 6) AS cos
           FROM qcell q JOIN ccell n ON q.cell = n.cell AND n.vec_id != q.vec_id)
         WHERE rank <= 5""",
    // v20: v4's closed form with the CORPUS assignment replayed two-level
    // (IMI): super-centroids = first ks of the k centroids; each centroid
    // routes to its nearest super; each vector takes its nearest super,
    // then the best child WITHIN that super. Query probe stays flat (the
    // bounded serving batch ranks all k cells). Ties: sim DESC then id
    // ASC at every level — the fold contract applied twice.
    "v20_knn_ivf_twolevel" ->
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v,
                sqrt(list_inner_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
              FROM embeddings),
         ${ivfCentCtes()},
         ks AS (SELECT greatest(4, ceil(sqrt(k))::BIGINT) AS s FROM kc),
         scent AS (SELECT cell AS scell, cv AS scv, cn AS scn FROM (
                     SELECT cell, cv, cn,
                       row_number() OVER (ORDER BY cell) AS rn FROM cent)
                   WHERE rn <= (SELECT s FROM ks)),
         route AS (SELECT child, scell FROM (
           SELECT c.cell AS child, s.scell,
             row_number() OVER (PARTITION BY c.cell
               ORDER BY list_inner_product(c.cv, s.scv) / (c.cn * s.scn) DESC,
                        s.scell) AS r
           FROM cent c CROSS JOIN scent s) WHERE r = 1),
         vsuper AS (SELECT vec_id, v, nrm, scell FROM (
           SELECT e.vec_id, e.v, e.nrm, s.scell,
             row_number() OVER (PARTITION BY e.vec_id
               ORDER BY list_inner_product(e.v, s.scv) / (e.nrm * s.scn) DESC,
                        s.scell) AS r
           FROM e CROSS JOIN scent s) WHERE r = 1),
         ccell AS (SELECT vec_id, v, nrm, cell FROM (
           SELECT vs.vec_id, vs.v, vs.nrm, c.cell,
             row_number() OVER (PARTITION BY vs.vec_id
               ORDER BY list_inner_product(vs.v, c.cv) / (vs.nrm * c.cn) DESC,
                        c.cell) AS r
           FROM vsuper vs
           JOIN route rt ON rt.scell = vs.scell
           JOIN cent c ON c.cell = rt.child) WHERE r = 1),
         qscored AS (
           SELECT e.vec_id, e.v, e.nrm, cent.cell,
             row_number() OVER (PARTITION BY e.vec_id
               ORDER BY list_inner_product(e.v, cent.cv) / (e.nrm * cent.cn) DESC,
                        cent.cell) AS r
           FROM e CROSS JOIN cent
           WHERE e.vec_id < $qBatch),
         qcell AS (SELECT vec_id, v, nrm, cell FROM qscored WHERE r <= 4)
         SELECT q_id, rank, n_id, cos FROM (
           SELECT q.vec_id AS q_id, n.vec_id AS n_id,
             row_number() OVER (PARTITION BY q.vec_id
                                ORDER BY $pairCos DESC, n.vec_id) AS rank,
             round($pairCos, 6) AS cos
           FROM qcell q JOIN ccell n ON q.cell = n.cell AND n.vec_id != q.vec_id)
         WHERE rank <= 5""",
    // v17: v4's closed form with the tombstone set removed from the corpus
    // side after assignment, before the probe — the oracle inlines the
    // fixture's id rule where the Spark plan anti-joins a real table
    "v17_knn_tombstoned" ->
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v,
                sqrt(list_inner_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
              FROM embeddings),
         ${ivfCentCtes()},
         scored AS (
           SELECT e.vec_id, e.v, e.nrm, cent.cell,
             row_number() OVER (PARTITION BY e.vec_id
               ORDER BY list_inner_product(e.v, cent.cv) / (e.nrm * cent.cn) DESC,
                        cent.cell) AS r
           FROM e CROSS JOIN cent),
         ccell AS (SELECT vec_id, v, nrm, cell FROM scored
                   WHERE r <= 1 AND vec_id % 13 != 0),
         qcell AS (SELECT vec_id, v, nrm, cell FROM scored
                   WHERE r <= 4 AND vec_id < $qBatch)
         SELECT q_id, rank, n_id, cos FROM (
           SELECT q.vec_id AS q_id, n.vec_id AS n_id,
             row_number() OVER (PARTITION BY q.vec_id
                                ORDER BY $pairCos DESC, n.vec_id) AS rank,
             round($pairCos, 6) AS cos
           FROM qcell q JOIN ccell n ON q.cell = n.cell AND n.vec_id != q.vec_id)
         WHERE rank <= 5""",
    // v15: v4's closed form with the metadata predicate applied to the
    // corpus side AFTER cell assignment (cell geometry = full corpus),
    // BEFORE the probe join — exactly where the Spark face pre-filters
    "v15_knn_filtered" ->
      s"""WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v,
                sqrt(list_inner_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
              FROM embeddings),
         ${ivfCentCtes()},
         scored AS (
           SELECT e.vec_id, e.label, e.v, e.nrm, cent.cell,
             row_number() OVER (PARTITION BY e.vec_id
               ORDER BY list_inner_product(e.v, cent.cv) / (e.nrm * cent.cn) DESC,
                        cent.cell) AS r
           FROM e CROSS JOIN cent),
         ccell AS (SELECT vec_id, v, nrm, cell FROM scored
                   WHERE r <= 1 AND label % 2 = 0),
         qcell AS (SELECT vec_id, v, nrm, cell FROM scored
                   WHERE r <= 4 AND vec_id < $qBatch)
         SELECT q_id, rank, n_id, cos FROM (
           SELECT q.vec_id AS q_id, n.vec_id AS n_id,
             row_number() OVER (PARTITION BY q.vec_id
                                ORDER BY $pairCos DESC, n.vec_id) AS rank,
             round($pairCos, 6) AS cos
           FROM qcell q JOIN ccell n ON q.cell = n.cell AND n.vec_id != q.vec_id)
         WHERE rank <= 5"""
  )

  /** v24 is v20 with the probe join's BUILD side flipped (broadcast the
    * bounded query batch, stream the k centroids) — a PLAN-ONLY change:
    * same cosine expression on the same doubles, same (csim DESC, cell
    * ASC) tie contract, bit-identical output. Its closed form therefore
    * IS v20's; the inverted plan shape is pinned in RegistryPlanSpec.
    */
  val oracles: Map[String, String] =
    oracles0 + ("v24_knn_ivf_inverted_probe" -> oracles0("v20_knn_ivf_twolevel"))
}
