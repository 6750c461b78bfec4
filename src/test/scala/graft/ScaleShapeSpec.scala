package graft

/** Plan-shape stability ACROSS SCALES for the query registry: each query
  * planned against sf0.001 and sf0.01 (a 10x span) must not grow any
  * quadratic join — the failure mode where a side that broadcast at toy
  * scale silently plans a CartesianProduct / BroadcastNestedLoopJoin once
  * it outgrows the threshold. Broadcast→shuffled-join flips are legitimate
  * scale adaptation and are NOT forbidden here; quadratic growth is.
  *
  * Coverage split (so `sbt test` stays minutes, not half an hour): queries
  * whose CONSTRUCTION already executes driver-side work — the CC-iterating
  * dedup family, the k-means-training vector family, bucketed-write faces
  * (measured 8–141 s each at local[4], ~700 s summed, vs < 4 s for every
  * other query) — are excluded here and covered by the per-round
  * `graft.ScaleStress` full-registry run instead, which applies the SAME
  * shapeOf check to their EXECUTED (AQE-resolved) plans at sf0.1 vs
  * 10x-replicated sf0.1 — a larger span than this spec's. Between the two,
  * every registry query has a cross-scale quadratic-shape proof; the
  * allowlisted bounded-quadratic faces are additionally pinned per-plan in
  * RegistryPlanSpec.
  */
class ScaleShapeSpec extends SparkSpec {

  private val quadratic = Seq("CartesianProduct", "BroadcastNestedLoopJoin")

  /** Construction executes driver-side iteration/training/writes (measured
    * construction+planning cost at local[4], both dirs, in parentheses);
    * cross-scale shape for these is asserted by ScaleStress's full run.
    */
  private val heavyConstruction: Set[String] = Set(
    "v8_embedding_dedup",       // (141 s) LSH pairs -> CC iterations
    "sd1_semdedup",             // k-means training + within-cluster CC iterations
    "d15_containment",          // checkpointed candidate pairs + shingle sets
    "v10_knn_ivfpq_residual",   // (80 s) coarse + residual codebook training
    "d13_clusters_incremental", // (57 s) CC + touched-component recompute
    "d6_dedup_clusters",        // (50 s) CC iterations
    "spl2_leakage_safe_split",  // d6's CC iterations + label join
    "d14_cc_largestar",         // star-contraction rounds (driver loop)
    "d12_survivors_incremental",// (48 s) stateful pair gen + CC
    "d10_dedup_best_survivor",  // (32 s) CC + survivor ranking
    "q7_nation_volume",         // (31 s)
    "v4b_knn_ivf_refined",      // (27 s) trained-IVF Lloyd pass
    "d7_dedup_survivors",       // (26 s) CC iterations
    "v3_knn_lsh",               // (25 s)
    "v2b_cosine_dup_lsh",       // (23 s)
    "v7_lang_centroids",        // (21 s)
    "b1_bucketed_join",         // (20 s) writes the bucketed catalog table
    "v2_cosine_dup_pairs",      // (19 s)
    "v9b_knn_ivfpq_indexed",    // (17 s) builds + persists the PQ index
    "v9c_knn_ivfpq_append",     // train-on-standing + encode-arrivals (v9-class cost)
    "v9d_knn_ivfpq_rerank",     // Standing build = full IVF-PQ training (r8 advice)
    "v9e_knn_ivfpq_opq",        // same cost class: Standing IVF-PQ training build
    "v11_pq_drift_audit",       // shares v9d's Standing training build (r8 advice)
    "v4_knn_ivf",               // (16 s)
    "q6_forecast_revenue",      // (13 s)
    "v1_knn_bruteforce",        // (13 s)
    "bfs1_supply_radius",       // (12 s) frontier iterations
    "d1_exact_dedup",           // (11 s)
    "v5_knn_topk_agg",          // (9 s)
    "v6_quantize_stats")        // (8 s)

  test("no cheap-construction registry query plans a NEW quadratic join at 10x the scale") {
    val small = "/root/testdata/sf0.001"
    val big = "/root/testdata/sf0.01"
    val covered = SparkEntry.queries.toSeq.sortBy(_._1)
      .filterNot { case (name, _) => heavyConstruction(name) }
    assert(covered.size >= 120, s"coverage shrank to ${covered.size} queries")
    val grew = covered.flatMap { case (name, fn) =>
      val sSmall = ScaleStress.shapeOf(fn(spark, small).queryExecution.sparkPlan.toString)
      val sBig = ScaleStress.shapeOf(fn(spark, big).queryExecution.sparkPlan.toString)
      quadratic.collect {
        case n if sBig.getOrElse(n, 0) > sSmall.getOrElse(n, 0) =>
          s"$name grew a $n at the larger scale: small=$sSmall big=$sBig"
      }
    }
    assert(grew.isEmpty, grew.mkString("\n"))
  }

  test("the heavy-construction exclusions are live registry queries (dead-entry guard)") {
    val dead = heavyConstruction.filterNot(SparkEntry.queries.contains)
    assert(dead.isEmpty,
      s"excluded names no longer in the registry (stale list): $dead")
  }

  test("the headline set stays registered (ScaleStress --headline depends on it)") {
    ScaleStress.headline.foreach { name =>
      assert(SparkEntry.queries.contains(name), s"$name left the registry")
    }
  }
}
