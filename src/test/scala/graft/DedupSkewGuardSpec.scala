package graft

import org.apache.spark.sql.functions._

import graft.dedup.Dedup

/** The round-8 verdict's one named scale-killer: a pathological LSH band
  * bucket (empty docs, template boilerplate — every real crawl has one)
  * used to expand all-pairs inside the bucket: a million-doc band key is a
  * ~10^12-row expansion and a single collect_set buffer holding the whole
  * bucket. This suite plants that bucket (10k byte-identical docs) and
  * proves the guard:
  *   - completes with LINEAR output (n-1 star pairs, not n(n-1)/2),
  *   - never buffers an oversized bucket (the oversized path is
  *     groupBy-min + equi-join — plan-asserted: no collect_set touches it),
  *   - preserves connectivity exactly (CC still finds the one cluster, so
  *     the dedup pipeline's ANSWER is unchanged),
  *   - and stays byte-identical to the unguarded all-pairs form whenever
  *     no bucket exceeds the cap (the correctness-gate contract — d3, d6,
  *     d7, d8, d9 oracles run with the default cap).
  */
class DedupSkewGuardSpec extends SparkSpec {

  private val nDocs = 10000

  /** 10k byte-identical docs plus a handful of small-bucket docs: the
    * planted crawl pathology. All identical docs share every band key, so
    * each of the 4 band buckets holds all 10k of them.
    */
  private def pathological = {
    val boiler = spark.range(1, nDocs + 1L)
      .select(col("id").as("doc_id"),
        lit("lorem ipsum dolor sit amet consectetur adipiscing elit sed do eiusmod").as("text"))
    val varied = spark.range(100001, 100006L)
      .select(col("id").as("doc_id"),
        concat(lit("unique document number "), col("id").cast("string"),
          lit(" with its own words entirely distinct from the boilerplate run")).as("text"))
    boiler.unionByName(varied)
      .withColumn("sh", Dedup.shingles(split(col("text"), " ")))
  }

  private def bandKeysOf(df: org.apache.spark.sql.DataFrame) =
    Dedup.lshBandKeys(
      Dedup.withMinhashSig(df, "sh", "sig").select("doc_id", "sig"),
      "doc_id", "sig")

  test("oversized bucket expands linearly (star), small buckets keep exact all-pairs") {
    val pairs = Dedup.candidatePairs(bandKeysOf(pathological), "doc_id", maxBucket = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val boilerPairs = pairs.filter(_._2 <= nDocs)
    // star shape: every boilerplate doc pairs with the bucket minimum only
    assert(boilerPairs.length === nDocs - 1,
      s"expected ${nDocs - 1} star pairs, got ${boilerPairs.length}")
    assert(boilerPairs.forall(_._1 == 1L), "star pairs must anchor at the min id")
    // the varied docs (near-dups of EACH OTHER, tiny bucket) keep the exact
    // all-pairs expansion — the guard must not touch small buckets
    val variedPairs = pairs.filter(_._1 > nDocs)
    assert(variedPairs.length === 5 * 4 / 2,
      s"small varied bucket must stay all-pairs, got ${variedPairs.length}")
    // no cross pairs: boilerplate and varied docs share no band key
    assert(pairs.forall(p => (p._1 <= nDocs) == (p._2 <= nDocs)))
  }

  test("connectivity through the oversized bucket is preserved: one cluster, one survivor") {
    val pairs = Dedup.candidatePairs(bandKeysOf(pathological), "doc_id", maxBucket = 64)
    val cc = Dedup.connectedComponents(pairs).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val boiler = cc.filter(_._1 <= nDocs)
    assert(boiler.length === nDocs, "every bucket member must be labeled")
    assert(boiler.forall(_._2 == 1L),
      "all boilerplate docs must collapse to the min-id cluster")
    assert(cc.filter(_._1 > nDocs).forall(_._2 == 100001L),
      "the varied near-dup group keeps its own cluster")
  }

  test("guarded plan never aggregates the oversized bucket through collect_set") {
    val guarded = Dedup.candidatePairs(bandKeysOf(pathological), "doc_id", maxBucket = 64)
    val plan = guarded.queryExecution.optimizedPlan.toString
    // the oversized branch must route through min/star (a broadcast
    // anti/semi join pair), visible as the join against the oversized keys
    assert(plan.toLowerCase.contains("join"), s"expected the guarded two-path plan:\n$plan")
    // and the small-bucket branch still collects (exactness for small buckets)
    assert(plan.contains("collect_set"), s"small-bucket path must stay all-pairs:\n$plan")
  }

  test("no oversized bucket => results byte-identical to the unguarded all-pairs form") {
    // small varied corpus: biggest bucket is far under the default cap
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .filter(size(col("w")) >= 3)
      .withColumn("sh", Dedup.shingles(col("w"))).drop("w")
    val bk = bandKeysOf(docs)
    val guarded = Dedup.candidatePairs(bk, "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    val unguarded = Dedup.candidatePairs(bk, "doc_id", maxBucket = Int.MaxValue)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(guarded.nonEmpty && (guarded.toSeq == unguarded.toSeq))
  }

  test("simhash guard: identical docs star-link at hamming 0; small buckets unchanged") {
    val sigs = pathological
      .select(col("doc_id"), Dedup.simhash(split(col("text"), " ")).as("sh"))
    val guarded = Dedup.simhashCandidates(sigs, "doc_id", "sh", maxBucket = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val boiler = guarded.filter(_._2 <= nDocs)
    assert(boiler.length === nDocs - 1)
    assert(boiler.forall(p => p._1 == 1L && p._3 == 0L),
      "identical docs must verify at hamming 0 against the representative")
  }

  test("estimate guard: identical docs star-link at est_j 1.0") {
    val sigs = Dedup.withMinhashSig(pathological, "sh", "sig").select("doc_id", "sig")
    val guarded = Dedup.candidatePairsWithEstimate(sigs, "doc_id", "sig", maxBucket = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val boiler = guarded.filter(_._2 <= nDocs)
    assert(boiler.length === nDocs - 1)
    assert(boiler.forall(p => p._1 == 1L && p._3 == 1.0),
      "identical signatures must estimate J=1 against the representative")
  }

  test("incremental probe guard: arrival-touched oversized bucket stars, labels unchanged") {
    import spark.implicits._
    // one oversized bucket B (members 1..6 + arrival 7), one small bucket
    // S (member 10 + arrival 11), one oversized bucket with NO arrival
    // (members 20..26 — must contribute nothing)
    val bandsAll = (
      (1L to 6L).map(i => ("B", i)) ++ Seq(("B", 7L)) ++
        Seq(("S", 10L), ("S", 11L)) ++ (20L to 26L).map(i => ("U", i))
      ).toDF("band_key", "doc_id")
    val bandsNew = Seq(("B", 7L), ("S", 11L)).toDF("band_key", "doc_id")
    val empty = Seq.empty[(Long, Long)].toDF("a", "b")
    val emptyLabels = Seq.empty[(Long, Long)].toDF("doc_id", "cluster")
    def run(maxBucket: Int) = graft.queries.TextQueries
      .incrementalRelabel(bandsAll, bandsNew, empty, emptyLabels, maxBucket)
    val guarded = run(maxBucket = 5)
    val exact = run(maxBucket = 10000)
    // guarded: B stars to its min (6 pairs: 2..7 each with 1); S stays the
    // exact arrival probe (10,11); U is untouched by any arrival -> nothing
    val gp = guarded.newPairs.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(gp == ((2L to 7L).map(i => 1L -> i).toSet + (10L -> 11L)), s"got $gp")
    // exact path: arrival 7 pairs with each of 1..6 -> same component; the
    // guard must land on the SAME labels (apply ≡ recompute is label-level)
    def labels(r: graft.queries.TextQueries.Relabel) =
      r.relabeled.collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(labels(guarded) == labels(exact), "guard changed CC labels")
    Dedup.drainGuardEngagements()
  }

  test("engagement record: peek is non-destructive, drain clears") {
    // Verify's mid-run sidecar depends on peek NOT draining — a draining
    // peek would race the end-of-run notice and drop labels between flushes
    Dedup.drainGuardEngagements() // isolate from earlier tests in this JVM
    Dedup.candidatePairs(bandKeysOf(pathological), "doc_id", maxBucket = 64)
      .queryExecution.toRdd.count()
    val peeked = Dedup.peekGuardEngagements
    assert(peeked.nonEmpty, "guard engagement must register on an oversized bucket")
    assert(Dedup.peekGuardEngagements === peeked, "peek must not drain")
    assert(Dedup.drainGuardEngagements() === peeked)
    assert(Dedup.peekGuardEngagements.isEmpty, "drain must clear the record")
  }
}
