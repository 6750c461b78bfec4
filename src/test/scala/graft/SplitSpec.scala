package graft

import org.apache.spark.sql.functions._

import graft.queries.SplitQueries

/** Invariants of the dataset-assembly operators (SplitQueries) that the
  * row-hash oracle can't state directly: leakage safety, determinism, and
  * the mixture/shuffle contracts.
  */
class SplitSpec extends SparkSpec {
  private val sfDir = "/root/testdata/sf0.001"

  test("spl2: no near-dup candidate pair straddles a split boundary") {
    // The operator's whole point: any two docs LSH considers candidate
    // duplicates must land on the same side. Rebuild the same candidate
    // pairs and join both endpoints' assigned splits.
    val split = SplitQueries.queries("spl2_leakage_safe_split")(spark, sfDir)
      .select(col("doc_id"), col("split")).cache()
    val pairs = SplitQueries.leakagePairs(spark, sfDir)
    val straddling = pairs
      .join(split.select(col("doc_id").as("a"), col("split").as("sa")), "a")
      .join(split.select(col("doc_id").as("b"), col("split").as("sb")), "b")
      .filter(col("sa") =!= col("sb"))
      .count()
    assert(straddling == 0, s"$straddling candidate pairs straddle splits")
    // and the pairs are a real test (the fixture has near-dups)
    assert(pairs.count() > 0, "fixture has no candidate pairs - test is vacuous")
    split.unpersist()
  }

  test("spl1: content-hash split is deterministic and covers every doc") {
    val a = SplitQueries.queries("spl1_hash_split")(spark, sfDir)
    val b = SplitQueries.queries("spl1_hash_split")(spark, sfDir)
    assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0)
    val total = graft.Tables.documents(spark, sfDir).count()
    assert(a.count() == total)
    assert(a.select("split").distinct().count() == 3)
  }

  test("mx1: smallest language is kept in full; larger ones downsample") {
    val docs = graft.Tables.documents(spark, sfDir)
    val before = docs.groupBy("lang").agg(count(lit(1)).as("n_before"))
    val after = SplitQueries.queries("mx1_temperature_mix")(spark, sfDir)
      .groupBy("lang").agg(count(lit(1)).as("n_after"))
    val joined = before.join(after, "lang").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    val minLang = joined.minBy(_._2)
    // thr = 1e6 for the argmin language: every doc passes the bucket test
    assert(minLang._3 == minLang._2,
      s"smallest language ${minLang._1} lost docs: ${minLang._2} -> ${minLang._3}")
    // no language gains docs, and the largest language actually shrinks
    joined.foreach { case (l, nb, na) => assert(na <= nb, s"$l grew: $nb -> $na") }
    val maxLang = joined.maxBy(_._2)
    assert(maxLang._3 < maxLang._2,
      s"largest language ${maxLang._1} did not downsample")
  }

  test("shuf1: positions are a contiguous 1..n_shard ranking per shard") {
    val shuffled = SplitQueries.queries("shuf1_sharded_shuffle")(spark, sfDir).cache()
    val total = graft.Tables.documents(spark, sfDir).count()
    assert(shuffled.count() == total)
    // per shard: max(pos) == count(pos) == count(distinct pos) - a gapless
    // dense ranking, so concatenating shards is a permutation of the corpus
    val bad = shuffled.groupBy("shard")
      .agg(max("pos").as("mx"), count(lit(1)).as("n"), count_distinct(col("pos")).as("nd"))
      .filter(col("mx") =!= col("n") || col("nd") =!= col("n"))
      .count()
    assert(bad == 0)
    shuffled.unpersist()
  }
}
