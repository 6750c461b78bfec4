package graft

import org.apache.spark.sql.functions._

import graft.dedup.Dedup

/** The Bloom prefilter's contract (bf1): flag semantics (no false
  * negatives, fp-bounded), real bypass (the scale win), and exact
  * equivalence of [[Dedup.bloomNewRows]] to the plain anti join.
  */
class BloomGateSpec extends SparkSpec {

  private lazy val docs = Tables.documents(spark, "/root/testdata/sf0.01")
    .withColumn("h", md5(col("text").cast("binary")))
  private lazy val prior = docs.filter(col("doc_id") % 3 =!= 0).select("h")

  test("no false negatives: every prior key flags maybe-seen") {
    val flagged = Dedup.bloomMaybeSeen(prior, docs, "h", "maybe")
    val fn = flagged.join(prior.distinct(), Seq("h"), "left_semi")
      .filter(!col("maybe")).count()
    assert(fn == 0L, s"$fn prior keys escaped the bloom filter")
  }

  test("the prefilter bypasses most new rows and fp stays near fpp") {
    val flagged = Dedup.bloomMaybeSeen(prior, docs, "h", "maybe").cache()
    try {
      val trulyNew = flagged.join(prior.distinct(), Seq("h"), "left_anti")
      val newCount = trulyNew.count()
      assert(newCount > 0L, "fixture lost its new-docs slice")
      // false positives among truly-new rows: expected ~1% of them
      val fp = trulyNew.filter(col("maybe")).count()
      assert(fp <= math.max(5L, newCount / 10),
        s"$fp false positives out of $newCount new rows — far above fpp=0.01")
      // so the confirm join sees only overlap + fp, not the whole batch
      val joined = flagged.filter(col("maybe")).count()
      assert(joined < flagged.count(),
        "no row bypassed the confirm join — the prefilter never engaged")
    } finally flagged.unpersist()
  }

  test("integral keys probe the long hash domain (no false negatives)") {
    // The latent contract break this pins: stat.bloomFilter inserts
    // bigint keys via putLong, so a string-typed probe (which Spark would
    // reach via an implicit cast) hashes different bytes and every prior
    // key reads 'definitely new'. With the dtype-branched probe, a long
    // key column must behave exactly like the string path: zero false
    // negatives, and bloomNewRows == plain anti join.
    val longPrior = docs.filter(col("doc_id") % 3 =!= 0).select("doc_id")
    val flagged = Dedup.bloomMaybeSeen(longPrior, docs, "doc_id", "maybe")
    val fn = flagged.join(longPrior.distinct(), Seq("doc_id"), "left_semi")
      .filter(!col("maybe")).count()
    assert(fn == 0L, s"$fn prior long keys escaped the bloom filter")
    val viaBloom = Dedup.bloomNewRows(longPrior, docs, "doc_id")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val viaAnti = docs.join(longPrior, Seq("doc_id"), "left_anti")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(viaBloom === viaAnti)
  }

  test("mismatched or unsupported key dtypes fail loudly") {
    import spark.implicits._
    val longPrior = docs.filter(col("doc_id") % 3 =!= 0).select("doc_id")
    // build=long, probe=string: disjoint hash domains — must not probe
    val stringBatch = docs.select(col("doc_id").cast("string").as("doc_id"))
    intercept[IllegalArgumentException] {
      Dedup.bloomMaybeSeen(longPrior, stringBatch, "doc_id", "maybe")
    }
    // dtypes the filter cannot hash at all
    val doubles = Seq(1.5, 2.5).toDF("doc_id")
    intercept[IllegalArgumentException] {
      Dedup.bloomMaybeSeen(doubles, doubles, "doc_id", "maybe")
    }
  }

  test("bloomNewRows equals the plain anti join exactly") {
    val viaBloom = Dedup.bloomNewRows(prior, docs, "h")
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    val truth = docs.join(prior.distinct(), Seq("h"), "left_anti")
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(viaBloom == truth)
  }
}
