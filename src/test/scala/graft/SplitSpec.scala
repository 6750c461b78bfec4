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

  test("mx2: every language's admitted token total respects the budget, " +
      "and admission is a prefix of the hash priority order") {
    val kept = SplitQueries.queries("mx2_token_budget_mix")(spark, sfDir).cache()
    // budget: no language's kept total exceeds 2000 tokens
    val over = kept.groupBy("lang").agg(sum("n_tok").as("t"))
      .filter(col("t") > 2000L).count()
    assert(over == 0, "a language exceeded its token budget")
    // maximality: for each language, the FIRST rejected doc (in admission
    // order) would have pushed the running total past the budget — i.e. the
    // operator admits a maximal prefix, not merely a safe subset
    val all = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"),
        graft.text.TextAnalysis.tokenCountWs(col("text")).as("n_tok"),
        conv(substring(md5(col("text").cast("binary")), 1, 15), 16, 10)
          .cast("bigint").as("h"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("lang").orderBy("h", "doc_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val notMaximal = all
      .withColumn("cum", sum("n_tok").over(w))
      .join(kept.select(col("doc_id"), lit(1).as("k")), Seq("doc_id"), "left")
      .filter(col("k").isNull && col("cum") <= 2000L)
      .count()
    assert(notMaximal == 0, "a doc within budget was rejected - prefix broken")
    kept.unpersist()
  }

  test("mx2: two-level form is row-identical to the single-window reference on two fixtures") {
    // the registry face is the bucketed two-level rewrite; this pins exact
    // equivalence against the original one-window-per-language form (the
    // oracle SQL is also still the single-window shape)
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01").foreach { dir =>
      val twoLevel = SplitQueries.queries("mx2_token_budget_mix")(spark, dir)
      val reference = SplitQueries.mx2SingleWindow(spark, dir)
      assert(twoLevel.exceptAll(reference).count() == 0 &&
        reference.exceptAll(twoLevel).count() == 0,
        s"two-level mx2 diverged from the single-window reference at $dir")
      assert(twoLevel.count() > 0)
    }
  }

  test("mx2: the bucket cutoff prunes the sorted volume to ~budget per language") {
    // the scale claim the rewrite exists for: rows reaching the per-doc
    // running-sum window are bounded by the admitted volume plus one
    // boundary bucket per language — NOT the whole corpus. sf0.01's
    // languages run 3.5k-12k tokens against the 2000-token budget, so the
    // cutoff must drop a substantial share of rows before any sort.
    val (sorted, total) = SplitQueries.mx2SortVolume(spark, "/root/testdata/sf0.01")
    assert(sorted < total,
      s"bucket cutoff pruned nothing: $sorted of $total rows reach the sort")
    assert(sorted.toDouble / total < 0.8,
      s"cutoff too weak: $sorted of $total rows reach the sort")
  }

  test("sp1: packing is shard-count-parameterized; invariants hold at a non-default count") {
    // round-8 verdict item #3: the shard count is the packing-parallelism
    // knob, not a hard-coded 8. Run at 5 shards and check the packing
    // contract directly.
    val docs = graft.Tables.documents(spark, sfDir)
    val packed = graft.queries.TextQueries.packSequences(docs, cap = 512L, nShards = 5L)
      .collect()
    assert(packed.map(_.getLong(0)).distinct.sorted.toSeq == Seq(0L, 1L, 2L, 3L, 4L))
    // every doc lands in exactly one bin
    assert(packed.map(_.getLong(2)).sum == docs.count())
    // a bin overruns its capacity by at most one doc's capped tokens
    assert(packed.forall(r => r.getLong(3) < 512L + 512L))
    // and the registry face itself now derives its count from the host
    assert(graft.queries.TextQueries.sp1Shards ==
      math.max(1, Runtime.getRuntime.availableProcessors()).toLong)
  }

  test("sp2: length-bucketed batches bound batch size and pad only to the bucket ceiling") {
    val rows = graft.queries.TextQueries.queries("sp2_length_bucketed_batches")(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(rows.nonEmpty)
    rows.foreach { case (bucket, nDocs, maxLen, tokSum, padWaste) =>
      assert(nDocs >= 1 && nDocs <= 16, s"batch size $nDocs out of range")
      // binary-length bucket b holds lengths in [2^(b-1), 2^b - 1]
      assert(maxLen >= (1L << (bucket - 1)) && maxLen < (1L << bucket),
        s"max_len $maxLen escapes bucket $bucket")
      assert(padWaste == nDocs * maxLen - tokSum && padWaste >= 0)
      // the point of bucketing: padding to the batch max wastes less than
      // half the batch's compute (lengths within a bucket differ < 2x)
      assert(padWaste.toDouble / (nDocs * maxLen) < 0.5,
        s"bucketed batch wastes ${padWaste.toDouble / (nDocs * maxLen)}")
    }
    // every doc lands in exactly one batch
    assert(rows.map(_._2).sum == graft.Tables.documents(spark, sfDir).count())
  }

  test("rep1: epochs are capped at 4, rare languages repeat at least as " +
      "often as the head, and the head runs exactly one epoch") {
    val rep = SplitQueries.queries("rep1_epoch_upsample")(spark, sfDir).cache()
    val perLang = rep.groupBy("lang")
      .agg(max("epoch").as("epochs"), count(lit(1)).as("rows"),
        count_distinct(col("doc_id")).as("docs"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    perLang.foreach { case (l, e, rows, docs) =>
      assert(e >= 1 && e <= 4, s"$l epochs out of range: $e")
      assert(rows == e * docs, s"$l replication is not uniform: $rows != $e * $docs")
    }
    val before = graft.Tables.documents(spark, sfDir)
      .groupBy("lang").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val head = before.maxBy(_._2)._1
    assert(perLang.find(_._1 == head).get._2 == 1L,
      s"largest language $head should run exactly one epoch")
    // monotone: fewer docs => at least as many epochs
    val sorted = perLang.sortBy(t => before(t._1))
    sorted.sliding(2).foreach {
      case Array((l1, e1, _, _), (l2, e2, _, _)) =>
        assert(e1 >= e2, s"rarer $l1 repeats less than $l2 ($e1 < $e2)")
      case _ =>
    }
    rep.unpersist()
  }

  test("cur1: covers every doc once, four phases, gapless ranks per (phase, shard)") {
    val cur = SplitQueries.queries("cur1_curriculum")(spark, sfDir).cache()
    val total = graft.Tables.documents(spark, sfDir).count()
    assert(cur.count() == total)
    assert(cur.select("doc_id").distinct().count() == total)
    val phases = cur.select("phase").distinct().collect().map(_.getLong(0)).sorted
    assert(phases.forall(p => p >= 1 && p <= 4), s"phase out of range: ${phases.toSeq}")
    val bad = cur.groupBy("phase", "shard")
      .agg(max("pos").as("mx"), count(lit(1)).as("n"), count_distinct(col("pos")).as("nd"))
      .filter(col("mx") =!= col("n") || col("nd") =!= col("n"))
      .count()
    assert(bad == 0, "a (phase, shard) ranking has gaps or duplicates")
    cur.unpersist()
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
