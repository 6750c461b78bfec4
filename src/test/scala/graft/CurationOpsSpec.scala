package graft

import org.apache.spark.sql.functions._

/** Behavioral pins for the round-10 curation operators (d16 / ws1 / v13)
  * beyond their oracle rows: planted fixtures with known answers, so a
  * semantic drift (chunking stride, first-occurrence order, weight
  * threshold direction, prune-fraction rounding) fails loudly instead of
  * silently shifting corpus composition.
  */
class CurationOpsSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("d16: planted shared chunk is counted against later docs only") {
    // doc 1 and doc 2 share their first 8 words exactly; doc 2's copy is
    // the duplicate (first-occurrence-wins by (doc_id, chunk_idx)); doc 3
    // is unique. 9 words → 2 chunks (8 + 1). The planted docs are written
    // as a real temp fixture and run through the REGISTERED face, so a
    // drift in the shipped chunking/first-occurrence logic fails here —
    // an inline re-implementation would keep passing (round-10 review).
    val eight = (1 to 8).map(i => s"w$i").mkString(" ")
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("d16fix").toString
    Seq(
      (1L, s"$eight tail1", "en", "s0", 0L),
      (2L, s"$eight tail2", "en", "s0", 0L),
      (3L, "a b c d e f g h i", "en", "s0", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = graft.ops.Checkpoints.scoped {
      graft.queries.TextQueries.queries("d16_chunk_dedup")(spark, dir)
        .collect()
    }.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    assert(out.toSeq == Seq((1L, 2L, 0L), (2L, 2L, 1L), (3L, 2L, 0L)),
      s"got ${out.toSeq}")
  }

  test("d23: planted verbatim span is found; sub-threshold repeat is dropped") {
    // doc 2 repeats a 12-token passage from doc 1 verbatim (mid-text, NOT
    // aligned to d16's 8-word chunk grid — the case d16 cannot see) and a
    // separate 6-token passage (span_len 6 < minSpan 8 → dropped). doc 1
    // is the first occurrence so it reports nothing; doc 3 is unique.
    // Run through the REGISTERED face (the d16 rule: an inline
    // re-implementation would keep passing after a drift in the shipped
    // windowing/ownership/island logic).
    val p = (1 to 12).map(i => s"p$i").mkString(" ")
    val q = (1 to 6).map(i => s"q$i").mkString(" ")
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("d23fix").toString
    Seq(
      (1L, s"$p $q", "en", "s0", 0L),
      (2L, s"a1 a2 $p b1 b2 b3 $q c1 c2", "en", "s0", 0L),
      (3L, "u1 u2 u3 u4 u5 u6 u7 u8 u9 u10", "en", "s0", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = graft.ops.Checkpoints.scoped {
      graft.queries.TextQueries.queries("d23_substring_spans")(spark, dir)
        .collect()
    }.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // the p-passage occupies doc-2 token positions 2..13; fully-contained
    // 5-gram windows start at 2..9 → one island, span_len 9-2+5 = 12
    assert(out == Seq((2L, 2L, 12L)), s"got $out")
  }

  test("ws1: the max-weight doc is always kept; kept set respects the threshold") {
    val out = graft.queries.SplitQueries.queries("ws1_weighted_sample")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    val all = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("n_chars")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val maxw = all.map(_._2).max
    val maxDocs = all.filter(_._2 == maxw).map(_._1).toSet
    val kept = out.map(_._1).toSet
    // p_keep = w/w_max = 1.0 for the longest docs → bucket < 10^6 always
    assert(maxDocs.subsetOf(kept), "max-weight docs must always be kept")
    // sampling is a strict subset on this fixture (weights vary widely)
    assert(kept.size < all.length && kept.nonEmpty)
    // determinism: a second run is byte-identical (hash, not RNG)
    val again = graft.queries.SplitQueries.queries("ws1_weighted_sample")(spark, sfDir)
      .collect().map(r => r.getLong(0)).toSet
    assert(again == kept)
  }

  test("ws2: fixed-size per stratum, deterministic, and weight-monotone in expectation") {
    val out = graft.queries.SplitQueries.queries("ws2_weighted_sample_noreplace")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    // FIXED-size draw: exactly min(50, |stratum|) docs per language, ranks
    // a gapless 1..k — the property ws1's Bernoulli can't give
    val strata = Tables.documents(spark, sfDir).groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val byLang = out.groupBy(_._2)
    assert(byLang.keySet == strata.keySet)
    byLang.foreach { case (lang, rows) =>
      val want = math.min(50L, strata(lang))
      assert(rows.length.toLong == want, s"$lang: ${rows.length} != $want")
      assert(rows.map(_._3).sorted.toSeq == (1L to want), s"$lang ranks not gapless")
    }
    // no doc drawn twice (without replacement) and a re-run is identical
    assert(out.map(x => (x._1, x._2)).distinct.length == out.length)
    val again = graft.queries.SplitQueries.queries("ws2_weighted_sample_noreplace")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(again.sorted.toSeq == out.sorted.toSeq)
    // weight-monotonicity (in expectation): the drawn docs' mean n_chars
    // should exceed the corpus mean — long docs get larger ES keys
    val w = Tables.documents(spark, sfDir).select(col("doc_id"), col("n_chars"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val drawnIds = out.map(_._1).toSet
    val meanDrawn = drawnIds.toSeq.map(w).sum.toDouble / drawnIds.size
    val meanAll = w.values.sum.toDouble / w.size
    assert(meanDrawn > meanAll,
      s"weighted draw should favor long docs: drawn $meanDrawn vs corpus $meanAll")
  }

  test("v13: each cell drops exactly ceil(10%) least-prototypical members") {
    // mirror the shipped cellAssignment chain exactly: sd1Cells-scaled
    // cell count AND the two-level routing (round 19) — a flat replica
    // here would disagree wherever the IMI approximation reroutes a row
    val emb = Tables.embeddings(spark, sfDir).select(
      col("vec_id").as("n_id"),
      graft.similarity.VectorOps.toDouble(col("embedding")).as("nv"))
    val k = graft.queries.VectorQueries.sd1Cells(emb.count())
    val asg = graft.similarity.VectorOps.kmeansAssign(
      emb, nCells = k, iters = 2,
      superCells = Some(graft.queries.VectorQueries.imiSuperCells(k)))
      .select(col("n_id"), col("cell")).collect()
      .groupBy(_.getLong(1)).map { case (c, rs) => c -> rs.length }
    val pruned = graft.queries.VectorQueries
      .queries("v13_prototypicality_prune")(spark, sfDir)
      .collect().map(r => r.getLong(1))
      .groupBy(identity).map { case (c, rs) => c -> rs.length }
    asg.foreach { case (cell, n) =>
      val keep = n - math.ceil(n * 0.1).toLong
      assert(pruned.getOrElse(cell, 0) === keep,
        s"cell $cell: expected $keep kept of $n")
    }
  }
}
