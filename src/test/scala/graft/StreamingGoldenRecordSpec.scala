package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.queries.TextQueries
import graft.sources.SnapshotStore

/** END-TO-END streaming entity resolution — the production ER loop wired
  * through the snapshot store: document arrivals stream in micro-batches,
  * each batch runs the d13/d25b incremental recipe (probe standing band
  * buckets, relabel touched components, re-merge touched golden records)
  * against PINNED snapshot reads, and publishes five standing tables
  * (docs, bands, pairs, labels, golden) with exactly-once batch commits.
  *
  * The cross-table consistency discipline under crash-replay: there is no
  * multi-table transaction, so commits land in REVERSE DEPENDENCY ORDER
  * (golden, labels, pairs, bands, docs) — each table's derivation reads
  * only tables committed AFTER it, so when a crash mid-commit-sequence
  * re-delivers the batch, the already-committed tables swallow the replay
  * (batch-id watermark) while every still-uncommitted table re-derives
  * from inputs that are still in their PRE-batch state. Each table
  * converges independently; the final state is the same five tables a
  * crash-free run produces (asserted below).
  *
  * Correctness oracle: after any number of batches, labels and golden must
  * equal the FULL batch recompute over all documents (the d13/d25b
  * apply ≡ recompute contract, here held across a multi-batch lifecycle
  * instead of a single apply).
  */
class StreamingGoldenRecordSpec extends SparkSpec {
  import spark.implicits._

  private case class Dirs(docs: String, bands: String, pairs: String,
      labels: String, golden: String)

  private def newDirs(): Dirs = {
    def d() = java.nio.file.Files.createTempDirectory("graft-er").toString
    Dirs(d(), d(), d(), d(), d())
  }

  // ten distinct words per doc id; duplicates share texts exactly
  private def text(seed: Long): String =
    (0 until 10).map(j => s"w${seed}x$j").mkString(" ")

  private def doc(id: Long, textOf: Long): (Long, String, String, String, Long) = {
    val t = text(textOf)
    (id, t, if (id % 2 == 0) "de" else "en", s"s${id % 3}", t.length.toLong)
  }

  private val docCols = Seq("doc_id", "text", "lang", "source", "n_chars")

  private def toDocs(rows: Seq[(Long, String, String, String, Long)]): DataFrame =
    rows.toDF(docCols: _*)

  // standing corpus: {1,2} and {3,4} are dup clusters, 5..8 singletons
  private val standing = Seq(
    doc(1, 1), doc(2, 1), doc(3, 3), doc(4, 3),
    doc(5, 5), doc(6, 6), doc(7, 7), doc(8, 8))
  // batch 1: 101 duplicates standing singleton 5; 102 is a fresh singleton
  private val batch1 = Seq(doc(101, 5), doc(102, 102))
  // batch 2: 201 duplicates 101 (touches the batch-1-GROWN cluster);
  // 202 fresh
  private val batch2 = Seq(doc(201, 5), doc(202, 202))
  // batch 3 (crash test): 301 duplicates standing singleton 6; 302 fresh
  private val batch3 = Seq(doc(301, 6), doc(302, 302))

  private def bandsOf(docs: DataFrame): DataFrame =
    Dedup.lshBandKeys(
      Dedup.withMinhashSig(
        docs.select(col("doc_id"),
          Dedup.shingles(split(col("text"), " ")).as("sh")),
        "sh", "sig").select("doc_id", "sig"),
      "doc_id", "sig")

  /** Seed the five standing tables from the pre-stream corpus (version 0
    * each — what a production maintainer has on disk before the stream).
    */
  private def seed(dirs: Dirs): Unit = {
    val docs = toDocs(standing)
    val bands = bandsOf(docs)
    val pairs = Dedup.candidatePairs(bands, "doc_id", materialize = false)
    val labels = Dedup.connectedComponents(pairs)
    SnapshotStore.commit(spark, docs, dirs.docs, None)
    SnapshotStore.commit(spark, bands, dirs.bands, None)
    SnapshotStore.commit(spark, pairs, dirs.pairs, None)
    SnapshotStore.commit(spark, labels, dirs.labels, None)
    SnapshotStore.commit(spark,
      TextQueries.goldenMerge(docs, labels), dirs.golden, None)
  }

  /** One micro-batch apply — the foreachBatch body. `commitsToRun` < 5
    * simulates a crash after that many commits landed.
    */
  private def applyBatch(dirs: Dirs, batch0: DataFrame, id: Long,
      commitsToRun: Int = 5): Unit = {
    val batch = batch0.localCheckpoint()
    // pinned reads: every derivation sees the PRE-batch state even after
    // some of this batch's commits land (read() pins a manifest version)
    val docsOld = SnapshotStore.read(spark, dirs.docs)
    val bandsOld = SnapshotStore.read(spark, dirs.bands)
    val pairsOld = SnapshotStore.read(spark, dirs.pairs)
    val labelsOld = SnapshotStore.read(spark, dirs.labels)
    val goldenOld = SnapshotStore.read(spark, dirs.golden)
    val bandsNew = bandsOf(batch).localCheckpoint()
    val r = TextQueries.incrementalRelabel(
      bandsOld.unionByName(bandsNew), bandsNew, pairsOld, labelsOld)
    // d13's label apply: untouched labels verbatim, touched relabeled
    val labelsNext = labelsOld.join(r.touchedComps, Seq("cluster"), "left_anti")
      .select("doc_id", "cluster").unionByName(r.relabeled)
      .localCheckpoint()
    // d25b's golden apply: retire touched records, re-merge their docs
    val remergeDocs = docsOld.unionByName(batch).join(
      r.touchedLabels.select("doc_id").unionByName(r.touchedNodes)
        .unionByName(batch.select("doc_id")).distinct(),
      Seq("doc_id"), "left_semi")
    val retired = r.touchedComps.unionByName(
      r.touchedNodes.select(col("doc_id").as("cluster"))).distinct()
    val goldenNext = goldenOld.join(retired, Seq("cluster"), "left_anti")
      .unionByName(TextQueries.goldenMerge(remergeDocs, r.relabeled))
      .localCheckpoint()
    // reverse dependency order (see class scaladoc)
    val commits: Seq[() => Unit] = Seq(
      () => { SnapshotStore.transformBatchExactlyOnce(spark, dirs.golden, id)(_ => goldenNext); () },
      () => { SnapshotStore.transformBatchExactlyOnce(spark, dirs.labels, id)(_ => labelsNext); () },
      () => { SnapshotStore.appendBatchExactlyOnce(spark, r.newPairs, dirs.pairs, id); () },
      () => { SnapshotStore.appendBatchExactlyOnce(spark, bandsNew, dirs.bands, id); () },
      () => { SnapshotStore.appendBatchExactlyOnce(spark, batch, dirs.docs, id); () })
    commits.take(commitsToRun).foreach(_.apply())
  }

  private def recompute(allDocs: DataFrame): (DataFrame, DataFrame) = {
    val pairs = Dedup.candidatePairs(bandsOf(allDocs), "doc_id",
      materialize = false)
    val labels = Dedup.connectedComponents(pairs)
    (labels, TextQueries.goldenMerge(allDocs, labels))
  }

  private def goldenRows(df: DataFrame): Set[(Long, Long, Long, String, Long, String, String)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getString(3), r.getLong(4), r.getString(5), r.getString(6))).toSet

  private def labelRows(df: DataFrame): Set[(Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  private def versions(dirs: Dirs): Seq[Option[Long]] =
    Seq(dirs.docs, dirs.bands, dirs.pairs, dirs.labels, dirs.golden)
      .map(SnapshotStore.currentVersion(spark, _))

  test("streamed incremental apply equals the batch recompute, exactly once") {
    val dirs = newDirs()
    seed(dirs)
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val ckpt = java.nio.file.Files.createTempDirectory("graft-er-ckpt").toString
    val mem = MemoryStream[(Long, String, String, String, Long)]
    val q = mem.toDF().toDF(docCols: _*)
      .writeStream.outputMode("append")
      .foreachBatch { (b: DataFrame, id: Long) => applyBatch(dirs, b, id) }
      .option("checkpointLocation", ckpt)
      .start()
    try {
      mem.addData(batch1: _*); q.processAllAvailable()
      mem.addData(batch2: _*); q.processAllAvailable()
    } finally q.stop()

    // apply == recompute, across the whole multi-batch lifecycle
    val allDocs = toDocs(standing ++ batch1 ++ batch2)
    val (wantLabels, wantGolden) = recompute(allDocs)
    assert(labelRows(SnapshotStore.read(spark, dirs.labels)) ==
      labelRows(wantLabels))
    assert(goldenRows(SnapshotStore.read(spark, dirs.golden)) ==
      goldenRows(wantGolden))
    // the grown cluster {5, 101, 201} exists with 3 members
    val g = goldenRows(SnapshotStore.read(spark, dirs.golden))
    assert(g.exists(r => r._1 == 5L && r._3 == 3L),
      s"expected cluster 5 with 3 members in $g")

    // hand replay of the last batch: every table swallows it
    val before = versions(dirs)
    applyBatch(dirs, toDocs(batch2), 1L)
    assert(versions(dirs) == before, "a replayed batch must change nothing")

    // time travel: the pre-stream golden state (version 0) is still exact
    assert(goldenRows(SnapshotStore.read(spark, dirs.golden, Some(0L))) ==
      goldenRows(recompute(toDocs(standing))._2))
  }

  test("a crash mid-commit-sequence converges on replay") {
    val dirs = newDirs()
    seed(dirs)
    applyBatch(dirs, toDocs(batch1), 0L)
    // batch 1 lands fully; batch 3 crashes after TWO commits (golden and
    // labels published, pairs/bands/docs lost with the process)
    applyBatch(dirs, toDocs(batch3), 1L, commitsToRun = 2)
    assert(SnapshotStore.currentVersion(spark, dirs.golden).contains(2L))
    assert(SnapshotStore.currentVersion(spark, dirs.docs).contains(1L),
      "docs must still be pre-crash")
    // the stream restarts and re-delivers the same batch id
    applyBatch(dirs, toDocs(batch3), 1L)
    // golden/labels swallowed the replay; pairs/bands/docs caught up —
    // and the five tables are exactly the crash-free outcome
    val allDocs = toDocs(standing ++ batch1 ++ batch3)
    val (wantLabels, wantGolden) = recompute(allDocs)
    assert(labelRows(SnapshotStore.read(spark, dirs.labels)) ==
      labelRows(wantLabels))
    assert(goldenRows(SnapshotStore.read(spark, dirs.golden)) ==
      goldenRows(wantGolden))
    // every table is at v2: seed v0 + batch-1 commit + batch-3 commit
    // (golden/labels got theirs before the crash, the rest on replay)
    assert(versions(dirs) == Seq(Some(2L), Some(2L), Some(2L), Some(2L), Some(2L)))
    // and a THIRD delivery is a full no-op
    val before = versions(dirs)
    applyBatch(dirs, toDocs(batch3), 1L)
    assert(versions(dirs) == before)
  }
}
