package graft

import org.apache.spark.sql.functions._

import graft.similarity.{VectorIndexStore, VectorOps}
import graft.sources.SnapshotStore

/** The versioned ANN index lifecycle ([[VectorIndexStore]]): build /
  * append / delete as atomic group commits, exactly-once appends under
  * replay, and time-travel serving — "search as of version N" across an
  * append and a takedown.
  */
class IndexLifecycleSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 64
  private def clustered(): org.apache.spark.sql.DataFrame = {
    val rnd = new scala.util.Random(41)
    val centroids = Array.fill(8)(Array.fill(dim)(rnd.nextGaussian()))
    val vecs = for (m <- 0 until 20; c <- 0 until 8) yield {
      val v = centroids(c).map(x => (x + rnd.nextGaussian() * 0.01).toFloat)
      ((m * 8 + c).toLong, v)
    }
    vecs.toDF("n_id", "embedding")
      .select(col("n_id"), VectorOps.toDouble(col("embedding")).as("nv"))
  }

  private def newDir(): String =
    java.nio.file.Files.createTempDirectory("graft-vidx").toString

  test("build/append/delete are atomic versioned commits; serving time-travels across them") {
    val df = clustered()
    val standing = df.filter(col("n_id") % 10 =!= 9).localCheckpoint()
    val arrivals = df.filter(col("n_id") % 10 === 9).localCheckpoint()
    val dir = newDir()
    val m0 = VectorOps.ivfpqTrain(standing, nCells = 8, m = 4, dsub = 16, ksub = 16)

    // g0: the build — all three members land in ONE commit
    assert(VectorIndexStore.build(spark, dir, m0, Some(0L)).contains(0L))
    // g1: the append — O(batch) index rows, quantizers carried forward
    val encoded = VectorOps.ivfpqEncode(arrivals, m0, 4, 16).localCheckpoint()
    assert(VectorIndexStore.append(spark, dir, encoded, Some(1L)).contains(1L))
    // a REPLAYED append (same batch id) is a whole-group no-op
    assert(VectorIndexStore.append(spark, dir, encoded, Some(1L)).isEmpty)
    assert(SnapshotStore.groupVersion(spark, dir).contains(1L))

    // serving as of g0 never returns arrival ids; as of g1 it can
    val q = arrivals.limit(5)
    def ids(g: Long, tomb: Option[org.apache.spark.sql.DataFrame] = None) = {
      val model = VectorIndexStore.modelAt(spark, dir, Some(g))
      val m2 = tomb.fold(model)(t => model.copy(index =
        model.index.join(broadcast(t), Seq("n_id"), "left_anti")))
      VectorOps.ivfpqSearch(q, m2, nProbe = 4, m = 4, dsub = 16, k = 5)
        .select("n_id").collect().map(_.getLong(0)).toSet
    }
    val arrivalIds = arrivals.select("n_id").collect().map(_.getLong(0)).toSet
    assert(ids(0L).intersect(arrivalIds).isEmpty,
      "version 0 must not serve rows appended at version 1")
    assert(ids(1L).intersect(arrivalIds).nonEmpty,
      "version 1 must serve the appended arrivals to their own cluster's queries")

    // g2: a takedown — the tombstone member publishes atomically; pinned
    // reads at g1 still serve the ids, current serving anti-joins them out
    val dead = arrivals.select("n_id").localCheckpoint()
    assert(VectorIndexStore.delete(spark, dir, dead, Some(2L)).contains(2L))
    val tombNow = VectorIndexStore.tombstonesAt(spark, dir)
    assert(tombNow.isDefined, "g2 must carry the tombstone member")
    assert(ids(2L, tombNow).intersect(arrivalIds).isEmpty,
      "tombstoned ids must never surface from current serving")
    assert(VectorIndexStore.tombstonesAt(spark, dir, Some(1L)).isEmpty,
      "g1 predates the takedown — time travel must not see it")
    assert(ids(1L).intersect(arrivalIds).nonEmpty,
      "time travel to g1 still serves the later-deleted rows")

    // quantizers rode every commit unchanged (carried, not rewritten)
    val cen0 = VectorIndexStore.modelAt(spark, dir, Some(0L)).centroids.count()
    val cen2 = VectorIndexStore.modelAt(spark, dir, Some(2L)).centroids.count()
    assert(cen0 == cen2 && cen0 == 8L)
  }

  test("compaction physically applies tombstones: serving unchanged, anti-join gone, old version intact") {
    val df = clustered()
    val dir = newDir()
    val m0 = VectorOps.ivfpqTrain(df, nCells = 8, m = 4, dsub = 16, ksub = 16)
    assert(VectorIndexStore.build(spark, dir, m0, Some(0L)).contains(0L))
    val dead = df.filter(col("n_id") % 7 === 0).select("n_id").localCheckpoint()
    assert(VectorIndexStore.delete(spark, dir, dead, Some(1L)).contains(1L))

    val q = df.limit(8).localCheckpoint()
    def serve(g: Option[Long], tomb: Option[org.apache.spark.sql.DataFrame]) =
      VectorOps.ivfpqSearch(q, VectorIndexStore.modelAt(spark, dir, g),
        nProbe = 4, m = 4, dsub = 16, k = 5, tombstones = tomb)
    // pre-compaction serving: the tombstone anti-join, v17's contract
    val before = serve(Some(1L), VectorIndexStore.tombstonesAt(spark, dir, Some(1L)))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

    // g2: compact — ONE commit group rewrites the index member and
    // empties the tombstone set
    assert(VectorIndexStore.compact(spark, dir, Some(2L)).contains(2L))
    // serving AFTER compaction needs NO prune and returns the identical rows
    val after = serve(None, None)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(after == before, "serving changed across compaction")
    // the plan property the compaction buys: no anti-join anywhere in the
    // post-compaction serving plan (pre-compaction serving carries one)
    val planBefore = serve(Some(1L),
      VectorIndexStore.tombstonesAt(spark, dir, Some(1L)))
      .queryExecution.optimizedPlan.toString
    val planAfter = serve(None, None).queryExecution.optimizedPlan.toString
    assert(planBefore.contains("LeftAnti"), "pre-compaction plan lost its anti-join")
    assert(!planAfter.contains("LeftAnti"),
      s"post-compaction serving still plans an anti-join:\n$planAfter")
    // the tombstone member is EMPTY at the compacted version, and a
    // second compact is a no-op (nothing to apply)
    assert(VectorIndexStore.tombstonesAt(spark, dir).exists(_.isEmpty))
    assert(VectorIndexStore.compact(spark, dir, Some(3L)).isEmpty)
    // time travel: the pre-compaction version still reads the FULL index
    val deadIds = dead.collect().map(_.getLong(0)).toSet
    val idxAt1 = VectorIndexStore.modelAt(spark, dir, Some(1L)).index
      .select("n_id").distinct().collect().map(_.getLong(0)).toSet
    val idxAt2 = VectorIndexStore.modelAt(spark, dir, Some(2L)).index
      .select("n_id").distinct().collect().map(_.getLong(0)).toSet
    assert(deadIds.subsetOf(idxAt1), "version pin lost pre-compaction rows")
    assert(idxAt2.intersect(deadIds).isEmpty, "compaction left tombstoned rows")
    assert(idxAt2 == idxAt1 -- deadIds, "compaction dropped a live row")
    // quantizers carried forward untouched
    assert(VectorIndexStore.modelAt(spark, dir, Some(2L)).centroids.count() == 8L)
  }

  test("a delete racing compact's publish: the conflict retry re-applies the FRESH tombstone set") {
    // The round-18 HIGH finding's exact interleaving: a takedown lands
    // AFTER compact's no-op gate read but BEFORE its publish. compact's
    // in-transform reads make that a version conflict → retry against the
    // fresh set; the pre-fix code (tombstones captured before the commit)
    // would re-stage the STALE set on retry and empty the member anyway —
    // silently resurfacing the racing takedown's rows.
    val df = clustered()
    val dir = newDir()
    val m0 = VectorOps.ivfpqTrain(df, nCells = 8, m = 4, dsub = 16, ksub = 16)
    assert(VectorIndexStore.build(spark, dir, m0, Some(0L)).contains(0L))
    val setA = df.filter(col("n_id") % 7 === 0).select("n_id").localCheckpoint()
    assert(VectorIndexStore.delete(spark, dir, setA, Some(1L)).contains(1L))
    // the racing takedown: a STRICT superset (set A plus the %11 wave)
    val setB = df.filter(col("n_id") % 7 === 0 || col("n_id") % 11 === 0)
      .select("n_id").localCheckpoint()
    val injected = new java.util.concurrent.atomic.AtomicInteger(0)
    val got = VectorIndexStore.compactImpl(spark, dir, Some(3L), () =>
      if (injected.getAndIncrement() == 0) {
        // lands g2 between compact's gate and its publish attempt
        assert(VectorIndexStore.delete(spark, dir, setB, Some(2L)).contains(2L))
      })
    // the injection fired, the first publish conflicted, the retry landed
    assert(injected.get() >= 2, s"transform ran ${injected.get()} time(s) — no conflict retry")
    assert(got.contains(3L))
    // the compacted index dropped the RACING delete's ids too — not just
    // the set the gate saw
    val bIds = setB.collect().map(_.getLong(0)).toSet
    val idxNow = VectorIndexStore.modelAt(spark, dir).index
      .select("n_id").distinct().collect().map(_.getLong(0)).toSet
    assert(idxNow.intersect(bIds).isEmpty,
      s"racing takedown resurfaced: ${idxNow.intersect(bIds)}")
    val allIds = df.select("n_id").collect().map(_.getLong(0)).toSet
    assert(idxNow == allIds -- bIds, "compaction dropped a live row")
    // and the tombstone member emptied in the SAME commit
    assert(VectorIndexStore.tombstonesAt(spark, dir).exists(_.isEmpty))
  }

  test("streaming takedown maintenance: a trickle batch holds, the wave batch fires exactly one compaction, replay is swallowed") {
    // The v23 two-wave shape IN-STREAM (round-19 verdict #5): the trigger
    // wired into the micro-batch commit point via applyTakedownBatch — the
    // foreachBatch body of an index maintainer's takedown stream.
    val df = clustered() // 160 rows
    val dir = newDir()
    val m0 = VectorOps.ivfpqTrain(df, nCells = 8, m = 4, dsub = 16, ksub = 16)
    // bootstrap build carries NO batch id: the group's replay probe is
    // monotonic (lastBatchId >= id swallows), so the id space belongs to
    // the stream — a build tagged 100 would swallow micro-batches 0..50
    assert(VectorIndexStore.build(spark, dir, m0).contains(0L))
    val decisions =
      scala.collection.mutable.ArrayBuffer.empty[VectorIndexStore.CompactDecision]
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Long]
    val q = mem.toDF().select(col("value").as("n_id"))
      .writeStream.outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        decisions += VectorIndexStore.applyTakedownBatch(
          spark, dir, b, thresholdPct = 5, batchId = id)
        ()
      }
      .start()
    try {
      // batch 0: 2 of 160 = 1.25% — the trickle; the trigger must HOLD
      mem.addData(3L, 17L); q.processAllAvailable()
      assert(decisions.size == 1)
      assert(decisions(0).nDead == 2L && !decisions(0).compacted
        && decisions(0).version.isEmpty)
      // held back: only the delete's version landed; tombstones pending
      assert(SnapshotStore.groupVersion(spark, dir).contains(1L))
      assert(VectorIndexStore.tombstonesAt(spark, dir).exists(_.count() == 2L))
      // batch 1: the %7 wave joins the pending set — 23 fresh ids,
      // 25 accumulated ≈ 15.6% > 5% — EXACTLY ONE compaction commit
      mem.addData((0L until 160L).filter(_ % 7 == 0): _*)
      q.processAllAvailable()
      assert(decisions.size == 2)
      assert(decisions(1).nLive == 160L && decisions(1).nDead == 25L
        && decisions(1).compacted)
      // versions: g0 build, g1 trickle delete, g2 wave delete, g3 compact
      assert(decisions(1).version.contains(3L))
      assert(SnapshotStore.groupVersion(spark, dir).contains(3L))
      val goneIds = (0L until 160L).filter(i => i % 7 == 0 || i == 3L || i == 17L).toSet
      val idxNow = VectorIndexStore.modelAt(spark, dir).index
        .select("n_id").distinct().collect().map(_.getLong(0)).toSet
      assert(idxNow.intersect(goneIds).isEmpty)
      assert(VectorIndexStore.tombstonesAt(spark, dir).exists(_.isEmpty))
    } finally q.stop()
    // replay: re-deliver the FIRED batch (crash-after-commit recovery) —
    // both its commits are swallowed and the version is untouched
    val replayIds = (0L until 160L).filter(_ % 7 == 0).toDF("n_id")
    val replay = VectorIndexStore.applyTakedownBatch(
      spark, dir, replayIds, thresholdPct = 5, batchId = 1L)
    assert(!replay.compacted && replay.version.isEmpty)
    assert(SnapshotStore.groupVersion(spark, dir).contains(3L))
    // the replayed delete did NOT resurrect the tombstone set
    assert(VectorIndexStore.tombstonesAt(spark, dir).exists(_.isEmpty))
    // a FOREIGN writer's larger id in the group trips the id-space
    // assert loudly (the monotonic replay probe would otherwise swallow
    // this stream's live batches silently)
    VectorIndexStore.delete(spark, dir, replayIds, Some(100L))
    val e = intercept[IllegalArgumentException] {
      VectorIndexStore.applyTakedownBatch(
        spark, dir, replayIds, thresholdPct = 5, batchId = 2L)
    }
    assert(e.getMessage.contains("only writer"))
  }

  test("gated compaction hint: the shuffle route (wave over the broadcast bound) produces the identical index") {
    // Round-20 A/B: the unconditional shuffle cost 1.79x at 100x on a
    // fixed wave, so compact() gates its broadcast hint on the in-transform
    // tombstone count. The gate is plan-only — both routes must rewrite
    // the index identically; this pins it by forcing the shuffle route
    // (maxBroadcastRows = 0) against the hinted route on twin groups.
    val df = clustered()
    val dead = df.filter(col("n_id") % 11 === 0).select("n_id").localCheckpoint()
    def compacted(maxBroadcastRows: Long): Set[(Long, Long, Int, Long)] = {
      val dir = newDir()
      val m0 = VectorOps.ivfpqTrain(df, nCells = 8, m = 4, dsub = 16, ksub = 16)
      VectorIndexStore.build(spark, dir, m0, Some(0L))
      VectorIndexStore.delete(spark, dir, dead, Some(1L))
      assert(VectorIndexStore.compactImpl(spark, dir, Some(2L), () => (),
        maxBroadcastRows).contains(2L))
      VectorIndexStore.modelAt(spark, dir).index.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3))).toSet
    }
    val hinted = compacted(VectorIndexStore.BroadcastableTombstoneRows)
    val shuffled = compacted(0L)
    assert(hinted.nonEmpty && hinted == shuffled)
    val deadIds = dead.collect().map(_.getLong(0)).toSet
    assert(hinted.map(_._1).intersect(deadIds).isEmpty)
  }

  test("compactIfNeeded: below threshold the group is untouched; above it compaction fires") {
    val df = clustered() // 160 rows
    val dir = newDir()
    val m0 = VectorOps.ivfpqTrain(df, nCells = 8, m = 4, dsub = 16, ksub = 16)
    assert(VectorIndexStore.build(spark, dir, m0, Some(0L)).contains(0L))
    // wave 1: 2 ids of 160 = 1.25% — below the 5% threshold
    val small = df.filter(col("n_id").isin(3L, 17L)).select("n_id").localCheckpoint()
    assert(VectorIndexStore.delete(spark, dir, small, Some(1L)).contains(1L))
    val d1 = VectorIndexStore.compactIfNeeded(spark, dir, thresholdPct = 5, Some(2L))
    assert(d1.nLive == 160L && d1.nDead == 2L && !d1.compacted && d1.version.isEmpty)
    // held back: version unchanged, tombstones still pending, serving
    // still needs the anti-join
    assert(SnapshotStore.groupVersion(spark, dir).contains(1L))
    assert(VectorIndexStore.tombstonesAt(spark, dir).exists(_.count() == 2L))
    // wave 2: the %7 set joins — 25 of 160 ≈ 15.6% > 5% — fires
    val big = df.filter(col("n_id") % 7 === 0 || col("n_id").isin(3L, 17L))
      .select("n_id").localCheckpoint()
    // batch ids and group versions DIVERGE here: the held-back trigger
    // consumed no version, so batch 3 lands at g2 and the compaction at g3
    assert(VectorIndexStore.delete(spark, dir, big, Some(3L)).contains(2L))
    val d2 = VectorIndexStore.compactIfNeeded(spark, dir, thresholdPct = 5, Some(4L))
    assert(d2.nLive == 160L && d2.nDead == big.count() && d2.compacted)
    assert(d2.version.contains(3L))
    val bigIds = big.collect().map(_.getLong(0)).toSet
    val idxNow = VectorIndexStore.modelAt(spark, dir).index
      .select("n_id").distinct().collect().map(_.getLong(0)).toSet
    assert(idxNow.intersect(bigIds).isEmpty)
    assert(VectorIndexStore.tombstonesAt(spark, dir).exists(_.isEmpty))
  }
}
