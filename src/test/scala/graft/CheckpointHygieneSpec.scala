package graft

import graft.ops.Checkpoints

/** Round-8 verdict finding #4: registry faces materialize scaffolding with
  * eager localCheckpoint and nothing ever freed it, so a 169-query × 2-run
  * bench JVM accumulated blocks for its whole life. Checkpoints.scoped now
  * frees face-created blocks once the face's action lands; this suite runs
  * the checkpoint-heaviest faces through two full sweeps and pins the
  * persistent-RDD census.
  *
  * Two subtleties the assertions encode:
  *   - Standing artifacts are EXEMPT (they pin themselves outside the
  *     tracker): pass 1 may grow the census by the standing pins (d13's
  *     bands/pairs/labels), so the gate is pass-2-adds-nothing, not
  *     return-to-zero.
  *   - assertions are one-sided (<=): the shared test session's
  *     ContextCleaner may asynchronously reap abandoned RDDs from earlier
  *     suites, shrinking the census under us; only GROWTH indicates a leak.
  */
class CheckpointHygieneSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  // the faces the round-8 verdict named (d15, sd1, pr1) plus the other
  // heavy checkpoint users: CC loops, BFS frontiers, the BPE trainer,
  // the SCD2 apply, and the d13 Standing pattern
  private val faces = Seq(
    "d6_dedup_clusters", "d14_cc_largestar", "d15_containment",
    "d13_clusters_incremental", "sd1_semdedup", "pr1_pagerank",
    "bfs1_supply_radius", "cdc6_scd2_apply", "bpe1_merge_vocab")

  private def runScoped(name: String): Unit =
    Checkpoints.scoped {
      SparkEntry.queries(name)(spark, dir).queryExecution.toRdd.count()
    }

  test("a scoped non-Standing face frees every checkpoint it created") {
    val before = spark.sparkContext.getPersistentRDDs.size
    runScoped("d6_dedup_clusters")
    val after = spark.sparkContext.getPersistentRDDs.size
    assert(after <= before,
      s"d6 leaked ${after - before} persistent RDD(s): $before -> $after")
  }

  test("two full sweeps: pass 2 adds zero persistent RDDs (Standing pins excepted in pass 1)") {
    faces.foreach(runScoped)
    val afterPass1 = spark.sparkContext.getPersistentRDDs.size
    faces.foreach(runScoped)
    val afterPass2 = spark.sparkContext.getPersistentRDDs.size
    assert(afterPass2 <= afterPass1,
      s"sweep 2 leaked ${afterPass2 - afterPass1} persistent RDD(s): " +
        s"$afterPass1 -> $afterPass2")
  }

  test("release actually drains a localCheckpoint (Dataset.unpersist alone does not)") {
    val before = spark.sparkContext.getPersistentRDDs.size
    val df = spark.range(100).toDF("id").localCheckpoint()
    assert(spark.sparkContext.getPersistentRDDs.size === before + 1)
    df.unpersist(blocking = true) // the trap: no-op for checkpoint blocks
    assert(spark.sparkContext.getPersistentRDDs.size === before + 1,
      "if this starts failing, Dataset.unpersist learned to free checkpoints " +
        "and Checkpoints.release can be simplified")
    Checkpoints.release(df)
    assert(spark.sparkContext.getPersistentRDDs.size === before)
  }

  test("Standing.artifact is reentrant across keys and once-only under races") {
    import graft.sources.Standing
    // nested DIFFERENT-key build: the inner lookup must not blow up the
    // cache map (the r17 scale sweep crashed on exactly this shape —
    // ConcurrentHashMap.computeIfAbsent throws "Recursive update" for
    // nested access landing in the same bin)
    val builds = new java.util.concurrent.atomic.AtomicInteger(0)
    val outer = Standing.artifact(spark, "/tmp/fixA", "hyg_outer") {
      val inner = Standing.artifact(spark, "/tmp/fixA", "hyg_inner") {
        builds.incrementAndGet(); java.lang.Long.valueOf(7L)
      }
      java.lang.Long.valueOf(inner.longValue() + 1)
    }
    assert(outer.longValue() == 8L && builds.get() == 1)
    // once-only under 8 concurrent same-key callers
    val n = new java.util.concurrent.atomic.AtomicInteger(0)
    val gate = new java.util.concurrent.CountDownLatch(1)
    val got = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val threads = (1 to 8).map { _ =>
      new Thread(() => {
        gate.await()
        val v = Standing.artifact(spark, "/tmp/fixA", "hyg_race") {
          Thread.sleep(50); java.lang.Long.valueOf(n.incrementAndGet().toLong)
        }
        got.add(v.longValue()); ()
      })
    }
    threads.foreach(_.start()); gate.countDown(); threads.foreach(_.join())
    assert(n.get() == 1, s"same-key build ran ${n.get()} times")
    assert(got.size == 8 && got.toArray.forall(_ == 1L))
    Standing.release(spark)
  }
}
