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
}
