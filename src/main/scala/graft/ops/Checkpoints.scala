package graft.ops

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.DataFrame

/** Face-scoped lifecycle for `localCheckpoint` blocks.
  *
  * Registry faces (and the operators they call) materialize intermediates
  * with eager `localCheckpoint` so expensive lineage (MinHash pipelines,
  * Lloyd iterations) executes once per face instead of once per consumer.
  * Those blocks were previously never freed: a face is a pure
  * `(SparkSession, sfDir) => DataFrame`, so nothing downstream knows which
  * blocks it created, and a 169-query × 2-run bench JVM accumulated every
  * face's checkpoints for its whole life (round-8 verdict finding #4 —
  * MEMORY_AND_DISK kept it from failing but eroded the storage pool).
  *
  * The fix is a thread-local scope: harnesses (Bench, Verify, specs) wrap
  * each face's build+action in [[scoped]], and every checkpoint created via
  * [[tracked]] inside that dynamic extent is unpersisted when the scope
  * closes. Freeing is safe because `localCheckpoint` is EAGER — any frame
  * derived from a tracked block (including a Standing artifact's own outer
  * checkpoint) has already materialized its data by the time the scope's
  * action finishes, so nothing re-evaluates the freed block lazily.
  *
  * STANDING artifacts are exempt by construction, not by flag: they pin
  * themselves with direct `.localCheckpoint()` calls (never [[tracked]]),
  * so the cache they implement survives scope after scope while the
  * scaffolding that built them is reclaimed.
  *
  * Outside any scope, [[tracked]] degrades to a plain `localCheckpoint` —
  * library callers that manage their own lifecycle are unaffected.
  */
object Checkpoints {
  private val scope = new ThreadLocal[ArrayBuffer[DataFrame]]()

  /** Eagerly checkpoint `df`, registering the block for release when the
    * innermost enclosing [[scoped]] on this thread closes.
    */
  def tracked(df: DataFrame): DataFrame = {
    val c = df.localCheckpoint()
    val buf = scope.get()
    if (buf != null) buf += c
    c
  }

  /** [[tracked]] with an explicit storage level. The default localCheckpoint
    * level holds deserialized unsafe rows in memory first — fine for the
    * fixture-sized intermediates most faces materialize, but a 100x graph
    * edge frame is GBs of rows, and in LOCAL mode driver and executors
    * share one heap (the round-9 run note: pr1's 100x leg OOM'd the 8g
    * default). Graph-scale callers pass DISK_ONLY: any level with a memory
    * half — including MEMORY_AND_DISK_SER, measured on pr1's 100x leg —
    * still OOMs, because READING an evicted block re-inflates the whole
    * serialized block into an in-memory ChunkedByteBuffer
    * (`BlockManager.maybeCacheDiskBytesInMemory`: 32 concurrent readers ×
    * ~75 MB blocks). DISK_ONLY has no memory half to re-cache into; see the
    * GraphQueries checkpoint comment for the measured numbers.
    */
  def tracked(df: DataFrame,
      level: org.apache.spark.storage.StorageLevel): DataFrame = {
    val c = df.localCheckpoint(true, level)
    val buf = scope.get()
    if (buf != null) buf += c
    c
  }

  /** `df.trackedCheckpoint()` — [[tracked]] as postfix syntax, so a long
    * transformation chain converts from `.localCheckpoint()` in place.
    */
  implicit class TrackedOps(private val df: DataFrame) extends AnyVal {
    def trackedCheckpoint(): DataFrame = tracked(df)
  }

  /** Run `body`, then unpersist every [[tracked]] checkpoint it created.
    * Scopes nest: an inner scope frees only its own blocks. The body must
    * both BUILD the plan and RUN its action — freeing happens immediately
    * on exit, so a lazily-returned plan would lose its inputs.
    */
  def scoped[T](body: => T): T = {
    val outer = scope.get()
    val buf = ArrayBuffer.empty[DataFrame]
    scope.set(buf)
    try body
    finally {
      scope.set(outer)
      buf.foreach(release)
    }
  }

  /** Actually free a localCheckpoint's blocks. `Dataset.unpersist` only
    * clears CacheManager entries (`df.cache()` data); a localCheckpoint
    * lives as a persisted RDD behind a `LogicalRDD` plan node, which
    * unpersist does not touch (verified empirically: after
    * `df.localCheckpoint().unpersist(true)` the block is still in
    * `getPersistentRDDs`; releasing the plan's RDD drains it). So release
    * goes through the analyzed plan's RDD.
    */
  def release(df: DataFrame): Unit =
    try df.queryExecution.analyzed match {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd.unpersist(false)
      case _ => df.unpersist()
    } catch { case _: Exception => () } // a stopped session has nothing to free
}
