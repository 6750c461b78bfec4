package graft.sources

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.SparkSession

/** Per-session cache for STANDING artifacts — the "build once, query many"
  * half of an operator's lifecycle.
  *
  * The incremental operators (persisted ANN index v9b, index append v9c,
  * cluster maintenance d13) model a production shape where a standing
  * artifact (a trained quantizer, an index, yesterday's cluster labels)
  * already exists and each invocation pays only the incremental work:
  * encode the arrivals, probe the buckets, relabel the touched components.
  * A registry face is a pure `(SparkSession, sfDir) => DataFrame` function,
  * though, so without a cache every invocation would retrain/rebuild the
  * standing state from scratch and the measured "incremental" cost would be
  * dominated by a rebuild the production system never performs. The first
  * invocation per (session, fixture) builds the artifact (that IS the
  * benchmark's cold run); later invocations — bench warm runs, repeated
  * queries — reuse it, so warm numbers measure steady-state incremental
  * cost.
  *
  * Correctness is unaffected: every cached artifact is a deterministic
  * function of (fixture, hyperparameters) — seeded planes, first-N
  * centroids, rounded Lloyd means — so build-then-reuse produces
  * byte-identical results to rebuild-every-call, and the DuckDB oracles
  * (which replay the build closed-form) hold either way.
  *
  * Keyed by (applicationId, session identity, fixture dir, artifact name):
  * cached DataFrames/tables belong to the session that built them and must
  * never leak across sessions or fixtures. Entries live until the JVM
  * exits — artifacts are fixture-sized (checkpointed index rows, label
  * maps), and the test/bench JVMs are short-lived.
  */
object Standing {
  private type Key = (String, Int, String, String)
  private val cache = new ConcurrentHashMap[Key, AnyRef]()
  private val locks = new ConcurrentHashMap[Key, Object]()
  // Per-thread stack of keys currently BUILDING on this thread — the
  // same-key-recursion assert (fail fast beats a silent double-build).
  private val building = ThreadLocal.withInitial(() =>
    scala.collection.mutable.ArrayBuffer.empty[Key])

  /** Build-once lookup. REENTRANT across keys: a builder may itself call
    * [[artifact]] for a DIFFERENT artifact (a model builder resolving the
    * cached corpus count) — a raw computeIfAbsent would throw
    * IllegalStateException("Recursive update") on any nested access that
    * lands in the same hash bin (this crashed the round-17 scale sweep,
    * masked elsewhere only by cache-population order). The build runs
    * OUTSIDE the map under a per-key monitor, so once-only still holds
    * under concurrent callers of the same key while nested DIFFERENT-key
    * builds just take their own monitor.
    *
    * NESTING CONTRACT (what keeps two monitors from deadlocking): a
    * nested [[artifact]] call may target only a LEAF artifact — one whose
    * builder takes no further Standing lock (today: the corpus/fixture
    * count scalars). Leaves never wait on anything, so the wait-for graph
    * is a two-level DAG with no cycle regardless of which threads build
    * which composites concurrently. Same-KEY recursion (a builder
    * resolving itself) is asserted against below — the reentrant monitor
    * would otherwise double-build silently.
    */
  def artifact[T <: AnyRef](s: SparkSession, sfDir: String, name: String)(
      build: => T): T = {
    val key: Key =
      (s.sparkContext.applicationId, System.identityHashCode(s), sfDir, name)
    val hit = cache.get(key)
    if (hit != null) return hit.asInstanceOf[T]
    val stack = building.get()
    require(!stack.contains(key),
      s"Standing.artifact: same-key recursion while building '$name' " +
        s"($sfDir) — the builder resolves itself")
    val lock = locks.computeIfAbsent(key, _ => new Object)
    lock.synchronized {
      val again = cache.get(key)
      if (again != null) again.asInstanceOf[T]
      else {
        stack += key
        val built =
          try build
          finally stack.remove(stack.length - 1)
        cache.put(key, built)
        built
      }
    }
  }

  /** Release every artifact this session has built, across ALL fixtures:
    * cache entries are removed (so the next consumer rebuilds from
    * scratch — entries holding now-freed localCheckpoints must never be
    * served again, their lineage is truncated and unrecomputable) and any
    * DataFrame reachable in a value, directly or inside a tuple, has its
    * checkpoint blocks freed.
    *
    * For the long-lived sweep JVMs (ScaleStress's 100x mode measures
    * ~38 queries × 3 fixtures in one process): without this, every
    * fixture's standing state — checkpointed pair/label frames, trained
    * quantizer row frames — stays resident for the JVM's whole life, and
    * the sweep's LAST queries run against a heap full of the first
    * queries' residue (the round-15 ld2/ld3 tail-OOM). Table-backed
    * artifacts (bucketed band-key index, partitioned exports) live on
    * disk; dropping their marker entry only costs the next consumer a
    * rebuild-write.
    */
  def release(s: SparkSession): Unit = {
    import scala.jdk.CollectionConverters._
    val sid = (s.sparkContext.applicationId, System.identityHashCode(s))
    def frames(x: Any): Seq[org.apache.spark.sql.DataFrame] = x match {
      case ds: org.apache.spark.sql.Dataset[_] => Seq(ds.toDF)
      case p: Product => p.productIterator.flatMap(frames).toSeq
      case _ => Nil
    }
    cache.keySet.asScala.filter(k => (k._1, k._2) == sid).toSeq.foreach { k =>
      Option(cache.remove(k)).toSeq.flatMap(frames)
        .foreach(graft.ops.Checkpoints.release)
    }
    // Lock objects are deliberately LEFT in place: removing them lets a
    // builder racing this release mint a fresh lock for the same key and
    // double-build it concurrently with the in-flight one. They are a few
    // dozen bare Objects per session — leaking them until JVM exit is
    // free; a use-after-release caller then simply rebuilds under the
    // original monitor.
  }
}
