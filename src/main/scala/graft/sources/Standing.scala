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
  private val cache = new ConcurrentHashMap[(String, Int, String, String), AnyRef]()

  def artifact[T <: AnyRef](s: SparkSession, sfDir: String, name: String)(
      build: => T): T =
    cache.computeIfAbsent(
      (s.sparkContext.applicationId, System.identityHashCode(s), sfDir, name),
      _ => build).asInstanceOf[T]
}
