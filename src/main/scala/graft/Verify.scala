package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare.
  *
  * Hardened for degraded hosts (round 6 lost its ENTIRE correctness record
  * to a driver-side timeout: the run was killed before the end-of-run
  * oracle_sql.json write, so the driver had results but no oracles and
  * recorded `{}`):
  *   - oracle_sql.json is written FIRST — any query that completes after
  *     that is comparable, no matter when the process dies;
  *   - queries run cheapest-first (costs from the committed
  *     bench_full_latest.json when present), maximizing completed rows
  *     under any external time limit;
  *   - an elapsed budget (SPARK_GRAFT_VERIFY_BUDGET seconds, default 2100)
  *     skips remaining queries once exceeded — a partial record with an
  *     explicit SKIP list beats an empty one;
  *   - AQE is off: correctness doesn't need runtime re-planning, and each
  *     AQE stage is a driver scheduling round-trip — the dominant cost on a
  *     scheduler-lagged host (observed: 10-50x amplification while pure
  *     CPU was only ~1.2x degraded).
  */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // Optional third arg: comma-separated query names — run only those
    // (debug loop for a failing subset; absent = full registry).
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(",").toSet) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val budgetSec = sys.env.get("SPARK_GRAFT_VERIFY_BUDGET")
      .flatMap(_.toIntOption).getOrElse(2100)
    val t0 = System.nanoTime()
    def elapsed: Double = (System.nanoTime() - t0) / 1e9

    new java.io.File(outDir).mkdirs()
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)

    val spark = SparkSession.builder()
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "false")
      // Survive scheduler-lagged hosts: local-mode heartbeats have no
      // network to time out on; a 10s ask timeout under lag just cascades.
      .config("spark.network.timeout", "300s")
      .config("spark.executor.heartbeatInterval", "60s")
      // events.parquet stores TIMESTAMP(NANOS); Spark has no nanos type, so
      // read as long and convert in Tables.events (lossless: fixture values
      // are microsecond-precision).
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Cheapest-first: prior-round per-query seconds when recorded; unknown
    // queries (new this round) run at the median position, not last — they
    // are exactly the rows with no previous green record to fall back on.
    val prior: Map[String, Double] = {
      val f = new java.io.File("bench_full_latest.json")
      if (!f.exists()) Map.empty
      else {
        val txt = scala.io.Source.fromFile(f, "UTF-8").mkString
        val m = """"([a-z0-9_]+)":([0-9.eE+-]+)""".r
        m.findAllMatchIn(txt).map(g => g.group(1) -> g.group(2).toDouble).toMap
      }
    }
    val med =
      if (prior.isEmpty) 0.0
      else prior.values.toSeq.sorted.apply(prior.size / 2)
    val ordered = SparkEntry.queries.toSeq
      .filter { case (n, _) => only.forall(_.contains(n)) }
      .sortBy { case (n, _) => (prior.getOrElse(n, med), n) }

    // Queries run through a small thread pool — Spark schedules concurrent
    // actions safely, and most of these jobs are too small to saturate the
    // executor threads alone. Per-query isolation (the try/catch) and the
    // one-file-per-query output contract are unchanged.
    //
    // Every query's outcome lands in verify_status.json (ok/failed/skipped
    // + the error message). Round 7 lost two queries SILENTLY: they errored,
    // got no result dir, and the driver's correctness report simply omitted
    // them — 155/155 green read as a clean round while two operators were
    // broken. A failure must be a visible row, not an absence.
    val status = new java.util.concurrent.ConcurrentHashMap[String, String]()
    ordered.foreach { case (n, _) => status.put(n, "\"skipped\"") }
    // Synchronized + write-temp-then-atomic-move (round-8 advice): the 4
    // pool threads call this concurrently, and a plain truncate-write could
    // leave an interleaved/torn file for a driver reading mid-run (or after
    // a mid-flight kill). Every snapshot on disk is a complete JSON object.
    def writeStatus(): Unit = synchronized {
      import scala.jdk.CollectionConverters._
      val body = status.asScala.toSeq.sortBy(_._1)
        .map { case (k, v) => s"${q(k)}: $v" }.mkString("{", ",", "}")
      val tmp = Paths.get(s"$outDir/.verify_status.json.tmp")
      Files.writeString(tmp, body)
      Files.move(tmp, Paths.get(s"$outDir/verify_status.json"),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      // Sidecar, refreshed on every flush (round-11 advice): the skew-guard
      // engagement record must survive a mid-run kill — "a failure must be a
      // visible row", and an engaged guard means the affected oracles replay
      // an expansion the Spark side didn't run (see Dedup.DefaultMaxBucket's
      // oracle-coupling note). Empty list = every comparison is
      // apples-to-apples.
      val engaged = graft.dedup.Dedup.peekGuardEngagements
      val gTmp = Paths.get(s"$outDir/.guard_engagements.json.tmp")
      Files.writeString(gTmp, engaged.map(q).mkString("[", ",", "]"))
      Files.move(gTmp, Paths.get(s"$outDir/guard_engagements.json"),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    }
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    try {
      val tasks = ordered.map { case (name, fn) =>
        pool.submit(new Runnable {
          def run(): Unit =
            if (elapsed > budgetSec)
              System.err.println(f"[verify] SKIP $name (budget ${budgetSec}s exceeded at $elapsed%.0fs)")
            else
              try {
                val s0 = System.nanoTime()
                // Scope frees every face-created localCheckpoint once the
                // write lands (Standing artifacts pin themselves outside
                // the tracker) — a 169-query sweep no longer accumulates
                // every face's scaffolding blocks for the JVM's lifetime.
                graft.ops.Checkpoints.scoped {
                  fn(spark, sfDir).coalesce(1).write.mode("overwrite")
                    .parquet(s"$outDir/$name")
                }
                status.put(name, "\"ok\"")
                writeStatus()
                System.err.println(f"[verify] OK $name ${(System.nanoTime() - s0) / 1e9}%.1fs")
              } catch { case e: Throwable =>
                status.put(name, "{\"failed\": " + q(String.valueOf(e.getMessage)) + "}")
                writeStatus()
                System.err.println(s"[verify] $name failed: ${e.getMessage}")
              }
        })
      }
      tasks.foreach(_.get())
    } finally pool.shutdown()
    writeStatus()
    // Guard/oracle coupling check (round-10 advice): the DuckDB oracles for
    // the skew-guarded generators replay the unguarded all-pairs expansion,
    // so an engagement on a verify fixture means those comparisons are no
    // longer apples-to-apples. Surface it as an explicit notice instead of
    // letting it present as an unexplained hash mismatch.
    val engaged = graft.dedup.Dedup.drainGuardEngagements()
    if (engaged.nonEmpty)
      System.err.println("[verify] NOTICE: skew guard engaged on this fixture for: " +
        engaged.mkString(", ") + " — the affected oracles replay UNGUARDED " +
        "all-pairs; any hash mismatch there is the guard, not a bug")
    System.err.println(f"[verify] done in $elapsed%.0fs")
    spark.stop()
  }
}
