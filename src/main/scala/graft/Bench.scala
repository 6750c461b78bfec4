package graft

import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: one JSON line with per-query seconds at
  * SPARK_GRAFT_SF_DIR.
  *
  * Timing honesty:
  *   - a warmup action first, so the first measured query doesn't absorb
  *     JVM/codegen/session init;
  *   - each query runs TWICE: the first (cold) run is reported separately
  *     and absorbs first-touch table I/O, codegen, and broadcast build; the
  *     measured number is the second (warm) run after a System.gc(), so
  *     round-over-round deltas in `queries` reflect plan changes, not which
  *     query alphabetically sorts first onto an untouched table (the round-2
  *     numbers swung 4x on exactly that);
  *   - queries are materialized via the physical plan's RDD (count of
  *     UnsafeRows) — `df.count()` would let Catalyst elide per-row
  *     projections entirely and report fake-fast numbers for map-only
  *     queries.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // Local fixture files are a few MB, i.e. one 128MB-default split —
      // which serializes every map stage onto one core. Small split size
      // mirrors the many-splits reality of large inputs.
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.sql.files.openCostInBytes", "256k")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Warmup: exercise scan + shuffle + codegen machinery once.
    spark.range(1000000).selectExpr("sum(id)").collect()
    Tables.lineitem(spark, sfDir).groupBy("l_returnflag").count().collect()

    def timed(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): (Double, Boolean) = {
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).queryExecution.toRdd.count(); true }
        catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}")
            false
        }
      ((System.nanoTime() - t0) / 1e9, ok)
    }

    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val (cold, okCold) = timed(name, fn)
      if (okCold) System.gc()
      val (warm, ok) = if (okCold) timed(name, fn) else (cold, false)
      (name, warm, cold, ok)
    }
    val qs = results.map { case (k, v, _, _) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val colds = results.map { case (k, _, c, _) => "\"" + k + "\":" + c }
      .mkString("{", ",", "}")
    val failed = results.collect { case (k, _, _, false) => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"cold":$colds,"failed":$failed,"sf":"$sfDir"}"""
    println(json)
    // The driver's capture keeps only an output TAIL, which truncates the
    // per-query map (~60/142 queries visible in BENCH_r0*.json) — so ALSO
    // write the complete record to a repo file, making each round's numbers
    // self-contained for round-over-round comparison. The record is ROUND-
    // STAMPED (bench_full_r<N>.json; N from SPARK_GRAFT_ROUND or inferred
    // as max existing BENCH_r*.json + 1) so a later verification run can't
    // clobber this round's committed numbers; latest is kept as a
    // convenience pointer.
    val round = sys.env.get("SPARK_GRAFT_ROUND").flatMap(_.toIntOption)
      .getOrElse {
        val pat = """BENCH_r0*(\d+)\.json""".r
        val seen = Option(new java.io.File(".").list()).getOrElse(Array.empty)
          .collect { case pat(n) => n.toInt }
        if (seen.isEmpty) 0 else seen.max + 1
      }
    val outs = sys.env.get("SPARK_GRAFT_BENCH_OUT").map(Seq(_)).getOrElse(
      Seq(f"bench_full_r$round%02d.json", "bench_full_latest.json"))
    outs.foreach { out =>
      try java.nio.file.Files.write(java.nio.file.Paths.get(out),
        (json + "\n").getBytes("UTF-8"))
      catch { case e: Exception => System.err.println(s"[bench] write $out failed: $e") }
    }
    spark.stop()
  }
}
