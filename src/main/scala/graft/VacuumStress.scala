package graft

import org.apache.spark.sql.SparkSession

import graft.sources.SnapshotStore

/** Measured 100k-file snapshot-store stress (round-17 verdict stretch):
  * the manifest-of-manifests path under a SIX-FIGURE file count with
  * interleaved appends and vacuums — the regime `chunkInlineThreshold`
  * exists for, at the scale the suite-time spec (SnapshotStoreSpec's
  * interleaved test, threshold 20 over ~260 files) can't afford.
  *
  * What it pins, with printed numbers for SCALE.md:
  *   - the base commit writes N real part files (default 100,000);
  *   - every subsequent append's manifest BODY stays O(batch + chunks),
  *     never O(N) names;
  *   - vacuum between appends reclaims dropped versions without touching
  *     chunks a surviving manifest references, and head reads stay exact;
  *   - commit/vacuum/read wall-clock at this file count is printed so a
  *     regression in the O(files) paths is a diffable number, not a vibe.
  *
  * Usage: `sbt "runMain graft.VacuumStress [nFiles]"` (one-off harness,
  * like ScaleStress — not part of the test suite).
  */
object VacuumStress {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.flatMap(_.toIntOption).getOrElse(100000)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val dir = java.nio.file.Files.createTempDirectory("graft-vacstress").toString
    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[vacstress] $label: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }
    def manifestLines(v: Long): Seq[String] = {
      val f = new java.io.File(new java.io.File(dir, "_manifests"),
        f"v$v%08d.manifest")
      val src = scala.io.Source.fromFile(f, "UTF-8")
      try src.getLines().toList finally src.close()
    }

    timed(s"base commit ($n files)") {
      SnapshotStore.commit(spark,
        spark.range(n.toLong).selectExpr("id", "cast(id as string) as v")
          .repartition(n), dir, None)
    }
    var expected = n.toLong
    (1 to 6).foreach { i =>
      timed(s"append $i (100 files)") {
        SnapshotStore.commitAppend(spark,
          spark.range(10000000L * i, 10000000L * i + 100)
            .selectExpr("id", "cast(id as string) as v").repartition(100),
          dir, Some(i.toLong - 1))
      }
      expected += 100
      val body = manifestLines(i.toLong).tail.filterNot(_.startsWith("#"))
      val chunks = body.count(_.startsWith("@chunk:"))
      println(s"[vacstress] append $i manifest body: ${body.size} lines " +
        s"($chunks chunk refs, ${body.size - chunks} inline) — O(batch + chunks)")
      require(body.size - chunks <= 100 + SnapshotStore.chunkInlineThreshold,
        s"append manifest not O(batch): ${body.size - chunks} inline names")
      if (i % 2 == 0) {
        val keepFrom = i.toLong - 1
        val reclaimed = timed(s"vacuum keepFrom=$keepFrom") {
          SnapshotStore.vacuum(spark, dir, keepFrom, orphanMinAgeMs = 0L)
        }
        println(s"[vacstress] vacuum reclaimed $reclaimed data files")
        val head = timed("head read count") {
          SnapshotStore.read(spark, dir).count()
        }
        require(head == expected, s"head read $head != $expected")
      }
    }
    val chunkDir = new java.io.File(new java.io.File(dir, "_manifests"), "chunks")
    println(s"[vacstress] final chunk files on disk: " +
      s"${Option(chunkDir.listFiles()).map(_.length).getOrElse(0)}")
    println(s"[vacstress] OK: $n-file table, 6 appends, 3 interleaved vacuums")
    // leave nothing behind: the table is multi-GB of tiny files
    val walk = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
    try {
      import scala.jdk.CollectionConverters._
      walk.iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    } finally walk.close()
    spark.stop()
  }
}
