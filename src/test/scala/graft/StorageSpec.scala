package graft

import org.apache.spark.sql.functions._

import graft.sources.Storage

/** Plan-level proof of the storage-layout claims in SCALE.md. */
class StorageSpec extends SparkSpec {

  test("bucketed tables join without any exchange") {
    val li = Tables.lineitem(spark, "/root/testdata/sf0.001")
      .select("l_orderkey", "l_quantity")
    val o = Tables.orders(spark, "/root/testdata/sf0.001")
      .select("o_orderkey", "o_totalprice")
    Storage.writeBucketed(li, "b_lineitem", "l_orderkey", 4)
    Storage.writeBucketed(o.withColumnRenamed("o_orderkey", "l_orderkey"),
      "b_orders", "l_orderkey", 4)

    // Tiny test tables would broadcast (also shuffle-free, but not the
    // mechanism under test) — force the shuffle-join path.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("b_lineitem").join(spark.table("b_orders"), "l_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"bucketed join must not shuffle:\n$plan")
      assert(plan.contains("SortMergeJoin"), s"expected bucket-aligned SMJ:\n$plan")
      assert(joined.count() === 6000)
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("persisted band-key table feeds the candidate aggregation without an exchange (d3b)") {
    import spark.implicits._
    val bandKeys = Seq(
      (1L, "0:aa"), (2L, "0:aa"), (3L, "0:bb"), (1L, "1:cc"), (4L, "1:cc"))
      .toDF("doc_id", "band_key")
    Storage.replaceBucketed(bandKeys, "t_bands", "band_key", 4)
    // the d3b candidate shape: bucket-aggregate on the bucketed key — the
    // scan's bucket layout must satisfy the aggregation's distribution, so
    // NO shuffle sits between read and groupBy
    val agg = spark.table("t_bands")
      .groupBy("band_key").agg(collect_set(col("doc_id")).as("ids"))
    val plan = agg.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"bucketed band-key aggregation must not shuffle:\n$plan")
    // and the full candidate expansion still produces the right pairs
    val pairs = graft.dedup.Dedup.candidatePairs(spark.table("t_bands"), "doc_id")
      .orderBy("a", "b").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSeq == Seq((1L, 2L), (1L, 4L)))
  }

  test("replaceBucketed clears a same-named orphan in a database-qualified location") {
    import spark.implicits._
    spark.sql("CREATE DATABASE IF NOT EXISTS altdb")
    val df = Seq((1L, "x")).toDF("k", "v")
    // simulate a previous session's leftovers: files sitting at the
    // db-qualified managed location with NO catalog entry — the case a
    // <warehouse>/<name> path reconstruction misses (the real dir is
    // <warehouse>/altdb.db/t_orphan), failing with LOCATION_ALREADY_EXISTS
    val ident = spark.sessionState.sqlParser.parseTableIdentifier("altdb.t_orphan")
    val loc = new org.apache.hadoop.fs.Path(
      spark.sessionState.catalog.defaultTablePath(ident))
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(loc)
    fs.create(new org.apache.hadoop.fs.Path(loc, "junk")).close()
    Storage.replaceBucketed(df, "altdb.t_orphan", "k", 2)
    assert(spark.table("altdb.t_orphan").count() == 1)
    // and replace-over-existing still works with the qualified name
    Storage.replaceBucketed(df, "altdb.t_orphan", "k", 2)
    assert(spark.table("altdb.t_orphan").count() == 1)
  }

  test("z-order layout skips more files than a single-column sort on the off-axis predicate") {
    val orders = Tables.orders(spark, "/root/testdata/sf0.01")
      .select(col("o_orderkey"), col("o_totalprice"),
        unix_timestamp(col("o_orderdate")).cast("double").as("o_epoch"))
    val zDir = java.nio.file.Files.createTempDirectory("zord").toString
    val sDir = java.nio.file.Files.createTempDirectory("sort").toString
    Storage.writeZOrdered(orders, "o_totalprice", "o_epoch", zDir, files = 16)
    orders.repartitionByRange(16, col("o_totalprice"))
      .sortWithinPartitions("o_totalprice").write.mode("overwrite").parquet(sDir)

    // files a date-band predicate would have to scan = files whose
    // [min,max] epoch range intersects the band (what parquet row-group
    // skipping does with column stats)
    def touched(dir: String, lo: Double, hi: Double): Long =
      spark.read.parquet(dir)
        .groupBy(input_file_name().as("f"))
        .agg(min(col("o_epoch")).as("lo"), max(col("o_epoch")).as("hi"))
        .filter(col("hi") >= lo && col("lo") <= hi)
        .count()

    val (lo, hi) = {
      val r = orders.agg(min(col("o_epoch")), max(col("o_epoch"))).collect().head
      val span = r.getDouble(1) - r.getDouble(0)
      (r.getDouble(0) + span * 0.4, r.getDouble(0) + span * 0.5) // a 10% date band
    }
    val zTouched = touched(zDir, lo, hi)
    val sTouched = touched(sDir, lo, hi)
    // price-sorted files each span nearly the whole date range -> all touched;
    // z-ordered files stay tight in both dimensions -> a strict subset.
    assert(sTouched === 16L, s"expected the price-sorted layout to touch all files, got $sTouched")
    assert(zTouched < sTouched, s"z=$zTouched sorted=$sTouched")
  }

  test("z-order skipping shows up in EXECUTED scan metrics (row-group pruning), not just file stats") {
    // The previous test reasons about which files a reader WOULD touch from
    // per-file min/max; this one asserts what the executed scan ACTUALLY
    // decoded. Spark has no file-stats catalog, so file-level listing is
    // identical for both layouts (numFiles metric pinned equal) — the
    // skipping mechanism is parquet ROW-GROUP stats vs the pushed
    // predicate, and the scan's numOutputRows metric (= rows in surviving
    // row groups, one row group per file here) is where it becomes visible.
    val orders = Tables.orders(spark, "/root/testdata/sf0.01")
      .select(col("o_orderkey"), col("o_totalprice"),
        unix_timestamp(col("o_orderdate")).cast("double").as("o_epoch"))
    val total = orders.count()
    val zDir = java.nio.file.Files.createTempDirectory("zord_m").toString
    val sDir = java.nio.file.Files.createTempDirectory("sort_m").toString
    Storage.writeZOrdered(orders, "o_totalprice", "o_epoch", zDir, files = 16)
    orders.repartitionByRange(16, col("o_totalprice"))
      .sortWithinPartitions("o_totalprice").write.mode("overwrite").parquet(sDir)

    def scanMetrics(dir: String, pred: org.apache.spark.sql.Column): (Long, Long) = {
      val df = spark.read.parquet(dir).filter(pred)
      df.collect()
      val plan = df.queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a.executedPlan
        case p => p
      }
      val scans = plan.collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec => s
      }
      assert(scans.nonEmpty, s"no FileSourceScanExec in:\n$plan")
      (scans.map(_.metrics("numFiles").value).sum,
        scans.map(_.metrics("numOutputRows").value).sum)
    }

    val r = orders.agg(
      min(col("o_epoch")), max(col("o_epoch")),
      min(col("o_totalprice")), max(col("o_totalprice"))).collect().head
    val (eLo, eHi) = {
      val span = r.getDouble(1) - r.getDouble(0)
      (r.getDouble(0) + span * 0.4, r.getDouble(0) + span * 0.5)
    }
    // off-axis predicate (the date band): the price-sorted layout can skip
    // NOTHING (every file spans the full date range) while z-order decodes
    // only the intersecting morton ranges
    val datePred = col("o_epoch") >= eLo && col("o_epoch") <= eHi
    val (zFiles, zRows) = scanMetrics(zDir, datePred)
    val (sFiles, sRows) = scanMetrics(sDir, datePred)
    assert(zFiles === 16L && sFiles === 16L,
      s"file LISTING must be layout-independent: z=$zFiles sorted=$sFiles")
    assert(sRows === total,
      s"price-sorted layout should decode every row on the date band, got $sRows/$total")
    assert(zRows * 2 <= sRows,
      s"z-order must decode <= half the rows: z=$zRows sorted=$sRows")

    // 2D box predicate: BOTH layouts prune hard here (the sorted layout
    // prunes its price leg about as well as z-order's coarse 2D tiles prune
    // the box). The z-order WIN is the off-axis predicate above; the box
    // case pins that z-order stays the same order of magnitude on
    // predicates the sort also serves. The margin is WIDE (3x) on purpose:
    // repartitionByRange seeds its range sampling from the RDD id, so file
    // boundaries — and thus which row groups a box clips — shift with how
    // many RDDs earlier suites created (observed z/sorted from 1.0 to 2.0
    // across seed shifts; a LAYOUT pathology would be >> 3x since the
    // sorted side decodes ~12% of rows here).
    val (pLo, pHi) = {
      val span = r.getDouble(3) - r.getDouble(2)
      (r.getDouble(2) + span * 0.4, r.getDouble(2) + span * 0.5)
    }
    val boxPred = datePred && col("o_totalprice") >= pLo && col("o_totalprice") <= pHi
    val (_, zBox) = scanMetrics(zDir, boxPred)
    val (_, sBox) = scanMetrics(sDir, boxPred)
    assert(zBox < total / 2, s"box predicate should skip most row groups: z=$zBox/$total")
    assert(zBox <= sBox * 3, s"box predicate: z=$zBox must stay near sorted=$sBox")
  }

  test("runtime bloom filter prunes the fact scan behind a selective dim filter") {
    // The third scan-reduction lever besides static pushdown and partition
    // pruning: Catalyst injects a bloom filter built from the FILTERED dim
    // side into the fact scan, so fact rows failing the join key test die
    // at the scan. Local fixtures are below the size thresholds that gate
    // the optimization on a cluster — zero them to plan what a 100 TB scan
    // would plan.
    val dir = java.nio.file.Files.createTempDirectory("bloom").toString
    Tables.lineitem(spark, "/root/testdata/sf0.01")
      .select("l_orderkey", "l_quantity").write.mode("overwrite").parquet(s"$dir/fact")
    Tables.orders(spark, "/root/testdata/sf0.01")
      .select("o_orderkey", "o_orderpriority").write.mode("overwrite").parquet(s"$dir/dim")
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100GB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val fact = spark.read.parquet(s"$dir/fact")
      val dim = spark.read.parquet(s"$dir/dim")
        .filter(col("o_orderpriority") === "1-URGENT")
      val q = fact.join(dim, col("l_orderkey") === col("o_orderkey"))
      val plan = q.queryExecution.optimizedPlan.toString
      assert(plan.contains("bloom_filter_agg") || plan.contains("might_contain"),
        s"expected an injected runtime bloom filter:\n$plan")
      assert(q.count() > 0)
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("dynamic partition pruning: a selective dim filter prunes fact partitions at runtime") {
    // The fourth scan-reduction lever (after static pushdown, partition
    // pruning, and the runtime bloom filter): when the fact side is
    // PARTITIONED on the join key, Catalyst injects the dim side's filter
    // result as a runtime partition predicate — at 100 TB this is the
    // difference between scanning one date partition and scanning the
    // table. The local fixture partitions on l_returnflag (3 dirs) and
    // joins against a dim filtered to one flag.
    val dir = java.nio.file.Files.createTempDirectory("dpp").toString
    Storage.writePartitioned(
      Tables.lineitem(spark, "/root/testdata/sf0.01")
        .select("l_orderkey", "l_quantity", "l_returnflag"),
      s"$dir/fact", "l_returnflag")
    Tables.lineitem(spark, "/root/testdata/sf0.01")
      .select("l_returnflag").distinct()
      .withColumn("tag", when(col("l_returnflag") === "A", "keep").otherwise("drop"))
      .write.mode("overwrite").parquet(s"$dir/dim")
    val fact = spark.read.parquet(s"$dir/fact")
    val dim = spark.read.parquet(s"$dir/dim").filter(col("tag") === "keep")
    val q = fact.join(dim, "l_returnflag")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"),
      s"expected a runtime partition-pruning predicate on the fact scan:\n$plan")
    val aRows = fact.filter(col("l_returnflag") === "A").count()
    assert(q.count() === aRows, "pruned join must still return every A row")
  }

  test("schema evolution: mergeSchema unions batch schemas, old rows get nulls") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("evolve").toString
    // batch 1: (id, a); batch 2 adds column b — the additive-evolution case
    Seq((1L, "x")).toDF("id", "a").write.parquet(s"$dir/b1")
    Seq((2L, "y", 9.5)).toDF("id", "a", "b").write.parquet(s"$dir/b2")
    val merged = spark.read.option("mergeSchema", "true").parquet(s"$dir/b1", s"$dir/b2")
    assert(merged.columns.sorted.toSeq === Seq("a", "b", "id"))
    val rows = merged.collect().map(r =>
      r.getAs[Long]("id") -> Option(r.getAs[java.lang.Double]("b"))).toMap
    assert(rows === Map(1L -> None, 2L -> Some(9.5)))
  }

  test("partitioned layout prunes directories on the partition predicate") {
    val dir = java.nio.file.Files.createTempDirectory("partw").toString
    Storage.writePartitioned(
      Tables.lineitem(spark, "/root/testdata/sf0.001")
        .select("l_orderkey", "l_quantity", "l_returnflag"),
      dir, "l_returnflag")
    // one directory per flag value
    val dirs = new java.io.File(dir).listFiles().filter(_.isDirectory).map(_.getName).sorted
    assert(dirs.toSeq === Seq("l_returnflag=A", "l_returnflag=N", "l_returnflag=R"))

    val q = spark.read.parquet(dir).filter(col("l_returnflag") === "A")
    val scan = q.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters: [isnotnull(l_returnflag"),
      s"predicate must prune partitions:\n$scan")
    assert(q.count() > 0)
  }

  private def partFiles(dir: String) =
    new java.io.File(dir).listFiles.filter(f =>
      f.isFile && f.getName.startsWith("part-"))

  test("compact merges a small-file table shuffle-free and preserves every row") {
    val dir = java.nio.file.Files.createTempDirectory("graft-compact").toString + "/t"
    val src = Tables.lineitem(spark, "/root/testdata/sf0.001")
      .select("l_orderkey", "l_linenumber", "l_quantity")
    src.repartition(40).write.parquet(dir) // the streaming-sink pathology
    assert(partFiles(dir).length === 40)
    val before = spark.read.parquet(dir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).sorted.toSeq

    val bytes = partFiles(dir).map(_.length).sum
    val n = Storage.compact(spark, dir, targetBytes = (bytes + 1) / 2)
    assert(n === 2, s"ceil(bytes/target) must give 2 files, got $n")
    assert(partFiles(dir).length === 2)
    val after = spark.read.parquet(dir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).sorted.toSeq
    assert(after === before, "compaction must be a pure layout change")
    // no leftover staging/backup dirs
    val parent = new java.io.File(dir).getParentFile.listFiles.map(_.getName)
    assert(!parent.exists(_.contains("compacting")) && !parent.exists(_.contains("precompact")))
  }

  test("compact with sortCols restores clustered min/max-skippable layout") {
    val dir = java.nio.file.Files.createTempDirectory("graft-compact2").toString + "/t"
    Tables.lineitem(spark, "/root/testdata/sf0.001")
      .select("l_orderkey", "l_quantity")
      .repartition(20).write.parquet(dir) // key order destroyed
    val bytes = partFiles(dir).map(_.length).sum
    Storage.compact(spark, dir, targetBytes = (bytes + 3) / 4, sortCols = Seq("l_orderkey"))
    val files = partFiles(dir)
    assert(files.length === 4)
    // range-partitioned + sorted: per-file key ranges must not overlap
    val ranges = files.map { f =>
      val keys = spark.read.parquet(f.getAbsolutePath)
        .agg(min(col("l_orderkey")), max(col("l_orderkey"))).collect().head
      (keys.getLong(0), keys.getLong(1))
    }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hi), (lo2, _)) =>
        assert(hi <= lo2, s"file key ranges overlap: $hi > $lo2 — clustering lost")
      case _ =>
    }
  }

  test("compact on a hive-partitioned layout compacts per leaf partition") {
    val dir = java.nio.file.Files.createTempDirectory("graft-compact3").toString + "/t"
    // many small files INSIDE each partition directory — the round-12 bug
    // summed a partitioned root to 0 bytes and coalesce(1)'d the whole table
    Storage.writePartitioned(
      Tables.lineitem(spark, "/root/testdata/sf0.001")
        .select("l_orderkey", "l_quantity", "l_returnflag")
        .repartition(8),
      dir, "l_returnflag")
    val leaves = new java.io.File(dir).listFiles.filter(_.isDirectory)
      .filter(_.getName.contains("=")).map(_.getAbsolutePath).sorted
    assert(leaves.length === 3)
    leaves.foreach(l => assert(partFiles(l).length === 8))
    val before = spark.read.parquet(dir).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getString(2))).sorted.toSeq

    val n = Storage.compact(spark, dir) // leaf bytes << 128MB target -> 1 each
    assert(n === 3, s"one output file per leaf partition, got $n")
    leaves.foreach(l => assert(partFiles(l).length === 1,
      s"leaf $l must be compacted to one file"))
    val after = spark.read.parquet(dir).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getString(2))).sorted.toSeq
    assert(after === before, "per-partition compaction must be a pure layout change")
    // partition pruning still works on the compacted layout
    val q = spark.read.parquet(dir).filter(col("l_returnflag") === "A")
    assert(q.queryExecution.executedPlan.toString
      .contains("PartitionFilters: [isnotnull(l_returnflag"))
    // no visible staging/backup leftovers a root reader could misparse
    val rootNames = new java.io.File(dir).listFiles.map(_.getName)
    assert(!rootNames.exists(n2 => !n2.startsWith(".") &&
      (n2.contains("compacting") || n2.contains("precompact"))))
  }

  test("compact on a hive layout tolerates sortCols containing the partition column") {
    // Leaf DataFrames are read from inside the k=v directory, so the
    // partition column is absent there — before round 14, sortCols
    // containing it threw AnalysisException AFTER some leaves had already
    // been rewritten. It is constant within a leaf, so stripping it
    // preserves the requested order exactly.
    val dir = java.nio.file.Files.createTempDirectory("graft-compact6").toString + "/t"
    Storage.writePartitioned(
      Tables.lineitem(spark, "/root/testdata/sf0.001")
        .select("l_orderkey", "l_quantity", "l_returnflag")
        .repartition(4),
      dir, "l_returnflag")
    val before = spark.read.parquet(dir).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getString(2))).sorted.toSeq
    val n = Storage.compact(spark, dir,
      sortCols = Seq("l_returnflag", "l_orderkey"))
    assert(n === 3)
    val after = spark.read.parquet(dir).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getString(2))).sorted.toSeq
    assert(after === before)
    // within each leaf the surviving sort key is actually applied
    val leaves = new java.io.File(dir).listFiles.filter(_.isDirectory)
      .filter(_.getName.contains("=")).map(_.getAbsolutePath)
    leaves.foreach { l =>
      val keys = spark.read.parquet(l).select("l_orderkey")
        .collect().map(_.getLong(0)).toSeq
      assert(keys === keys.sorted, s"leaf $l not sorted by l_orderkey")
    }
  }

  test("compact refuses an unrecognized layout instead of rewriting it") {
    val dir = java.nio.file.Files.createTempDirectory("graft-compact4").toString + "/t"
    new java.io.File(dir + "/not_a_partition").mkdirs()
    val e = intercept[RuntimeException](Storage.compact(spark, dir))
    assert(e.getMessage.contains("refusing"), e.getMessage)
  }

  test("compact refuses a LIVE streaming file-sink directory (_spark_metadata)") {
    // The round-12 stretch "compaction x running stream": the dangerous
    // interaction isn't the rename race (plain readers get old-or-new, see
    // the racing-reader spec below) — it's that a streaming sink's readers
    // resolve part files THROUGH the _spark_metadata transaction log, and
    // the running sink keeps appending to it. A rewrite would dangle every
    // logged entry, so compact must refuse while the query is still live.
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val outDir = java.nio.file.Files.createTempDirectory("graft-sinkc").toString + "/t"
    val ckpt = java.nio.file.Files.createTempDirectory("graft-sinkc-ck").toString
    val q = mem.toDF().toDF("id", "s").writeStream
      .format("parquet").option("path", outDir)
      .option("checkpointLocation", ckpt).start()
    try {
      mem.addData((1L, "a"), (2L, "b"))
      q.processAllAvailable()
      val e = intercept[RuntimeException](Storage.compact(spark, outDir))
      assert(e.getMessage.contains("_spark_metadata"), e.getMessage)
      // the stream is unharmed: it keeps committing and its readers (who
      // go through the log) still see every row
      mem.addData((3L, "c"))
      q.processAllAvailable()
      assert(spark.read.parquet(outDir).count() === 3)
    } finally q.stop()
  }

  test("a reader racing compact sees old-or-new rows (not-found window retried)") {
    // The durability contract in compactDir's scaladoc, exercised for real:
    // a concurrent reader either sees the complete table (old or new
    // layout — row content is identical by compact's row-preservation) or
    // hits the documented brief not-found window between the two renames
    // and retries. What must NEVER happen: a successful read returning a
    // partial mix (half old files, half new).
    val dir = java.nio.file.Files.createTempDirectory("graft-race").toString + "/t"
    val src = Tables.lineitem(spark, "/root/testdata/sf0.001")
      .select("l_orderkey", "l_quantity")
    src.repartition(6).write.parquet(dir)
    val expected = spark.read.parquet(dir).count()

    @volatile var stop = false
    val anomalies = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val windowHits = new java.util.concurrent.atomic.AtomicInteger(0)
    val goodReads = new java.util.concurrent.atomic.AtomicInteger(0)
    def isNotFoundWindow(t: Throwable): Boolean = {
      val chain = Iterator.iterate(t)(_.getCause).takeWhile(_ != null).toSeq
      chain.exists {
        case _: java.io.FileNotFoundException => true
        case e => val m = Option(e.getMessage).getOrElse("")
          m.contains("PATH_NOT_FOUND") || m.contains("does not exist") ||
            m.contains("FAILED_READ_FILE")
      }
    }
    val reader = new Thread(() => {
      while (!stop) {
        try {
          val n = spark.read.parquet(dir).count()
          if (n == expected) goodReads.incrementAndGet()
          else anomalies.add(s"read $n rows, expected $expected")
        } catch {
          case t: Throwable if isNotFoundWindow(t) => windowHits.incrementAndGet()
          case t: Throwable => anomalies.add(s"unexpected: ${t.getClass}: ${t.getMessage}")
        }
      }
    })
    reader.start()
    try {
      // repeated full swaps while the reader hammers the path — each
      // compact is two renames, so every iteration re-opens the window
      (1 to 6).foreach(_ => Storage.compact(spark, dir))
    } finally { stop = true; reader.join(30000) }
    assert(anomalies.isEmpty, s"racing reader anomalies: ${anomalies}")
    assert(goodReads.get() > 0, "the race never produced a successful read " +
      "— the spec lost its subject")
    assert(spark.read.parquet(dir).count() === expected)
  }

  test("compact recovers a swap that crashed between the two renames") {
    val dir = java.nio.file.Files.createTempDirectory("graft-compact5").toString + "/t"
    val src = Tables.lineitem(spark, "/root/testdata/sf0.001")
      .select("l_orderkey", "l_quantity")
    src.repartition(5).write.parquet(dir)
    val before = spark.read.parquet(dir).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).sorted.toSeq
    // simulate the crash window: dir was moved aside, the staging rename
    // never happened — the table exists only under the backup name
    val f = new java.io.File(dir)
    assert(f.renameTo(new java.io.File(dir + ".precompact")))
    val n = Storage.compact(spark, dir)
    assert(n === 1)
    val after = spark.read.parquet(dir).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).sorted.toSeq
    assert(after === before, "recovery must restore then compact the original rows")
    assert(!new java.io.File(dir + ".precompact").exists())
  }
}
