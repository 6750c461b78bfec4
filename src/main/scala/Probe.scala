package graft
/** Scratch stage-level probe for optimization work (not part of the driver
  * contract; measurement only). Round-21 target: the iterative graph tail
  * (pr1's fixed-iteration chain, d14's star rounds).
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .config("spark.sql.extensions", "graft.GraftExtensions").master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.sql.files.openCostInBytes", "256k").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"
    import org.apache.spark.sql.functions._
    def time[T](label: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    def jobs(): Int =
      spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
    def cq(name: String): Unit = graft.ops.Checkpoints.scoped {
      val q = graft.SparkEntry.queries(name)
      val j0 = jobs()
      time(s"$name cold") { q(spark, d).queryExecution.toRdd.count() }
      println(s"[probe] $name cold jobs: ${jobs() - j0}")
      val j1 = jobs()
      time(s"$name warm") { q(spark, d).queryExecution.toRdd.count() }
      println(s"[probe] $name warm jobs: ${jobs() - j1}")
    }
    spark.range(1000000).selectExpr("sum(id)").collect()
    args.headOption match {
      case Some("pr1") =>
        cq("pr1_pagerank")
        // phase split: edge build+ckpt / deg ckpt / iteration chain
        graft.ops.Checkpoints.scoped {
          val li = graft.Tables.lineitem(spark, d)
          val edges = li.select(
            (col("l_orderkey") * 2).as("src"),
            (col("l_suppkey") * 2 + 1).as("dst")).distinct()
          val both0 = edges.unionByName(
            edges.select(col("dst").as("src"), col("src").as("dst")))
          val ser = org.apache.spark.storage.StorageLevel.DISK_ONLY
          val both = time("both ckpt") {
            graft.ops.Checkpoints.tracked(both0, ser) }
          val deg = time("deg ckpt") { graft.ops.Checkpoints.tracked(
            both.groupBy("src").agg(count(lit(1)).as("outdeg")), ser) }
          println(s"[probe] edges=${both.count()} nodes=${deg.count()}")
          val j0 = jobs()
          time("3-iteration lazy chain (current shape)") {
            val weighted = both.join(deg, "src")
            val nodes = deg.select(col("src").as("node"))
            var ranks = nodes.withColumn("pr", lit(1.0))
            (1 to 3).foreach { _ =>
              val contrib = weighted
                .join(ranks, col("src") === col("node"))
                .select(col("dst"), (col("pr") / col("outdeg")).as("c"))
                .groupBy("dst").agg(sum(col("c")).as("in_sum"))
              ranks = contrib.select(col("dst").as("node"),
                round(lit(0.15) + lit(0.85) * coalesce(col("in_sum"), lit(0.0)), 6).as("pr"))
            }
            ranks.queryExecution.toRdd.count()
          }
          println(s"[probe] chain jobs: ${jobs() - j0}")
          val j1 = jobs()
          time("3-iteration chain, weighted CHECKPOINTED") {
            val weighted = graft.ops.Checkpoints.tracked(both.join(deg, "src"), ser)
            val nodes = deg.select(col("src").as("node"))
            var ranks = nodes.withColumn("pr", lit(1.0))
            (1 to 3).foreach { _ =>
              val contrib = weighted
                .join(ranks, col("src") === col("node"))
                .select(col("dst"), (col("pr") / col("outdeg")).as("c"))
                .groupBy("dst").agg(sum(col("c")).as("in_sum"))
              ranks = contrib.select(col("dst").as("node"),
                round(lit(0.15) + lit(0.85) * coalesce(col("in_sum"), lit(0.0)), 6).as("pr"))
            }
            ranks.queryExecution.toRdd.count()
          }
          println(s"[probe] ckpt-weighted jobs: ${jobs() - j1}")
        }
      case Some("d14") =>
        cq("d14_cc_largestar")
        graft.ops.Checkpoints.scoped {
          // pairs via the shared band-key index (warm: standing cached)
          val pairs = time("candidatePairs") {
            val docs = graft.Tables.documents(spark, d)
            val sigs = graft.dedup.Dedup.withMinhashSig(
              docs.select(col("doc_id"),
                split(lower(col("text")), "\\s+").as("w"))
                .withColumn("sh", graft.dedup.Dedup.shingles(col("w")))
                .select(col("doc_id"), col("sh")), "sh", "sig")
            val p = graft.dedup.Dedup.candidatePairs(
              sigs.select(col("doc_id"), col("sig")),
              "doc_id", materialize = false)
            val c = graft.ops.Checkpoints.tracked(p.select("a", "b"))
            println(s"[probe] pairs: ${c.count()}")
            c
          }
          val j0 = jobs()
          time("connectedComponentsStar") {
            graft.dedup.Dedup.connectedComponentsStar(pairs)
              .queryExecution.toRdd.count()
          }
          println(s"[probe] star jobs: ${jobs() - j0}")
        }
      case _ =>
        args.foreach(cq)
    }
    spark.stop()
  }
}
