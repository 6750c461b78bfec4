package graft
/** Scratch stage-level probe for optimization work (not part of the driver
  * contract; measurement only).
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
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "graft.dedup", org.apache.logging.log4j.Level.INFO)
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
    graft.ops.Checkpoints.scoped {
      spark.range(1000000).selectExpr("sum(id)").collect()
      val sd1 = graft.SparkEntry.queries("sd1_semdedup")
      time("sd1 cold") { sd1(spark, d).queryExecution.toRdd.count() }

      // pieces, against the cached standing assignment
      val s = spark
      val asg = time("cellAssignment (cached)") {
        // sd1's own chain: rebuild the DataFrame handle (cache hit)
        graft.functions.DotProduct.register(s)
        graft.functions.L2Sq.register(s)
        val c = graft.Tables.embeddings(s, d).select(
          col("vec_id").as("n_id"),
          transform(col("embedding"), _.cast("double")).as("nv"))
        graft.similarity.VectorOps.kmeansAssign(c, nCells = 16, iters = 2,
          superCells = Some(4))
      }
      // NOTE: this is a REBUILD (not the cache); time pairs over a fresh
      // checkpoint of it to isolate stage costs anyway.
      val j0 = jobs()
      val pairs = time("guardedCosinePairs (incl its tracked ckpt)") {
        val p = graft.similarity.VectorOps.guardedCosinePairs(
          asg, "cell", 0.35, graft.dedup.Dedup.DefaultMaxBucket, "probe sd1")
          .select("a", "b")
        val c = graft.ops.Checkpoints.tracked(p)
        println(s"[probe] pair count: ${c.count()}")
        c
      }
      println(s"[probe] pairs jobs: ${jobs() - j0}")
      val j1 = jobs()
      val (cc, routed) = time("ccAutoRouted") {
        graft.dedup.Dedup.ccAutoRouted(pairs)
      }
      time("cc materialize") { cc.queryExecution.toRdd.count() }
      println(s"[probe] cc jobs: ${jobs() - j1}, routed=$routed")
      val j2 = jobs()
      time("plain connectedComponents") {
        graft.dedup.Dedup.connectedComponents(pairs)
          .queryExecution.toRdd.count()
      }
      println(s"[probe] plain cc jobs: ${jobs() - j2}")
    }
    spark.stop()
  }
}
