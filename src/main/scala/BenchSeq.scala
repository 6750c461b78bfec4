import org.apache.spark.sql.SparkSession

/** Dev-loop bench: run every registry query SEQUENTIALLY with a per-query
  * progress line and a watchdog that cancels any query exceeding the
  * per-query budget (default 120 s). Finds hangs that the one-JSON-line
  * graft.Bench can't localize. Usage:
  *   SPARK_GRAFT_SF_DIR=... runMain BenchSeq [timeoutSec] [startAtName]
  */
object BenchSeq {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val budgetSec = args.headOption.flatMap(_.toIntOption).getOrElse(120)
    val startAt = args.drop(1).headOption
    val spark = SparkSession.builder()
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.sql.files.openCostInBytes", "256k")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .dropWhile { case (n, _) => startAt.exists(s => n < s) }
    names.foreach { case (name, fn) =>
      System.err.println(s"[benchseq] START $name")
      val t0 = System.nanoTime()
      val done = new java.util.concurrent.atomic.AtomicBoolean(false)
      val watchdog = new Thread(() => {
        val deadline = System.nanoTime() + budgetSec * 1000000000L
        while (!done.get() && System.nanoTime() < deadline) Thread.sleep(500)
        if (!done.get()) {
          System.err.println(s"[benchseq] TIMEOUT $name after ${budgetSec}s — cancelling jobs")
          spark.sparkContext.cancelAllJobs()
        }
      })
      watchdog.setDaemon(true); watchdog.start()
      try {
        val n = fn(spark, sfDir).queryExecution.toRdd.count()
        val dt = (System.nanoTime() - t0) / 1e9
        System.err.println(f"[benchseq] OK $name $dt%.2fs rows=$n")
      } catch { case e: Throwable =>
        val dt = (System.nanoTime() - t0) / 1e9
        System.err.println(f"[benchseq] FAIL $name $dt%.2fs: ${e.getMessage}")
      } finally done.set(true)
    }
    spark.stop()
  }
}
