import org.apache.spark.sql.SparkSession
object BenchOne {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .config("spark.sql.extensions", "graft.GraftExtensions").master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.sql.files.openCostInBytes", "256k").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id)").collect()
    args.foreach { name =>
      def run(): Double = {
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(name)(spark, "/root/testdata/sf0.1").queryExecution.toRdd.count()
        (System.nanoTime() - t0) / 1e9
      }
      val cold = run(); System.gc(); val warm = run()
      println(f"BENCHONE $name cold=$cold%.2f warm=$warm%.2f")
    }
    spark.stop()
  }
}
