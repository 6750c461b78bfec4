/** Dump `.explain("formatted")` for registry queries into plans/<tag>/.
  *
  * Usage: runMain PlanDump <tag> <suffix> <query...>
  *   writes plans/<tag>/<query>_<suffix>.txt for each query.
  *
  * Session config mirrors Bench (shuffle partitions, split sizing) so the
  * dumped plan is the shape the bench actually runs, at the bench fixture
  * (sf0.1 by default; SPARK_GRAFT_SF_DIR overrides).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val tag = args(0)
    val suffix = args(1)
    val names = args.drop(2)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .config("spark.sql.extensions", "graft.GraftExtensions").master("local[4]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.sql.files.openCostInBytes", "256k").getOrCreate()
    // SPARK_GRAFT_PLANDUMP_CONF="k=v;k=v" — session-conf overrides, so a
    // before/after pair can be dumped across a conf-gated optimization
    // (e.g. spark.graft.cc.localMaxEdges=0 reproduces the pre-gate plan)
    sys.env.get("SPARK_GRAFT_PLANDUMP_CONF").foreach(_.split(";").foreach { kv =>
      val Array(k, v) = kv.split("=", 2)
      spark.conf.set(k, v)
    })
    spark.sparkContext.setLogLevel("ERROR")
    val dir = java.nio.file.Paths.get("plans", tag)
    java.nio.file.Files.createDirectories(dir)
    names.foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.write(dir.resolve(s"${name}_$suffix.txt"),
        txt.getBytes("UTF-8"))
      println(s"[plandump] wrote ${dir.resolve(s"${name}_$suffix.txt")}")
    }
    spark.stop()
  }
}
