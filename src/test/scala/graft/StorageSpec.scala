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
}
