package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types.StructType

import graft.ops.AsOfJoin

class AsOfJoinSpec extends SparkSpec {

  private def df(schema: String, rows: Row*) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), StructType.fromDDL(schema))

  test("asof picks latest snapshot at-or-before, null when none precedes") {
    val probes = df("id BIGINT, k BIGINT, ts TIMESTAMP",
      Row(1L, 7L, ts("2024-01-01 10:00:00")), // before any snapshot
      Row(2L, 7L, ts("2024-01-01 12:00:00")), // after snap@11
      Row(3L, 7L, ts("2024-01-01 13:00:00")), // equal ts as snap@13 -> <=
      Row(4L, 8L, ts("2024-01-01 12:30:00"))) // other key
    val snaps = df("k BIGINT, ts TIMESTAMP, rate DOUBLE",
      Row(7L, ts("2024-01-01 11:00:00"), 1.0),
      Row(7L, ts("2024-01-01 13:00:00"), 2.0),
      Row(8L, ts("2024-01-01 12:00:00"), 9.0))
    val out = AsOfJoin.asof(probes, snaps, "k", "ts", Seq("rate"))
      .collect().map(r => r.getLong(0) -> Option(r.getAs[java.lang.Double]("rate"))).toMap
    assert(out === Map(
      1L -> None, 2L -> Some(1.0), 3L -> Some(2.0), 4L -> Some(9.0)))
  }

  test("connected components collapse transitive duplicate chains") {
    import spark.implicits._
    // chain 1-2-3, pair 10-11, isolated-in-pairs 20-21 with bridge 21-22
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L), (21L, 22L))
      .toDF("a", "b")
    val cc = graft.dedup.Dedup.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc === Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L,
      20L -> 20L, 21L -> 20L, 22L -> 20L))
  }
}
