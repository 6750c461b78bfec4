package graft

import org.apache.spark.sql.functions._

import graft.ops.TableDiff

/** Chunked-checksum migration diff ([[TableDiff]]): status classification,
  * identical-tables emptiness, equal rows inside a damaged chunk staying
  * silent, and the row drill planning its semi-join chunk scope.
  */
class TableDiffSpec extends SparkSpec {

  private def tbl(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    rows.toDF("id", "v")
  }
  private def run(a: Seq[(Long, String)], b: Seq[(Long, String)], chunk: Long = 4) =
    TableDiff.diff(tbl(a), tbl(b), "id", Seq("v"), chunk)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet

  test("classifies missing / extra / changed; equal rows in bad chunks stay silent") {
    val a = Seq(1L -> "a", 2L -> "b", 3L -> "c", 9L -> "x")
    val b = Seq(1L -> "a", /* 2 deleted */ 3L -> "CHANGED", 5L -> "new", 9L -> "x")
    // chunk 0 holds ids 1,2,3 (and b's 5): id 1 is equal yet shares the
    // damaged chunk — it must NOT be reported; chunk 2 (id 9) is clean.
    assert(run(a, b) === Set((2L, "missing_in_b"), (3L, "changed"),
      (5L, "extra_in_b")))
  }

  test("identical tables produce an empty diff (no chunk drills)") {
    val a = Seq(1L -> "a", 2L -> "b", 1001L -> "c")
    assert(run(a, a).isEmpty)
  }

  test("null columns are distinguishable from the empty string") {
    import spark.implicits._
    val a = Seq((1L, Some("")), (2L, Some("x"))).toDF("id", "v")
    val b = Seq((1L, None: Option[String]), (2L, Some("x"))).toDF("id", "v")
    val got = TableDiff.diff(a, b, "id", Seq("v"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got === Set((1L, "changed")))
  }

  test("checksum delta apply equals the full recompute, incl. emptied chunks") {
    import spark.implicits._
    val base = Seq(1L -> "a", 2L -> "b", 9L -> "x").toDF("id", "v")
    // chunk 0 (ids 1,2) loses id 2 and rewrites id 1; chunk 2 (id 9) is
    // emptied entirely — its row must vanish from the maintained artifact;
    // id 13 lands in a brand-new chunk
    val changes = Seq(
      ("delete", 2L, "b"),
      ("delete", 1L, "a"), ("insert", 1L, "A2"),
      ("delete", 9L, "x"),
      ("insert", 13L, "new")).toDF("op", "id", "v")
    val next = Seq(1L -> "A2", 13L -> "new").toDF("id", "v")
    val applied = graft.ops.TableDiff.applyChecksumDelta(
        graft.ops.TableDiff.chunkChecksums(base, "id", Seq("v"), 4),
        changes, "op", "id", Seq("v"), 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val recomputed = graft.ops.TableDiff.chunkChecksums(next, "id", Seq("v"), 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(applied === recomputed)
    assert(!applied.exists(_._1 == 2L), s"emptied chunk survived: $applied")
  }

  test("delta apply refuses an oversized or mismatched chunkSize") {
    import spark.implicits._
    val base = Seq(1L -> "a").toDF("id", "v")
    val sums = graft.ops.TableDiff.chunkChecksums(base, "id", Seq("v"), 4)
    val changes = Seq(("insert", 2L, "b")).toDF("op", "id", "v")
    // the same overflow bound diff()/chunkChecksums() enforce
    intercept[IllegalArgumentException] {
      graft.ops.TableDiff.applyChecksumDelta(sums, changes, "op", "id",
        Seq("v"), graft.ops.TableDiff.MaxChunkSize + 1)
    }
    // the artifact records its geometry; applying at a different
    // chunkSize would misplace every delta row, so it must fail loudly
    intercept[IllegalArgumentException] {
      graft.ops.TableDiff.applyChecksumDelta(sums, changes, "op", "id",
        Seq("v"), 8)
    }
    // the stamp survives a parquet round-trip (it IS the standing-artifact
    // story: the on-disk table still knows its chunkSize) and an apply,
    // so a second-generation apply is equally protected
    val dir = java.nio.file.Files.createTempDirectory("graft-vd-meta").toString
    sums.write.mode("overwrite").parquet(dir)
    val reread = spark.read.parquet(dir)
    intercept[IllegalArgumentException] {
      graft.ops.TableDiff.applyChecksumDelta(reread, changes, "op", "id",
        Seq("v"), 8)
    }
    val applied = graft.ops.TableDiff.applyChecksumDelta(reread, changes,
      "op", "id", Seq("v"), 4)
    assert(applied.schema("chunk").metadata
      .getLong("graft.tablediff.chunkSize") == 4L)
  }

  test("the row drill is semi-join scoped to damaged chunks") {
    val a = tbl(Seq(1L -> "a", 100L -> "b"))
    val plan = TableDiff.diff(a, a, "id", Seq("v"))
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("LeftSemi"),
      s"expected the drill to semi-join the bad-chunk list:\n$plan")
  }
}
