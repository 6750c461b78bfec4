package graft

import org.apache.spark.sql.functions._

import graft.ops.QualityAudit
import graft.ops.QualityAudit._

/** Edge semantics of the declarative audit (dq1's operator): null
  * attribution (a NULL cell fires not_null, never in_range/accepted),
  * inclusive range bounds, null-keyed uniqueness, and the one-pass plan.
  */
class QualityAuditSpec extends SparkSpec {
  import spark.implicits._

  private lazy val rows = Seq(
    // (key, score, status)
    (Some(1L), Some(0.0), Some("ok")),   // lo bound: in range (inclusive)
    (Some(2L), Some(10.0), Some("ok")),  // hi bound: in range
    (Some(3L), Some(-0.1), Some("bad")), // below lo + illegal status
    (Some(3L), Some(10.1), None),        // dup key + above hi + null status
    (None, None, Some("ok")),            // null key + null score
    (None, Some(5.0), Some("warn")))     // second null key
    .toDF("k", "score", "status")

  private def counts(df: org.apache.spark.sql.DataFrame): Map[String, Long] =
    df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("each check counts exactly its own violations") {
    val got = counts(QualityAudit.audit(rows, Seq(
      NotNull("score"),
      InRange("score", 0.0, 10.0),
      Accepted("status", Seq("ok", "warn")),
      Unique(Seq("k")))))
    assert(got === Map(
      "not_null(score)" -> 1L,     // only the null cell
      "in_range(score,0.0,10.0)" -> 2L, // -0.1 and 10.1; bounds + null don't fire
      // value-set digest in the name, so two Accepted checks on one column
      // with different sets stay distinct (md5("ok" + U+0001 + "warn").take(4))
      "accepted(status,c5845042)" -> 1L, // 'bad'; the NULL status doesn't fire
      // 6 rows, 3 distinct non-null keys: the dup 3 plus both null keys
      "unique(k)" -> 3L))
  }

  test("an empty table audits to zeros, never NULLs") {
    // SUM over zero rows is NULL; the contract says 0 means the
    // expectation holds, and a gate must not read an empty (failed)
    // ingest as passing-by-NULL
    val got = counts(QualityAudit.audit(rows.limit(0), Seq(
      NotNull("score"), InRange("score", 0.0, 10.0),
      Accepted("status", Seq("ok")), Unique(Seq("k")),
      Custom("neg", col("score") < 0))))
    assert(got.values.toSet === Set(0L), s"expected all zeros: $got")
    assert(got.size === 5)
  }

  test("custom predicates and a clean table of zeros") {
    val got = counts(QualityAudit.audit(rows, Seq(
      Custom("score_gt_100", col("score") > 100.0),
      NotNull("k"))))
    assert(got("score_gt_100") === 0L)
    assert(got("not_null(k)") === 2L)
  }

  test("the audit is one aggregation pass (one scan however many checks)") {
    val plan = QualityAudit.audit(rows, Seq(
      NotNull("score"), InRange("score", 0.0, 10.0),
      Accepted("status", Seq("ok")), Custom("neg", col("score") < 0)))
      .queryExecution.optimizedPlan
    val scans = plan.collect {
      case l: org.apache.spark.sql.catalyst.plans.logical.LocalRelation => l
      case r if r.nodeName.contains("Relation") => r
    }
    assert(scans.size <= 1, s"expected a single scan:\n$plan")
  }

  test("duplicate check names are rejected") {
    intercept[IllegalArgumentException] {
      QualityAudit.audit(rows, Seq(NotNull("k"), Custom("not_null(k)", col("k").isNull)))
    }
  }

  test("drift reports per-metric movement with exact null semantics") {
    val base = Seq((1L, Some(10.0)), (2L, Some(20.0)), (3L, Some(30.0)))
      .toDF("id", "v")
    val cur = Seq((1L, Some(10.0)), (2L, None), (3L, Some(40.0)),
      (4L, Some(50.0))).toDF("id", "v")
    val got = QualityAudit.drift(base, cur, Seq(
      RowCount, NullRate("v"), MeanOf("v"), DistinctOf("v")))
      .collect().map(r => r.getString(0) -> r).toMap
    // row_count 3 -> 4: abs +1, rel 1/3
    val rc = got("row_count")
    assert(rc.getDouble(1) == 3.0 && rc.getDouble(2) == 4.0)
    assert(rc.getDouble(3) == 1.0 && rc.getDouble(4) == 0.333333)
    // null_rate 0 -> 0.25: base is 0 so rel is NULL, abs still reports
    val nr = got("null_rate(v)")
    assert(nr.getDouble(1) == 0.0 && nr.getDouble(2) == 0.25)
    assert(nr.getDouble(3) == 0.25 && nr.isNullAt(4))
    // mean ignores the NULL cell: (10+40+50)/3 vs (10+20+30)/3
    val mn = got("mean(v)")
    assert(mn.getDouble(1) == 20.0 && mn.getDouble(2) == 33.333333)
    // distinct(v): 3 -> 3 (null not counted) — zero drift, rel 0
    val dv = got("n_distinct(v)")
    assert(dv.getDouble(1) == 3.0 && dv.getDouble(2) == 3.0)
    assert(dv.getDouble(3) == 0.0 && dv.getDouble(4) == 0.0)
  }

  test("an empty base side keeps absolute drift and nulls relative drift") {
    val base = Seq.empty[(Long, Option[Double])].toDF("id", "v")
    val cur = Seq((1L, Some(5.0))).toDF("id", "v")
    val got = QualityAudit.drift(base, cur, Seq(RowCount, MeanOf("v")))
      .collect().map(r => r.getString(0) -> r).toMap
    val rc = got("row_count")
    assert(rc.getDouble(1) == 0.0 && rc.getDouble(2) == 1.0)
    assert(rc.getDouble(3) == 1.0 && rc.isNullAt(4), "rel vs a 0 base is NULL")
    // avg over zero rows is NULL: every derived column stays NULL, never 0
    val mn = got("mean(v)")
    assert(mn.isNullAt(1) && mn.getDouble(2) == 5.0)
    assert(mn.isNullAt(3) && mn.isNullAt(4))
  }

  test("a profile is one aggregation pass per side") {
    val plan = QualityAudit.profile(rows, Seq(
      RowCount, NullRate("score"), MeanOf("score"), DistinctOf("status")))
      .queryExecution.optimizedPlan
    val scans = plan.collect {
      case l: org.apache.spark.sql.catalyst.plans.logical.LocalRelation => l
      case r if r.nodeName.contains("Relation") => r
    }
    assert(scans.size <= 1, s"expected a single scan:\n$plan")
  }

  test("psi: identical populations score zero, a shift scores high, bins partition exactly") {
    val base = (1L to 100L).map(v => Tuple1(v)).toDF("x")
    // self-comparison: every bin's shares match, every term is exactly 0
    val self = QualityAudit.psi(base, base, "x", nBins = 4).collect()
    assert(self.length == 4)
    assert(self.forall(r => r.getDouble(1) == r.getDouble(2)))
    assert(self.forall(_.getDouble(3) == 0.0))
    // shares partition the population: each of 4 bins holds ~25 of 100
    assert(math.abs(self.map(_.getDouble(1)).sum - 1.0) < 1e-9)
    assert(self.forall(r => r.getDouble(1) >= 0.24 && r.getDouble(1) <= 0.26))
    // a hard right-shift: the current population vacates the low bins and
    // overflows the top one — PSI lands far above the 0.25 "shifted" bar
    val cur = (61L to 160L).map(v => Tuple1(v)).toDF("x")
    val shifted = QualityAudit.psi(base, cur, "x", nBins = 4)
      .collect().map(_.getDouble(3)).sum
    assert(shifted > 0.25, s"expected a flagged shift, psi=$shifted")
    // and the direction is visible per bin: bin 0 emptied, bin 3 overflowed
    val byBin = QualityAudit.psi(base, cur, "x", nBins = 4).collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(byBin(0L)._2 < byBin(0L)._1)
    assert(byBin(3L)._2 > byBin(3L)._1)
  }

  test("psi: emptied and newly-populated bins stay finite via the eps floor") {
    val base = (1L to 100L).map(v => Tuple1(v)).toDF("x")
    // disjoint current population: every base bin empties on the cur side,
    // all cur mass lands in the top bin — terms must be finite, never
    // NaN/Inf/NULL (the ln(p/0) hazard the eps floor exists for)
    val cur = (1000L to 1099L).map(v => Tuple1(v)).toDF("x")
    val rows = QualityAudit.psi(base, cur, "x", nBins = 4).collect()
    assert(rows.forall(r => !r.isNullAt(3) && !r.getDouble(3).isNaN &&
      !r.getDouble(3).isInfinite))
    // NULL values fall into no bin and perturb no share
    val withNulls = base.unionByName(
      Seq.fill(50)(Tuple1(null.asInstanceOf[java.lang.Long]))
        .toDF("x").select(col("x").cast("long").as("x")))
    val clean = QualityAudit.psi(base, base, "x", nBins = 4).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).toSet
    val noisy = QualityAudit.psi(withNulls, withNulls, "x", nBins = 4)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).toSet
    assert(noisy == clean, "nulls must be excluded from both shares")
  }

  test("malformed metrics are rejected up front") {
    intercept[IllegalArgumentException] {
      QualityAudit.profile(rows, Seq.empty)
    }
    // psi's valueCol is interpolated into an expr() string: reject
    // non-identifier names before they reach the parser
    intercept[IllegalArgumentException] {
      QualityAudit.psi(rows, rows, "score, score)")
    }
    intercept[IllegalArgumentException] {
      QualityAudit.psi(rows, rows, "score", nBins = 1)
    }
    intercept[IllegalArgumentException] {
      QualityAudit.profile(rows, Seq(RowCount, CustomMetric("row_count", count(lit(1)).cast("double"))))
    }
    intercept[IllegalArgumentException] {
      QualityAudit.profile(rows, Seq(CustomMetric("bad`name", count(lit(1)).cast("double"))))
    }
  }

  test("drift and psi wire directly onto snapshot-store versions (the deployed shape)") {
    // the dd1/dd2 registry faces compare fixture slices; operationally the
    // two sides are two VERSIONS of one snapshot table — prove the wiring:
    // pinned version reads are plain DataFrames, so the monitors run on
    // them unchanged, and a commit landing mid-monitor can't skew either
    // side (reads stay pinned)
    import graft.sources.SnapshotStore
    val dir = java.nio.file.Files.createTempDirectory("graft-drift").toString
    val v0 = (1L to 80L).map(i => (i, i * 10.0)).toDF("id", "v")
    // v1 doubles the top half's values and drops ids % 7
    val v1 = (1L to 80L).filter(_ % 7 != 0)
      .map(i => (i, if (i > 40) i * 20.0 else i * 10.0)).toDF("id", "v")
    SnapshotStore.commit(spark, v0, dir, None)
    SnapshotStore.commit(spark, v1, dir, Some(0L))
    val base = SnapshotStore.read(spark, dir, Some(0L))
    val cur = SnapshotStore.read(spark, dir) // current = v1
    val d = QualityAudit.drift(base, cur, Seq(RowCount, MeanOf("v")))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(d("row_count").getDouble(1) == 80.0)
    assert(d("row_count").getDouble(2) == 69.0)
    assert(d("mean(v)").getDouble(3) > 0.0, "upper-half doubling must lift the mean")
    val psiTotal = QualityAudit.psi(base, cur, "v", nBins = 4)
      .collect().map(_.getDouble(3)).sum
    assert(psiTotal > 0.1, s"distribution shift must register, psi=$psiTotal")
  }

  test("malformed checks are rejected up front, not at parse/execute time") {
    // backtick in a Custom name would break out of the quoted identifier
    intercept[IllegalArgumentException] {
      QualityAudit.audit(rows, Seq(Custom("bad`name", col("k").isNull)))
    }
    // keyless Unique / empty Accepted are contradictions, not checks
    intercept[IllegalArgumentException] { Unique(Seq()) }
    intercept[IllegalArgumentException] { Accepted("status", Seq()) }
    // two Accepted sets on one column are DISTINCT checks, not duplicates
    val two = QualityAudit.audit(rows, Seq(
      Accepted("status", Seq("ok")), Accepted("status", Seq("ok", "warn"))))
    assert(counts(two).values.toSeq.sorted === Seq(1L, 2L))
  }
}
