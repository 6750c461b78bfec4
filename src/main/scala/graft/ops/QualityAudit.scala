package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations — the audit step a migration or
  * corpus ingest runs BEFORE trusting a table (the reference migrates and
  * hopes; `TableDiff` proves two snapshots agree, this proves one snapshot
  * agrees with its own contract). A check list compiles to ONE aggregation
  * pass:
  *
  *   - row-level checks (not-null, range, accepted values, custom
  *     predicate) are conditional sums — map-side combinable, zero extra
  *     shuffles however many checks ride along;
  *   - uniqueness is `count(*) − count(DISTINCT keys)` inside the same
  *     agg (Spark plans the distinct via expand — still one query, one
  *     scan). Rows with a NULL key count as violations: a null key is
  *     never evidence of uniqueness, and both engines' COUNT(DISTINCT)
  *     exclude nulls, so the arithmetic agrees by construction.
  *
  * Output is the audit table `(check_name, n_violations)` — one row per
  * check, 0 meaning the expectation holds. At 100 TB this is a single
  * linear scan regardless of check count; the alternative (one action per
  * check) rescans the table N times.
  */
object QualityAudit {

  sealed trait Check {
    def name: String
  }
  /** Violation: the column is NULL. */
  final case class NotNull(col: String) extends Check {
    val name = s"not_null($col)"
  }
  /** Violation: non-null and outside [lo, hi] (inclusive bounds). NULLs
    * are NotNull's business — double-counting one broken cell under two
    * checks muddies both counters. Bounds are part of the name so two
    * range checks on the same column (e.g. two valid bands) don't
    * spuriously trip the duplicate-name guard.
    */
  final case class InRange(col: String, lo: Double, hi: Double) extends Check {
    val name = s"in_range($col,$lo,$hi)"
  }
  /** Violation: non-null and not one of `values`. The value set is part of
    * the name (as a digest — the set itself can be long) for the same
    * reason InRange encodes its bounds: two Accepted checks on one column
    * with different sets are distinct expectations, not duplicates. Empty
    * `values` is rejected up front — it would silently flag every non-null
    * row.
    */
  final case class Accepted(col: String, values: Seq[String]) extends Check {
    require(values.nonEmpty, s"Accepted($col) needs a non-empty value set")
    val name = {
      // \u0001 separator (the vd1 hashing convention): a space would make
      // Seq("a b") and Seq("a", "b") digest identically
      val digest = java.security.MessageDigest.getInstance("MD5")
        .digest(values.mkString("\u0001").getBytes("UTF-8"))
        .take(4).map("%02x".format(_)).mkString
      s"accepted($col,$digest)"
    }
  }
  /** Violation count: rows beyond the first per key (plus all null-keyed
    * rows) — `count(*) − count(DISTINCT keys)`.
    */
  final case class Unique(cols: Seq[String]) extends Check {
    require(cols.nonEmpty, "Unique needs at least one key column")
    val name = s"unique(${cols.mkString(",")})"
  }
  /** Violation: `predicate` is true (null = no violation). */
  final case class Custom(name: String, predicate: Column) extends Check

  def audit(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "audit needs at least one check")
    require(checks.map(_.name).distinct.size == checks.size,
      "duplicate check names would collide in the output")
    // names become quoted column identifiers below — a backtick (possible
    // via Custom) would break out of the quoting and fail to parse
    require(checks.forall(!_.name.contains("`")),
      "check names must not contain backticks")
    // count(when(pred, 1)), not sum(when...otherwise(0)): SUM over zero
    // rows is NULL, and "0 means the expectation holds" must survive an
    // EMPTY table — the failed-ingest case an audit exists to catch
    def violations(pred: Column): Column =
      count(when(pred, lit(1)))
    val aggs = checks.map {
      case c @ NotNull(cl) => violations(col(cl).isNull).as(c.name)
      case c @ InRange(cl, lo, hi) =>
        violations(col(cl) < lo || col(cl) > hi).as(c.name)
      case c @ Accepted(cl, vs) =>
        violations(!col(cl).isin(vs: _*)).as(c.name)
      case c @ Unique(cols) =>
        (count(lit(1)) - countDistinct(cols.head, cols.tail: _*)).as(c.name)
      case Custom(n, pred) => violations(pred).as(n)
    }
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(checks.map(c =>
        struct(lit(c.name).as("check_name"),
          col(s"`${c.name}`").as("n_violations"))): _*)).as("kv"))
      .select(col("kv.check_name"), col("kv.n_violations"))
  }

  /** Column-level profile metrics — the inputs to [[drift]], the monitoring
    * face next to [[audit]]'s contract face: audit asks "does this snapshot
    * honor its own rules", drift asks "did this snapshot's DISTRIBUTION
    * move since the last one" (the question a training-data pipeline asks
    * before every ingest — schema-valid data can still silently shift).
    * Float-valued metrics are rounded to 6dp inside the aggregation so the
    * SQL replay is engine-exact (the repo-wide convention).
    */
  sealed trait Metric { def name: String }
  /** Total rows (as double, like every metric — one homogeneous unpivot). */
  case object RowCount extends Metric { val name = "row_count" }
  /** Fraction of NULL cells in the column (0..1, 6dp). */
  final case class NullRate(col: String) extends Metric {
    val name = s"null_rate($col)"
  }
  /** Arithmetic mean of a numeric column (6dp). */
  final case class MeanOf(col: String) extends Metric {
    val name = s"mean($col)"
  }
  /** Exact distinct-value count (cardinality drift — new enum values,
    * collapsed id spaces).
    */
  final case class DistinctOf(col: String) extends Metric {
    val name = s"n_distinct($col)"
  }
  /** Any caller-supplied aggregate; the caller owns determinism/rounding. */
  final case class CustomMetric(name: String, agg: Column) extends Metric

  private def metricAgg(m: Metric): Column = m match {
    case RowCount => count(lit(1)).cast("double")
    case NullRate(c) =>
      round(avg(when(col(c).isNull, lit(1.0)).otherwise(lit(0.0))), 6)
    case MeanOf(c) => round(avg(col(c)), 6)
    case DistinctOf(c) => countDistinct(col(c)).cast("double")
    case CustomMetric(_, a) => a
  }

  /** One row per metric, computed in ONE aggregation pass (the audit()
    * compile: however many metrics ride along, the table is scanned once).
    */
  def profile(df: DataFrame, metrics: Seq[Metric]): DataFrame = {
    require(metrics.nonEmpty, "profile needs at least one metric")
    require(metrics.map(_.name).distinct.size == metrics.size,
      "duplicate metric names would collide in the output")
    require(metrics.forall(!_.name.contains("`")),
      "metric names must not contain backticks")
    val aggs = metrics.map(m => metricAgg(m).as(m.name))
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(metrics.map(m =>
        struct(lit(m.name).as("metric"),
          col(s"`${m.name}`").cast("double").as("value"))): _*)).as("kv"))
      .select(col("kv.metric"), col("kv.value"))
  }

  /** Distribution-drift report between two snapshots of one table: each
    * metric profiled on both sides (one scan per side, metric count free),
    * then joined into `(metric, base_value, cur_value, drift_abs,
    * drift_rel)`. `drift_rel` is NULL when the base value is 0 or either
    * side is NULL (an empty base makes "relative" meaningless — the
    * absolute column still reports). Derived columns are computed from the
    * already-rounded profile values, so the SQL replay sees the identical
    * inputs. At 100 TB: two linear scans and a |metrics|-row join — the
    * alternative (per-metric actions) rescans each side N times.
    */
  def drift(base: DataFrame, cur: DataFrame,
      metrics: Seq[Metric]): DataFrame = {
    val b = profile(base, metrics).withColumnRenamed("value", "base_value")
    val c = profile(cur, metrics).withColumnRenamed("value", "cur_value")
    b.join(c, Seq("metric"))
      .select(col("metric"), col("base_value"), col("cur_value"),
        round(col("cur_value") - col("base_value"), 6).as("drift_abs"),
        when(col("base_value") =!= 0,
          round(abs(col("cur_value") - col("base_value")) /
            abs(col("base_value")), 6)).as("drift_rel"))
  }

  /** Population Stability Index — the binned-distribution drift metric
    * [[drift]]'s scalar moments can't see (a distribution can shift shape
    * with its mean and null rate unmoved). Bin edges are the BASE side's
    * exact `nBins`-quantiles (the standard PSI recipe: the baseline defines
    * the bins, the current population is scored against them; the
    * percentile ≡ quantile_cont interpolation pairing is engine-exact, the
    * p1/stat2 precedent), bin id = how many edges the value exceeds, and
    * each side's bin SHARES join into per-bin terms
    * `(p − q) · ln(p/q)` — their sum is the PSI (< 0.1 stable, > 0.25
    * shifted, by the usual reading). Zero shares are floored at `eps`
    * inside the log (the standard convention), so an emptied or
    * newly-populated bin contributes a large-but-finite term instead of
    * an infinity. NULL values fall into no bin and are excluded from both
    * shares (null-rate movement is [[NullRate]]'s business).
    *
    * Scale shape: one exact-percentile aggregation plus one binned count
    * over each side — the bin step is a broadcast of the single-row edge
    * frame into a map-side expression, and everything after the counts is
    * |bins|-row metadata (the global share window runs over nBins rows,
    * never data).
    */
  def psi(base: DataFrame, cur: DataFrame, valueCol: String,
      nBins: Int = 10, eps: Double = 1e-6): DataFrame = {
    require(nBins >= 2, s"psi needs at least 2 bins, got $nBins")
    require(eps > 0, s"psi eps must be positive, got $eps")
    // valueCol lands inside an expr() string — fail fast on anything that
    // isn't a plain identifier instead of parsing garbage (or worse)
    require(valueCol.matches("[A-Za-z_][A-Za-z0-9_]*"),
      s"psi valueCol must be a plain identifier, got '$valueCol'")
    // probs snapped to 6-decimal values: i/nBins.toDouble would print as
    // e.g. 0.30000000000000004, and the SQL replay's 0.3 literal parses to
    // a (negligibly but not identically) different double — snapping makes
    // the printed literal round-trip to the same double in both engines
    val probs = (1 until nBins).map(i => math.rint(i * 1e6 / nBins) / 1e6)
    val edges = base.filter(col(valueCol).isNotNull)
      .agg(expr(s"percentile($valueCol, array(${probs.mkString(",")}))").as("e"))
    def share(df: DataFrame, out: String): DataFrame = {
      val bin = probs.indices
        .map(i => when(col(valueCol) > col("e").getItem(i), 1).otherwise(0))
        .reduce(_ + _)
      val w = org.apache.spark.sql.expressions.Window.partitionBy()
      df.filter(col(valueCol).isNotNull)
        .crossJoin(broadcast(edges))
        .select(bin.cast("bigint").as("bin"))
        .groupBy("bin").agg(count(lit(1)).as("n"))
        .select(col("bin"),
          round(col("n").cast("double") / sum(col("n")).over(w), 6).as(out))
    }
    share(base, "base_share").join(share(cur, "cur_share"), Seq("bin"), "full")
      .select(col("bin"),
        coalesce(col("base_share"), lit(0.0)).as("base_share"),
        coalesce(col("cur_share"), lit(0.0)).as("cur_share"))
      .withColumn("psi_term",
        round((col("base_share") - col("cur_share")) *
          log(greatest(col("base_share"), lit(eps)) /
            greatest(col("cur_share"), lit(eps))), 6))
  }
}
