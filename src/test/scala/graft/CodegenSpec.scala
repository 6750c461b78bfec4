package graft

/** The "codegen-friendly" claim as a regression gate: every native graft
  * expression implements doGenCode, so projections using them must plan
  * INSIDE a WholeStageCodegen stage (the `*(n)` marker) — an accidental
  * CodegenFallback (e.g. a refactor dropping doGenCode) would silently
  * cost the interpreted-path tax in every ANN/dedup hot loop. Inputs
  * derive from spark.range so constant folding can't collapse the
  * projection into a LocalTableScan before the check.
  */
class CodegenSpec extends SparkSpec {

  private def assertCodegen(planned: org.apache.spark.sql.DataFrame, fn: String): Unit = {
    val plan = planned.queryExecution.executedPlan.toString
    assert(plan.matches(s"(?s).*\\*\\(\\d+\\) Project \\[.*$fn.*"),
      s"$fn fell out of whole-stage codegen:\n$plan")
    assert(!plan.contains("CodegenFallback"), s"interpreted fallback present:\n$plan")
  }

  test("graft_dot projects inside whole-stage codegen") {
    val df = spark.range(3).selectExpr(
      "graft_dot(array(cast(id AS double), 2.0d), array(3.0d, 4.0d)) AS d")
    assertCodegen(df, "dotproduct")
    assert(df.orderBy("id").collect().map(_.getDouble(0)).toSeq ===
      Seq(8.0, 11.0, 14.0))
  }

  test("graft_simhash projects inside whole-stage codegen") {
    val df = spark.range(2).selectExpr(
      "graft_simhash(array('w', cast(id AS string))) AS h")
    assertCodegen(df, "simhash")
    assert(df.collect().forall(!_.isNullAt(0)))
  }

  test("graft_winnow projects inside whole-stage codegen") {
    val df = spark.range(2).selectExpr(
      "graft_winnow(array('a', 'b', 'c', 'd', cast(id AS string)), 3, 2) AS f")
    assertCodegen(df, "winnow")
    assert(df.collect().forall(!_.isNullAt(0)))
  }
}
