package graft

import org.apache.spark.sql.functions._

import graft.queries.GraphQueries

/** PageRank faces the registry oracle can't pin: deep iteration counts
  * (plan-depth bounding via periodic checkpoints) and tol-based early exit.
  */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  // A small fixed digraph with a clear hub: everything points at "c".
  private lazy val edges = Seq(
    ("a", "b"), ("b", "c"), ("a", "c"), ("d", "c"), ("c", "a"))
    .toDF("src", "dst")

  test("pageRank iters=10 with checkpointEvery=3 completes and ranks the hub first") {
    val r = GraphQueries.pageRank(edges, iters = 10, checkpointEvery = 3)
      .orderBy(desc("pr")).collect()
    assert(r.length == 4)
    assert(r.head.getString(0) == "c")
    // Damping 0.85 over 4 nodes: total mass stays near n (rounded 6dp/iter).
    val total = r.map(_.getDouble(1)).sum
    assert(math.abs(total - 4.0) < 0.05)
  }

  test("tol early exit lands on the same fixed point as exhaustive iteration") {
    // With tol, the loop stops at the first iteration whose max delta is
    // below threshold. 50 fixed iterations are far past convergence for a
    // 5-edge graph, so both runs sit on the same fixed point — up to the
    // last rounded digit: double sum-order noise at a 6dp rounding
    // boundary can flip one ulp-of-1e-6, so compare at 2e-6.
    val converged = GraphQueries.pageRank(edges, iters = 50, tol = Some(1e-6))
      .orderBy("node").collect()
    val fixed = GraphQueries.pageRank(edges, iters = 50)
      .orderBy("node").collect()
    assert(converged.length == fixed.length)
    converged.zip(fixed).foreach { case (c, f) =>
      assert(c.getString(0) == f.getString(0))
      assert(math.abs(c.getDouble(1) - f.getDouble(1)) <= 2e-6,
        s"${c.getString(0)}: ${c.getDouble(1)} vs ${f.getDouble(1)}")
    }
  }

}
