package graft

import org.apache.spark.sql.functions._

import graft.queries.GraphQueries

/** Round-21: the size-gated driver-local finish applied to the iterative
  * graph family (round-20 verdict item 4 — the CC recipe from round 20,
  * `CcRouteSpec`, extended to BFS levels, k-core peeling, and label
  * propagation — the three operators whose per-round values are exact
  * integers, so a driver loop is bit-identical by construction).
  *
  * Each test pins local ≡ distributed on the shapes the faces' oracles
  * hash; the gate-disabled runs keep exercising the distributed machinery
  * the gate bypasses at fixture scale (at 100 TB the edge list exceeds
  * any sane gate and that machinery is the path). pageRank is untested
  * here because it is deliberately NOT gated (float addition order).
  */
class GraphLocalSpec extends SparkSpec {

  import spark.implicits._

  /** Run `body` with the graph local-finish gate disabled. */
  private def distributedOnly[T](body: => T): T = {
    spark.conf.set("spark.graft.graph.localMaxEdges", "0")
    try body
    finally spark.conf.unset("spark.graft.graph.localMaxEdges")
  }

  private def sameRows(a: org.apache.spark.sql.DataFrame,
      b: org.apache.spark.sql.DataFrame, what: String): Unit =
    assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0,
      s"$what: local vs distributed disagree")

  // a graph with a deep chain, a hub, a cycle, and an unreachable island —
  // exercises min-distance semantics, frontier shrink, and the depth cap
  private def bfsEdges() = {
    val dir = (1L until 40L).map(i => (i, i + 1)) ++ // chain from 1
      (100L to 120L).map(i => (3L, i)) ++            // hub off node 3
      Seq((120L, 1L)) ++                             // cycle back
      Seq((900L, 901L), (901L, 902L))                // unreachable island
    (dir ++ dir.map(_.swap)).toDF("src", "dst")
  }

  test("bfs: gated local levels == distributed frontier loop") {
    val local = GraphQueries.bfs(bfsEdges(), col("node") === 1L, maxDepth = 5)
    val dist = distributedOnly {
      GraphQueries.bfs(bfsEdges(), col("node") === 1L, maxDepth = 5)
    }
    sameRows(local, dist, "bfs levels")
    // depth cap respected and min-distance semantics hold on the cycle
    val m = local.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(m(1L) == 0 && m(2L) == 1 && m(3L) == 2 && m(100L) == 3)
    assert(m(120L) == 1, "cycle node is source-adjacent via (120,1), not " +
      "chain- or hub-distant — min-distance semantics")
    assert(!m.contains(900L), "island stays unreached")
    assert(m.values.max <= 5)
  }

  test("bfs: multi-source predicate evaluated by the engine") {
    // a predicate no driver loop could guess (modulo on the node id):
    // sources = every node % 17 == 0 — the local route must evaluate it
    // via Spark over the node frame, identically to the distributed init
    val pred = col("node") % 17 === 0
    val local = GraphQueries.bfs(bfsEdges(), pred, maxDepth = 2)
    val dist = distributedOnly { GraphQueries.bfs(bfsEdges(), pred, maxDepth = 2) }
    sameRows(local, dist, "multi-source bfs")
  }

  test("kCore: gated local peeling == distributed rounds, cascades included") {
    // two 4-cliques joined by a chain of degree-2 nodes: k=3 must peel the
    // chain AND nothing else; the cascade (chain ends lose support only
    // after inner chain nodes go) needs multiple rounds
    val cliqueA = for { u <- 1L to 4L; v <- 1L to 4L if u < v } yield (u, v)
    val cliqueB = for { u <- 11L to 14L; v <- 11L to 14L if u < v } yield (u, v)
    val chain = Seq((4L, 21L), (21L, 22L), (22L, 11L))
    val e = (cliqueA ++ cliqueB ++ chain).toDF("u", "v")
    val local = GraphQueries.kCore(e, k = 3, iters = 10)
    val dist = distributedOnly {
      GraphQueries.kCore(
        (cliqueA ++ cliqueB ++ chain).toDF("u", "v"), k = 3, iters = 10)
    }
    sameRows(local, dist, "kCore")
    val m = local.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(m.keySet === (1L to 4L).toSet ++ (11L to 14L).toSet)
    assert(m.values.forall(_ == 3L), "within-core degrees after the chain peels")
  }

  test("kCore: iteration cap (not just fixpoint) matches distributed") {
    // a long chain peels one layer per round from each end; capping iters
    // below convergence must leave the SAME partial graph on both routes
    val e = (1L until 30L).map(i => (i, i + 1)).toDF("u", "v")
    val local = GraphQueries.kCore(e, k = 2, iters = 3)
    val dist = distributedOnly {
      GraphQueries.kCore((1L until 30L).map(i => (i, i + 1)).toDF("u", "v"),
        k = 2, iters = 3)
    }
    sameRows(local, dist, "iteration-capped kCore")
  }

  test("labelPropagation: gated local rounds == distributed, ties included") {
    // two triangles across a bridge (community separation) plus a lone
    // edge (2-cycle label swap under synchronous LPA — the tie/oscillation
    // shape where a wrong argmax order would diverge)
    def edges() = (Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (11L, 12L), (12L, 13L), (11L, 13L), (3L, 11L)) ++
      Seq((50L, 51L))).toDF("u", "v")
    for (rounds <- Seq(3, 4)) {
      val local = GraphQueries.labelPropagation(edges(), rounds)
      val dist = distributedOnly {
        GraphQueries.labelPropagation(edges(), rounds)
      }
      sameRows(local, dist, s"labelPropagation rounds=$rounds")
    }
  }

  test("local route engages by default and the gate disables it") {
    // observability: the local result is a LocalRelation-backed frame (or
    // parallelized RDD above the embed threshold); the distributed result
    // carries the join/aggregate lineage
    val e = (1L to 20L).map(i => (i, i + 1)).toDF("u", "v")
    val local = GraphQueries.kCore(e, k = 2, iters = 5)
    assert(local.queryExecution.optimizedPlan.collectLeaves().forall(l =>
      l.isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.LocalRelation]),
      "default gate must resolve a fixture-sized graph locally")
    val dist = distributedOnly { GraphQueries.kCore(
      (1L to 20L).map(i => (i, i + 1)).toDF("u", "v"), k = 2, iters = 5) }
    assert(!dist.queryExecution.optimizedPlan.collectLeaves().forall(l =>
      l.isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.LocalRelation]),
      "gate=0 must keep the distributed lineage")
  }

  test("non-integral ids keep the distributed path under the default gate") {
    // string node ids: UTF-8 vs UTF-16 ordering risk (the localComponents
    // rationale) — the gate must not collect these
    val e = Seq(("a", "b"), ("b", "c"), ("x", "y")).toDF("u", "v")
    val got = GraphQueries.labelPropagation(e, rounds = 2)
    assert(!got.queryExecution.optimizedPlan.collectLeaves().forall(l =>
      l.isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.LocalRelation]),
      "string-keyed graphs must stay distributed")
    assert(got.count() == 5)
  }
}
