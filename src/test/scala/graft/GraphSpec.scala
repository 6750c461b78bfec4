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

  test("personalized restart concentrates mass near the seed and zeroes unreachable nodes") {
    // seed {a}: d has no in-edges and p(d) = 0, so its rank is exactly 0
    // every iteration; a (the seed, fed back by c) dominates.
    val restart = Seq(("a", 1.0)).toDF("node", "p")
    val r = GraphQueries.pageRank(edges, iters = 10, restart = Some(restart))
      .collect().map(x => x.getString(0) -> x.getDouble(1)).toMap
    assert(r.keySet === Set("a", "b", "c", "d"))
    assert(r("d") == 0.0, s"unreachable non-seed must hold rank 0: $r")
    assert(r("a") == r.values.max, s"seed should dominate: $r")
    // personalized mass is a probability-like quantity: total stays ~1,
    // not ~n (uniform PageRank's scale)
    assert(math.abs(r.values.sum - 1.0) < 0.1, s"mass should stay near 1: $r")
  }

  test("personalized tol early exit lands on the fixed iteration's fixed point") {
    val restart = Seq(("a", 0.5), ("d", 0.5)).toDF("node", "p")
    val converged = GraphQueries.pageRank(edges, iters = 50, tol = Some(1e-6),
      restart = Some(restart)).orderBy("node").collect()
    val fixed = GraphQueries.pageRank(edges, iters = 50, restart = Some(restart))
      .orderBy("node").collect()
    assert(converged.length == fixed.length)
    converged.zip(fixed).foreach { case (c, f) =>
      assert(c.getString(0) == f.getString(0))
      assert(math.abs(c.getDouble(1) - f.getDouble(1)) <= 2e-6,
        s"${c.getString(0)}: ${c.getDouble(1)} vs ${f.getDouble(1)}")
    }
  }

  test("triangleStats on a hand-counted graph") {
    // bowtie-with-tail: triangles {1,2,3} and {2,3,4} share edge (2,3);
    // node 5 dangles off 4. Degrees 2,3,3,3,1 → wedges 1+3+3+3+0 = 10.
    val e = Seq((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L), (4L, 5L))
      .toDF("u", "v")
    val r = GraphQueries.triangleStats(e).collect()(0)
    assert(r.getLong(r.fieldIndex("n_nodes")) == 5L)
    assert(r.getLong(r.fieldIndex("n_edges")) == 6L)
    assert(r.getLong(r.fieldIndex("n_wedges")) == 10L)
    assert(r.getLong(r.fieldIndex("n_triangles")) == 2L)
    assert(r.getDouble(r.fieldIndex("global_cc")) == 0.6)
  }

  test("kCore peels cascades, not just first-round low-degree nodes") {
    // K4 on {1,2,3,4} plus a pendant chain 4-5-6: node 6 (deg 1) falls in
    // round 1, which drops 5 to deg 1 so it falls in round 2 — a 2-core
    // needs the CASCADE, not a single filter pass. The K4 survives with
    // all within-core degrees back at 3.
    val e = ((1L to 4L).flatMap(a => (a + 1 to 4L).map(b => (a, b)))
      ++ Seq((4L, 5L), (5L, 6L))).toDF("u", "v")
    val core = GraphQueries.kCore(e, k = 2, iters = 5).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(core === Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    // early exit: extra iterations past the fixpoint change nothing
    val more = GraphQueries.kCore(e, k = 2, iters = 50).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(more === core)
    // a k above the densest degree empties the graph
    assert(GraphQueries.kCore(e, k = 4, iters = 5).isEmpty)
  }

  test("random graphs: census and k-core agree with in-memory brute force") {
    // seeded-random graphs exercise the cases hand fixtures miss (degree
    // ties under orientation, cascades of mixed depth, disconnected bits);
    // brute force is trivially correct at n=10
    val rnd = new scala.util.Random(42)
    (1 to 5).foreach { trial =>
      val n = 6 + rnd.nextInt(5)
      val all = for (a <- 1 to n; b <- a + 1 to n) yield (a.toLong, b.toLong)
      val edges = all.filter(_ => rnd.nextDouble() < 0.4)
      if (edges.nonEmpty) {
        val eSet = edges.toSet
        val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
        val deg = nodes.map(v => v ->
          edges.count(e => e._1 == v || e._2 == v).toLong).toMap
        val triBrute = (for {
          a <- nodes; b <- nodes if a < b; c <- nodes if b < c
          if eSet((a, b)) && eSet((b, c)) && eSet((a, c))
        } yield 1).size.toLong
        val wedgeBrute = deg.values.map(d => d * (d - 1) / 2).sum
        val r = GraphQueries.triangleStats(edges.toDF("u", "v")).collect()(0)
        assert(r.getLong(r.fieldIndex("n_nodes")) == nodes.size.toLong, s"trial $trial")
        assert(r.getLong(r.fieldIndex("n_edges")) == edges.size.toLong, s"trial $trial")
        assert(r.getLong(r.fieldIndex("n_wedges")) == wedgeBrute, s"trial $trial")
        assert(r.getLong(r.fieldIndex("n_triangles")) == triBrute, s"trial $trial")
        // brute-force peel to the true 2-core fixpoint
        var core = eSet
        var changed = true
        while (changed) {
          val d2 = core.toSeq.flatMap(e => Seq(e._1, e._2))
            .groupBy(identity).view.mapValues(_.size).toMap
          val next = core.filter(e => d2(e._1) >= 2 && d2(e._2) >= 2)
          changed = next != core
          core = next
        }
        val want = core.toSeq.flatMap(e => Seq(e._1, e._2))
          .groupBy(identity).view.mapValues(_.size.toLong).toMap
        val got = GraphQueries.kCore(edges.toDF("u", "v"), k = 2, iters = 20)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(got == want, s"trial $trial: $got vs $want")
      }
    }
  }

  test("labelPropagation separates two triangles across a bridge") {
    // two triangles {1,2,3} and {4,5,6} joined by the bridge (3,4). Traced
    // by hand round by round (min-label tiebreak): by round 3 the left
    // triangle settles on label 1, the right on label 3 (the bridge pulls
    // 3's early label into the right community), and round 4 is a no-op.
    val e = Seq((1L, 2L), (1L, 3L), (2L, 3L), (4L, 5L), (4L, 6L), (5L, 6L),
      (3L, 4L)).toDF("u", "v")
    val got = GraphQueries.labelPropagation(e, rounds = 4).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 3L, 5L -> 3L,
      6L -> 3L))
    // converged: extra rounds change nothing
    val more = GraphQueries.labelPropagation(e, rounds = 7).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(more === got)
  }

  test("labelPropagation is deterministic under vote ties") {
    // a lone edge is the worst tie case: each node's single neighbor vote
    // swaps the labels every round (the classic sync-LPA 2-cycle). The
    // fixed unroll makes that deterministic: even rounds = identity,
    // odd rounds = swapped — never a coin flip.
    val e = Seq((1L, 2L)).toDF("u", "v")
    val odd = GraphQueries.labelPropagation(e, rounds = 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(odd === Map(1L -> 2L, 2L -> 1L))
    val even = GraphQueries.labelPropagation(e, rounds = 4).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(even === Map(1L -> 1L, 2L -> 2L))
  }

  test("triangleStats counts each triangle once regardless of degree ties") {
    // K4: every node degree 3 (all tied — orientation falls back to the id
    // tiebreak); C(4,3)=4 triangles, wedges 4*C(3,2)=12, cc = 12/12 = 1.
    val k4 = (1L to 4L).flatMap(a => (a + 1 to 4L).map(b => (a, b)))
      .toDF("u", "v")
    val r = GraphQueries.triangleStats(k4).collect()(0)
    assert(r.getLong(r.fieldIndex("n_triangles")) == 4L)
    assert(r.getDouble(r.fieldIndex("global_cc")) == 1.0)
  }

}
