package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Checkpoints.TrackedOps

/** Iterative graph computation over relational edge lists — the operator
  * family beyond connected components (Dedup.connectedComponents): rank
  * propagation by repeated join+aggregate, the distributed-graph shape that
  * needs no graph framework because each iteration IS a keyed join.
  *
  * Scale shape per iteration: edges ⋈ ranks on the source key (one
  * shuffle), per-destination sum (one partial-agg shuffle), left join back
  * onto the node set. Edge and rank partitioning is stable across
  * iterations, so at 100 TB the iterated joins reuse the same hash
  * partitioning end-to-end; ranks are rounded 6dp per iteration so the
  * DuckDB replay (same unrolled iterations) is float-exact.
  */
object GraphQueries {
  private type Q = (SparkSession, String) => DataFrame

  private val damping = 0.85
  private val iters = 3

  /** Size gate for the driver-local finishes of the EXACT-INTEGER
    * iterative graph operators ([[bfs]], [[kCore]], [[labelPropagation]]):
    * edge lists at or below this row count are resolved on the driver in
    * one bounded collect instead of O(rounds) cluster barriers — the
    * round-20 connected-components recipe (Dedup.localComponents) applied
    * to the rest of the iterative family (round-20 verdict item 4). Same
    * posture as `spark.graft.cc.localMaxEdges`: parameterized, <= 0
    * disables, 2M edges ≈ 32 MB of raw longs; at 100 TB the edge list
    * blows past any sane gate and the distributed rounds run unchanged
    * (spec-pinned with the gate disabled). pageRank is deliberately NOT
    * gated: its per-round values are floating-point sums whose addition
    * order differs between a driver loop and the distributed aggregate —
    * only the integer-exact operators (BFS levels, k-core peeling, LPA
    * argmax votes) can promise bit-identical results on both routes.
    */
  private def localMaxEdges(df: DataFrame): Long =
    df.sparkSession.conf.getOption("spark.graft.graph.localMaxEdges")
      .flatMap(_.toLongOption).getOrElse(2000000L)

  private def integralCols(df: DataFrame, c1: String, c2: String): Boolean = {
    import org.apache.spark.sql.types._
    val dt = df.schema(c1).dataType
    (dt == LongType || dt == IntegerType || dt == ShortType) &&
      df.schema(c2).dataType == dt
  }

  /** Collect a gate-checked integral edge frame as (long, long) pairs;
    * null endpoints dropped (the distributed paths' equi-joins never match
    * them). The caller has already counted the frame against
    * [[localMaxEdges]], so the collect is bounded by construction.
    */
  private def collectEdges(df: DataFrame, c1: String, c2: String): Array[(Long, Long)] =
    df.select(col(c1).cast("long"), col(c2).cast("long"))
      .filter(col(c1).isNotNull && col(c2).isNotNull)
      .collect().map(r => (r.getLong(0), r.getLong(1)))

  /** Ship a driver-computed (long, long) result back as a DataFrame with
    * the operator's output schema. Small results stay a LocalRelation
    * (exact size statistic → consumers can broadcast them); large ones
    * parallelize so the rows are not embedded in every downstream plan
    * (the Dedup.localComponents recipe).
    */
  private def localResult(spark: SparkSession, rows: Seq[(Long, Long)],
      c1: String, t1: org.apache.spark.sql.types.DataType,
      c2: String, t2: org.apache.spark.sql.types.DataType): DataFrame = {
    import spark.implicits._
    val df =
      if (rows.length <= 100000) rows.toDF(c1, c2)
      else spark.sparkContext.parallelize(rows,
        math.max(1, math.min(spark.sparkContext.defaultParallelism,
          rows.length / 100000))).toDF(c1, c2)
    df.select(col(c1).cast(t1).as(c1), col(c2).cast(t2).as(c2))
  }

  /** Power-iteration PageRank over an (src, dst) edge frame.
    *
    * Setup materializes ONE iteration-invariant frame — the edges with
    * their source's out-degree attached (the standard edge-weight
    * preprocessing; +8 bytes/edge at any scale) — so each iteration is a
    * single keyed join (weighted edges ⋈ ranks on src) plus one
    * per-destination partial aggregation. No explicit repartition: the
    * checkpointed RDD reports UnknownPartitioning downstream regardless
    * (measured: a pre-checkpoint repartition is a pure extra shuffle),
    * and the iteration joins size themselves via AQE — broadcast of the
    * rank frame at small sf, shuffle join at cluster scale.
    *
    * @param edges           directed (src, dst) edge frame
    * @param iters           maximum power iterations
    * @param damping         PageRank damping factor
    * @param tol             optional convergence stop: terminate once the
    *                        max |pr − prev_pr| over all nodes falls below
    *                        it. Each check is one scalar-only driver
    *                        action per iteration, so leave it None (fixed
    *                        iteration count, fully lazy chain) when the
    *                        count is small and known.
    * @param checkpointEvery bound the lazy plan depth: every this-many
    *                        iterations the rank frame is checkpointed (the
    *                        connectedComponents recipe, Dedup.scala) so a
    *                        50-iteration run does not analyze a 150-join
    *                        plan. Between checkpoints the chain stays lazy
    *                        — at 3 iterations one pipelined job beats
    *                        three serial checkpoint jobs (measured 4.2s
    *                        vs 5.7s in round 3).
    * @param hasDanglingNodes when false (e.g. a symmetrized graph, where
    *                        every node necessarily receives edges), the
    *                        per-iteration left join that re-attaches
    *                        zero-in-degree nodes is skipped — the
    *                        aggregation output already covers every node.
    * @param restart         PERSONALIZED PageRank: a (node, p) frame — the
    *                        restart distribution, concentrated on a seed
    *                        set (nodes absent from it restart with p = 0).
    *                        The teleport term becomes (1−d)·p(v) instead of
    *                        the uniform (1−d), and iteration starts from p
    *                        rather than all-ones — rank mass then measures
    *                        proximity to the seeds (recommendation /
    *                        attribution), not global centrality. The seed
    *                        frame is |seeds|-sized, hence BROADCAST into
    *                        each iteration — zero extra shuffles at any
    *                        graph scale. Callers pre-round p to 6dp so the
    *                        oracle replay is float-exact.
    */
  def pageRank(edges: DataFrame, iters: Int, damping: Double = GraphQueries.damping,
               tol: Option[Double] = None, checkpointEvery: Int = 5,
               hasDanglingNodes: Boolean = true,
               restart: Option[DataFrame] = None): DataFrame = {
    // DISK-backed checkpoint level for the graph-scale frames: a 100x edge
    // list is GBs of rows, and local mode shares one heap between driver
    // and executors. MEMORY_AND_DISK_SER was measured to still OOM an 8g
    // heap — on READ of an evicted block Spark re-inflates the disk bytes
    // into a memory ChunkedByteBuffer (BlockManager.
    // maybeCacheDiskBytesInMemory), so eviction doesn't actually bound the
    // footprint. DISK_ONLY has no memory half to re-cache into; the OS
    // page cache serves the re-reads, and the fixture-scale cost is noise
    // next to the joins that consume the frame (round-9 advice #5 — the
    // 100x pr1 leg now completes at the default 8g heap).
    val ser = org.apache.spark.storage.StorageLevel.DISK_ONLY
    val both = graft.ops.Checkpoints.tracked(edges, ser)
    val deg = graft.ops.Checkpoints.tracked(
      both.groupBy("src").agg(count(lit(1)).as("outdeg")), ser)
    // outdeg rides each edge so iterations never re-join the degree frame;
    // the contribution stays pr/outdeg (NOT a premultiplied 1/outdeg —
    // that would change the float rounding vs the oracle's division).
    // Materialize the weighted edges only for deep runs: at few iterations
    // re-deriving the (broadcast) degree join lazily beats paying a third
    // checkpoint job (measured 2.3s vs 2.9s warm at sf0.1, iters=3).
    val weighted0 = both.join(deg, "src")
    val weighted =
      if (iters > 4) graft.ops.Checkpoints.tracked(weighted0, ser) else weighted0
    val nodes = deg.select(col("src").as("node"))
    var ranks = restart match {
      case None => nodes.withColumn("pr", lit(1.0))
      case Some(r) => nodes.join(broadcast(r), Seq("node"), "left")
        .select(col("node"), coalesce(col("p"), lit(0.0)).as("pr"))
    }
    var i = 0
    var converged = false
    // Superseded rank checkpoints are released as soon as a NEWER one has
    // materialized past them (the connectedComponents pattern). The scope
    // would only free them at face end — O(iters/checkpointEvery) full
    // rank frames held at once, which is what pushed the 100x graph legs
    // to a 64g driver heap in LOCAL mode (round-9 run note; driver and
    // executors share one heap there). Release waits until after the tol
    // delta check: that check joins the PREVIOUS ranks frame.
    var prevCkpt: DataFrame = null
    while (i < iters && !converged) {
      i += 1
      val joined = weighted
        .join(ranks, col("src") === col("node"))
        .select(col("dst"), (col("pr") / col("outdeg")).as("c"))
      // teleport term: uniform (1−d), or (1−d)·p(v) when personalized
      val base = restart match {
        case None => lit(1 - damping)
        case Some(_) => lit(1 - damping) * coalesce(col("p"), lit(0.0))
      }
      val newPr =
        round(base + lit(damping) * coalesce(col("in_sum"), lit(0.0)), 6)
      val next =
        if (tol.isEmpty) {
          // fixed-iteration path (every oracle-hashed face): UNCHANGED
          // shape — the float addition context must stay bit-stable.
          val contrib = joined.groupBy("dst").agg(sum(col("c")).as("in_sum"))
          val withNode =
            if (hasDanglingNodes)
              nodes.join(contrib, col("node") === col("dst"), "left")
                .select(col("node"), col("in_sum"))
            else
              contrib.select(col("dst").as("node"), col("in_sum"))
          (restart match {
            case None => withNode
            case Some(r) => withNode.join(broadcast(r), Seq("node"), "left")
          }).select(col("node"), newPr.as("pr"))
        } else {
          // tol mode (round-21, guide §2.4): the previous rank rides the
          // contribution aggregate as a per-node SELF row (the
          // connectedComponents union trick), so (a) the convergence delta
          // becomes one aggregate SCAN over the fresh checkpoint — the
          // first cut joined two checkpointed frames per round just to
          // subtract columns — and (b) the dangling-node re-attach join
          // disappears too: ranks covers every node, so the union output
          // IS the node set (dangling nodes arrive with in_sum null
          // exactly like the old left join). Rows for a dst that is not a
          // node (an in-edge-only sink under hasDanglingNodes) carry a
          // null __prev — filtered, matching the old nodes join. Two
          // node-keyed joins per round become zero; sum(c) skips the null
          // self rows so the value is the same quantity (tol mode has no
          // oracle faces; the spec compares tol vs fixed at 2e-6, above
          // any sum-order ulp).
          val selfRows = ranks.select(col("node").as("dst"),
            lit(null).cast("double").as("c"), col("pr").as("p0"))
          val agg = joined
            .select(col("dst"), col("c"), lit(null).cast("double").as("p0"))
            .unionByName(selfRows)
            .groupBy("dst")
            .agg(sum(col("c")).as("in_sum"), max(col("p0")).as("__prev"))
            .filter(col("__prev").isNotNull)
            .withColumnRenamed("dst", "node")
          (restart match {
            case None => agg
            case Some(r) => agg.join(broadcast(r), Seq("node"), "left")
          }).select(col("node"), newPr.as("pr"), col("__prev"))
        }
      // A convergence check materializes the frame anyway, so checkpoint
      // on every checked iteration; otherwise only at the depth bound.
      val checkpointed = tol.isDefined || i % checkpointEvery == 0
      val bounded = if (checkpointed) next.trackedCheckpoint() else next
      tol.foreach { t =>
        val delta = bounded
          .agg(max(abs(col("pr") - col("__prev")))).head.getDouble(0)
        if (delta < t) converged = true
      }
      if (checkpointed) {
        // the new checkpoint is EAGER, so everything derived from the old
        // one has materialized — its blocks can go now
        if (prevCkpt != null) graft.ops.Checkpoints.release(prevCkpt)
        prevCkpt = bounded
      }
      ranks = bounded
    }
    if (tol.isEmpty) ranks else ranks.select(col("node"), col("pr"))
  }

  /** Frontier BFS over an (src, dst) edge frame: per round, the frontier
    * joins the edges (one keyed shuffle), discovered nodes join-anti the
    * visited set, and the (small, scalar-checked) frontier size decides
    * termination — the complement of [[pageRank]]'s fixed-work iterations:
    * here per-round work SHRINKS with the frontier, the shape of
    * reachability / impact-radius queries over relational edge lists.
    * Visited and edge frames are checkpointed per round (the frames are
    * iteration-CARRIED here, unlike pageRank's invariant edge frame).
    */
  def bfs(edges: DataFrame, sourceFilter: Column, maxDepth: Int): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit, min => fmin}
    // disk-backed level for the scale-sized edge frame (see pageRank)
    val both = graft.ops.Checkpoints.tracked(edges,
      org.apache.spark.storage.StorageLevel.DISK_ONLY)
    // ENTRY GATE (round-20 verdict item 4 — the CC recipe): a bounded
    // integral edge list runs the level-synchronous BFS on the driver —
    // bit-identical levels (BFS distances are exact integers, no float
    // order sensitivity), none of the O(depth) checkpoint+isEmpty
    // barriers. The count reads the just-materialized checkpoint blocks.
    val gate = localMaxEdges(both)
    if (gate > 0 && integralCols(both, "src", "dst") && both.count() <= gate)
      return localBfs(both, sourceFilter, maxDepth)
    var visited = both.select(col("src").as("node")).unionByName(
        both.select(col("dst").as("node"))).distinct()
      .filter(sourceFilter)
      .withColumn("dist", lit(0L))
      .trackedCheckpoint()
    var frontier = visited
    var depth = 0
    while (depth < maxDepth && !frontier.isEmpty) {
      depth += 1
      val next = both.join(frontier, col("src") === col("node"))
        .select(col("dst").as("node")).distinct()
        .join(visited, Seq("node"), "left_anti")
        .withColumn("dist", lit(depth.toLong))
        .trackedCheckpoint()
      // visited stays a lazy union of CHECKPOINTED frontiers — each round's
      // anti-join re-reads materialized blocks, never recomputes a lineage,
      // and skipping the per-round visited materialization saves one job
      // per depth (measured 4.0s → 3.4s warm at sf0.1, depth 4)
      visited = visited.unionByName(next)
      frontier = next
    }
    visited
  }

  /** Driver-local level-synchronous multi-source BFS over a BOUNDED
    * integral edge list — one collect, one adjacency pass, one frame back.
    * The source predicate is still evaluated BY SPARK over the distinct
    * node frame (one small job), so arbitrary filter Columns keep engine
    * semantics; only the iteration moves to the driver. Distances are
    * exact integers (dist = first level reached), so the result is
    * bit-identical to the distributed frontier loop by construction.
    */
  private def localBfs(both: DataFrame, sourceFilter: Column,
      maxDepth: Int): DataFrame = {
    val dt = both.schema("src").dataType
    val edges = collectEdges(both, "src", "dst")
    val sources = both.select(col("src").as("node")).unionByName(
        both.select(col("dst").as("node"))).distinct()
      .filter(sourceFilter)
      .select(col("node").cast("long")).filter(col("node").isNotNull)
      .collect().map(_.getLong(0))
    val adj = new scala.collection.mutable.HashMap[Long,
      scala.collection.mutable.ArrayBuffer[Long]]
    edges.foreach { case (s, d) =>
      adj.getOrElseUpdate(s,
        scala.collection.mutable.ArrayBuffer.empty[Long]) += d
    }
    val dist = new scala.collection.mutable.HashMap[Long, Long]
    sources.foreach(dist(_) = 0L)
    var frontier: Seq[Long] = sources.toSeq
    var depth = 0
    while (depth < maxDepth && frontier.nonEmpty) {
      depth += 1
      val next = scala.collection.mutable.ArrayBuffer.empty[Long]
      frontier.foreach { n =>
        adj.get(n).foreach(_.foreach { m =>
          if (!dist.contains(m)) { dist(m) = depth.toLong; next += m }
        })
      }
      frontier = next.toSeq
    }
    localResult(both.sparkSession, dist.toSeq, "node", dt,
      "dist", org.apache.spark.sql.types.LongType)
  }

  /** Triangle census over an undirected edge frame (one row per edge,
    * `u` < `v`, already distinct): returns ONE row of independently
    * derivable graph invariants — node/edge counts, wedge count
    * (Σ C(deg,2)), triangle count, and the global clustering coefficient
    * (3·triangles / wedges).
    *
    * The triangle join uses DEGREE ORIENTATION (each edge directed from
    * the (deg, id)-smaller endpoint to the larger), the standard trick
    * that caps every node's out-degree at O(√m): the wedge self-join then
    * emits at most Σ C(outdeg,2) ≤ m·√m candidate pairs instead of the
    * Σ C(deg,2) a hub-centered join would — on a skewed degree
    * distribution (every real co-occurrence graph) that is the difference
    * between linear-ish and quadratic-in-the-hub. Each triangle {a≺b≺c}
    * is generated exactly once, as the wedge (a→b, a→c) closed by the
    * oriented edge b→c, so no post-hoc /3 or /6 correction is needed.
    * The orientation key is the (deg, node) STRUCT compared
    * lexicographically — no global rank assignment (a row_number over all
    * nodes would be a single-reducer sort at graph scale).
    *
    * Scale shape: two keyed shuffles to attach endpoint degrees, one
    * self-join on the wedge apex (both sides identically hash-partitioned
    * on src — one exchange each, reused), one semi-join to close. The
    * edge frame is checkpoint-tracked (consumed by degrees + both join
    * sides).
    */
  /** Per-node degree of an undirected edge frame (one row per edge,
    * `u` < `v`, distinct) — the shared contract of [[triangleStats]] and
    * [[kCore]]: both endpoint columns stacked and counted.
    */
  private def degrees(edges: DataFrame): DataFrame =
    edges.select(col("u").as("node"))
      .unionByName(edges.select(col("v").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg"))

  def triangleStats(edges: DataFrame): DataFrame = {
    val e = graft.ops.Checkpoints.tracked(edges,
      org.apache.spark.storage.StorageLevel.DISK_ONLY)
    val deg = degrees(e)
    // attach each endpoint's degree, then orient low→high by (deg, id)
    val withDeg = e
      .join(deg.select(col("node").as("u"), col("deg").as("du")), "u")
      .join(deg.select(col("node").as("v"), col("deg").as("dv")), "v")
    val uKey = struct(col("du").as("d"), col("u").as("n"))
    val vKey = struct(col("dv").as("d"), col("v").as("n"))
    val oriented = graft.ops.Checkpoints.tracked(
      withDeg.select(
        when(uKey < vKey, col("u")).otherwise(col("v")).as("src"),
        when(uKey < vKey, col("v")).otherwise(col("u")).as("dst"),
        when(uKey < vKey, vKey).otherwise(uKey).as("dst_key")),
      org.apache.spark.storage.StorageLevel.DISK_ONLY)
    val wedges = oriented.select(col("src"), col("dst").as("a"), col("dst_key").as("ka"))
      .join(oriented.select(col("src"), col("dst").as("b"), col("dst_key").as("kb")), "src")
      .filter(col("ka") < col("kb"))
      .select(col("a").as("src"), col("b").as("dst"))
    val tri = wedges.join(oriented.select("src", "dst"), Seq("src", "dst"), "left_semi")
      .agg(count(lit(1)).as("n_triangles"))
    // `div`, not `/`: Spark's / on longs is DOUBLE division, which stops
    // being exact past 2^53 — wedge sums at graph scale get there
    val counts = deg.agg(
      count(lit(1)).as("n_nodes"),
      expr("sum(deg) div 2").as("n_edges"),
      sum(expr("deg * (deg - 1) div 2")).as("n_wedges"))
    // two 1-row frames — the cross join is a no-op at scale
    // zero-guard: on a triangle-free wedge-free graph (e.g. a perfect
    // matching) non-ANSI double division yields NaN while the SQL oracle's
    // division by zero yields NULL — both faces must agree on NULL
    counts.crossJoin(tri).select(
      col("n_nodes"), col("n_edges"), col("n_wedges"), col("n_triangles"),
      when(col("n_wedges") > 0,
        round(lit(3.0) * col("n_triangles") / col("n_wedges"), 6)).as("global_cc"))
  }

  /** k-core decomposition by iterative peeling: drop every node of degree
    * < k, re-derive degrees over the SHRUNK graph, repeat. The third
    * iterative-graph shape in the module — pageRank's per-iteration work is
    * fixed, bfs's frontier shrinks, here the GRAPH itself shrinks (each
    * round is two left-semi joins against the surviving node set plus one
    * degree agg, all keyed — cheaper every round).
    *
    * Termination: a fixpoint early-exit (edge count unchanged — peeling
    * only removes, so equal count ⇒ no node fell below k) bounded by
    * `iters`. Because a post-fixpoint round is a no-op, a run capped at
    * `iters` is EXACTLY equivalent to `iters` unrolled rounds — which is
    * what the kc1 oracle replays, so early exit can never diverge from it.
    * Per-round frames are checkpoint-tracked and superseded checkpoints
    * released (the pageRank recipe); the fixpoint check reads one scalar
    * count off the already-materialized frame.
    */
  def kCore(edges: DataFrame, k: Int, iters: Int): DataFrame = {
    val ser = org.apache.spark.storage.StorageLevel.DISK_ONLY
    var cur = graft.ops.Checkpoints.tracked(edges, ser)
    var curCount = cur.count()
    // ENTRY GATE (see localMaxEdges): the loop already counts the
    // checkpointed edge frame for its fixpoint test, so the gate is free —
    // a bounded integral graph peels on the driver (pure integer degrees,
    // bit-identical by construction) instead of paying two count+checkpoint
    // barriers per round.
    val kcGate = localMaxEdges(cur)
    if (kcGate > 0 && curCount <= kcGate && integralCols(cur, "u", "v")) {
      val r = localKCore(cur, k, iters)
      graft.ops.Checkpoints.release(cur)
      return r
    }
    var prevCkpt = cur
    var i = 0
    var stable = false
    while (i < iters && !stable) {
      i += 1
      val keep = degrees(cur).filter(col("deg") >= k).select("node")
      val next = graft.ops.Checkpoints.tracked(
        cur.join(keep.select(col("node").as("u")), Seq("u"), "left_semi")
          .join(keep.select(col("node").as("v")), Seq("v"), "left_semi"), ser)
      val nextCount = next.count()
      graft.ops.Checkpoints.release(prevCkpt)
      prevCkpt = next
      stable = nextCount == curCount
      cur = next
      curCount = nextCount
    }
    degrees(cur)
  }

  /** Driver-local k-core peeling over a BOUNDED integral edge list — the
    * same round structure as the distributed loop (degrees over the
    * current graph, keep nodes with deg >= k, keep edges with both
    * endpoints kept, stop at the edge-count fixpoint bounded by `iters`),
    * all in exact integers, so the surviving (node, within-core degree)
    * rows are bit-identical by construction.
    */
  private def localKCore(edgesDf: DataFrame, k: Int, iters: Int): DataFrame = {
    val dt = edgesDf.schema("u").dataType
    var edges = collectEdges(edgesDf, "u", "v")
    var i = 0
    var stable = false
    while (i < iters && !stable) {
      i += 1
      val deg = new scala.collection.mutable.HashMap[Long, Long]
      edges.foreach { case (u, v) =>
        deg(u) = deg.getOrElse(u, 0L) + 1; deg(v) = deg.getOrElse(v, 0L) + 1
      }
      val next = edges.filter { case (u, v) => deg(u) >= k && deg(v) >= k }
      stable = next.length == edges.length
      edges = next
    }
    val deg = new scala.collection.mutable.HashMap[Long, Long]
    edges.foreach { case (u, v) =>
      deg(u) = deg.getOrElse(u, 0L) + 1; deg(v) = deg.getOrElse(v, 0L) + 1
    }
    localResult(edgesDf.sparkSession, deg.toSeq, "node", dt,
      "deg", org.apache.spark.sql.types.LongType)
  }

  /** Synchronous label propagation — community detection over an undirected
    * edge frame (one row per edge, `u` < `v`, distinct). Every node starts
    * labeled with its own id; each round it adopts the most frequent label
    * among its NEIGHBORS, ties broken by the smallest label (the
    * deterministic variant of classic LPA — no RNG, no visit order, so the
    * unrolled-SQL oracle replays it bit-exact). The fourth iterative-graph
    * shape in the module: pageRank's per-round work is fixed, bfs shrinks
    * the frontier, kCore shrinks the graph — here per-round work is fixed
    * like pageRank but the VALUE domain (labels) converges.
    *
    * Synchronous LPA can 2-cycle on bipartite structures (a lone edge swaps
    * labels forever); a fixed round count replays identically in both
    * engines, so the oracle can never diverge — callers pick `rounds` for
    * the community resolution they want, not for termination.
    *
    * Scale shape per round: one keyed equi-join (edges ⋈ labels on the
    * source key — the same stable hash partitioning every round), one
    * (node, label) partial-agg count, one per-node window to pick the
    * winning label. Rows per window partition = the node's DISTINCT
    * neighbor-label count ≤ degree, the same per-hub bound tc1's oriented
    * wedge join carries. Per-round label frames are checkpoint-tracked and
    * superseded checkpoints released (the pageRank recipe).
    */
  def labelPropagation(edges: DataFrame, rounds: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ser = org.apache.spark.storage.StorageLevel.DISK_ONLY
    val e = graft.ops.Checkpoints.tracked(edges, ser)
    // ENTRY GATE (see localMaxEdges): LPA's votes are integer counts and
    // the winner pick is a deterministic (max cnt, min label) argmax, so a
    // bounded integral graph runs its synchronous rounds on the driver
    // bit-identically — none of the O(rounds) checkpoint barriers.
    val gate = localMaxEdges(e)
    if (gate > 0 && integralCols(e, "u", "v") && e.count() <= gate) {
      val r = localLabelProp(e, rounds)
      graft.ops.Checkpoints.release(e)
      return r
    }
    val both = graft.ops.Checkpoints.tracked(
      e.select(col("u").as("src"), col("v").as("dst")).unionByName(
        e.select(col("v").as("src"), col("u").as("dst"))), ser)
    var labels = both.select(col("src").as("node")).distinct()
      .withColumn("label", col("node"))
      .trackedCheckpoint()
    var prevCkpt = labels
    var j = 0
    while (j < rounds) {
      j += 1
      val votes = both.join(labels, col("src") === col("node"))
        .groupBy(col("dst"), col("label")).agg(count(lit(1)).as("cnt"))
      // winner per node = argmax by (cnt, smallest label) — as a plain
      // min_by aggregate rather than a row_number window: (dst, label) is
      // unique after the vote aggregation, so minimizing the
      // (-cnt, label) struct picks EXACTLY the window's
      // `ORDER BY cnt DESC, label ASC` row-1, while the aggregate gets
      // map-side partials before the per-node exchange and skips the
      // window's sort entirely (guide: aggregate before you shuffle).
      // The negation sits on cnt (>= 1 by construction, so it can never
      // overflow), not on the unbounded label domain — the round-20
      // max_by(label, struct(cnt, -label)) variant was only safe for
      // non-negative labels (round-20 advice).
      val next = votes
        .groupBy(col("dst"))
        .agg(min_by(col("label"), struct(-col("cnt"), col("label"))).as("label"))
        .select(col("dst").as("node"), col("label"))
        .trackedCheckpoint()
      graft.ops.Checkpoints.release(prevCkpt)
      prevCkpt = next
      labels = next
    }
    labels
  }

  /** Driver-local synchronous label propagation over a BOUNDED integral
    * undirected edge list — the same fixed `rounds` as the distributed
    * loop, votes counted over BOTH edge directions exactly as the
    * both-frame join does (duplicate edges vote per occurrence), winner =
    * (max count, min label). All integer, so bit-identical by
    * construction.
    */
  private def localLabelProp(e: DataFrame, rounds: Int): DataFrame = {
    val dt = e.schema("u").dataType
    val pairs = collectEdges(e, "u", "v")
    val adj = new scala.collection.mutable.HashMap[Long,
      scala.collection.mutable.ArrayBuffer[Long]]
    def nbrs(n: Long) = adj.getOrElseUpdate(n,
      scala.collection.mutable.ArrayBuffer.empty[Long])
    pairs.foreach { case (u, v) => nbrs(u) += v; nbrs(v) += u }
    var labels: scala.collection.mutable.HashMap[Long, Long] = {
      val m = new scala.collection.mutable.HashMap[Long, Long]
      adj.keysIterator.foreach(n => m(n) = n)
      m
    }
    var j = 0
    while (j < rounds) {
      j += 1
      val next = new scala.collection.mutable.HashMap[Long, Long]
      adj.foreach { case (n, neigh) =>
        val cnt = new scala.collection.mutable.HashMap[Long, Long]
        neigh.foreach { m =>
          val l = labels(m); cnt(l) = cnt.getOrElse(l, 0L) + 1
        }
        var bestL = Long.MaxValue
        var bestC = 0L
        cnt.foreach { case (l, c) =>
          if (c > bestC || (c == bestC && l < bestL)) { bestC = c; bestL = l }
        }
        next(n) = bestL
      }
      labels = next
    }
    localResult(e.sparkSession, labels.toSeq, "node", dt, "label", dt)
  }

  // kc1's contract constants — shared by the Spark face and the oracle
  // generator so the two can never run different geometry
  private val kcK = 6
  private val kcIters = 6

  // lp1's round count — shared with the oracle generator (see kcK)
  private val lpRounds = 4

  /** The part co-occurrence graph tc1/kc1 analyze: parts sharing an order
    * are linked; the deterministic %10 order slice keeps the fixture graph
    * sparse the way a real co-purchase graph is, and the per-order pair
    * expansion is bounded by parts-per-order (TPC-H: ≤7), so the
    * projection is linear in lineitem.
    */
  private def partCoPairs(s: SparkSession, d: String): DataFrame = {
    val li = graft.Tables.lineitem(s, d)
    val op = li.filter(col("l_orderkey") % 10 === 0)
      .select(col("l_orderkey").as("k"), col("l_partkey").as("p")).distinct()
    op.as("a").join(op.as("b"),
        col("a.k") === col("b.k") && col("a.p") < col("b.p"))
      .select(col("a.p").as("u"), col("b.p").as("v")).distinct()
  }

  val queries: Map[String, Q] = Map(
    // PR1: PageRank over the bipartite order↔supplier graph (edges from
    // lineitem, both directions so no node dangles), `iters` power
    // iterations from rank 1.0, supplier ranks out. The graph analog of
    // "which suppliers sit at the center of the order flow". tol stays
    // None here so the unrolled-CTE oracle replays the exact iteration
    // count; GraphSpec pins the tol/deep-iteration faces.
    //
    // Node ids are LONG-encoded (even = order, odd = supplier) through
    // every iteration — the joins and aggregations hash 8-byte keys, not
    // strings — and only the final supplier rows format the 's<k>' label
    // the oracle emits.
    "pr1_pagerank" -> ((s, d) => {
      val li = graft.Tables.lineitem(s, d)
      val edges = li.select(
        (col("l_orderkey") * 2).as("src"),
        (col("l_suppkey") * 2 + 1).as("dst")).distinct()
      val both = edges.unionByName(
        edges.select(col("dst").as("src"), col("src").as("dst")))
      pageRank(both, iters, hasDanglingNodes = false)
        .filter(col("node") % 2 === 1)
        .select(
          concat(lit("s"), ((col("node") - 1) / 2).cast("bigint")).as("node"),
          col("pr"))
    }),

    // PPR1: PERSONALIZED PageRank over the same order↔supplier graph —
    // rank mass measures proximity to a SEED set instead of global
    // centrality (the recommendation/attribution face of graph rank:
    // "which suppliers sit near THESE suppliers in the order flow").
    // Seeds = suppliers with suppkey % 50 == 1; the restart distribution
    // p = 1/|seeds| on seeds, 0 elsewhere, rides each iteration as a
    // BROADCAST |seeds|-row frame — the personalization costs zero extra
    // shuffles over pr1's machinery. Same unrolled-CTE oracle scheme.
    "ppr1_personalized_pagerank" -> ((s, d) => {
      val li = graft.Tables.lineitem(s, d)
      val edges = li.select(
        (col("l_orderkey") * 2).as("src"),
        (col("l_suppkey") * 2 + 1).as("dst")).distinct()
      val both = edges.unionByName(
        edges.select(col("dst").as("src"), col("src").as("dst")))
      val seeds = li.select(col("l_suppkey")).distinct()
        .filter(col("l_suppkey") % 50 === 1)
        .select((col("l_suppkey") * 2 + 1).as("node"))
      // p pre-rounded to 6dp so the oracle's round(1.0/ns, 6) replays it
      val ns = seeds.agg(count(lit(1)).as("ns"))
      val restart = seeds.crossJoin(broadcast(ns))
        .select(col("node"), round(lit(1.0) / col("ns"), 6).as("p"))
      pageRank(both, iters, hasDanglingNodes = false, restart = Some(restart))
        .filter(col("node") % 2 === 1)
        .select(
          concat(lit("s"), ((col("node") - 1) / 2).cast("bigint")).as("node"),
          col("pr"))
    }),

    // BFS1: supply-chain impact radius — which suppliers sit within 4 hops
    // of supplier 1 in the order↔supplier graph (shared orders = distance
    // 2, and so on). Frontier iteration with min-distance semantics; the
    // DuckDB replay is a recursive CTE with the same depth cap.
    "bfs1_supply_radius" -> ((s, d) => {
      val li = graft.Tables.lineitem(s, d)
      val edges = li.select(
        (col("l_orderkey") * 2).as("src"),
        (col("l_suppkey") * 2 + 1).as("dst")).distinct()
      val both = edges.unionByName(
        edges.select(col("dst").as("src"), col("src").as("dst")))
      bfs(both, col("node") === 3L, maxDepth = 4)
        .filter(col("node") % 2 === 1)
        .select(
          concat(lit("s"), ((col("node") - 1) / 2).cast("bigint")).as("node"),
          col("dist"))
    }),

    // TC1: triangle census of the part co-occurrence graph — parts
    // appearing together in an order are linked; triangles and the global
    // clustering coefficient measure how clumped the catalog's co-purchase
    // structure is (the motif-counting face of graph analytics, next to
    // pr1's ranking and bfs1's reachability). The per-order pair expansion
    // is bounded by parts-per-order (TPC-H: ≤7), so the projection is
    // linear in lineitem; the deterministic %10 order slice keeps the
    // fixture graph sparse (avg degree ~12) the way a real co-purchase
    // graph is. Degree orientation does the heavy lifting — see
    // [[triangleStats]].
    "tc1_triangle_count" -> ((s, d) => triangleStats(partCoPairs(s, d))),

    // KC1: the 6-core of the same graph — "which parts sit in densely
    // co-purchased neighborhoods after the long tail peels away". Output
    // is each surviving node with its WITHIN-CORE degree (≥ k by
    // definition — the natural audit the spec asserts). Six rounds
    // converge with one spare at both fixture scales (measured: fixpoint
    // at round 5); see [[kCore]] for why the early exit and the oracle's
    // fixed unroll agree.
    "kc1_kcore" -> ((s, d) => kCore(partCoPairs(s, d), kcK, kcIters)),

    // LP1: label-propagation communities over the same part co-occurrence
    // graph — "which parts cluster into co-purchased families" (the
    // community face of graph analytics, next to tc1's motifs and kc1's
    // density). Four synchronous rounds, most-frequent-neighbor-label with
    // min-label tiebreak; the oracle replays the identical unrolled rounds.
    "lp1_label_propagation" -> ((s, d) =>
      labelPropagation(partCoPairs(s, d), lpRounds))
  )

  /** PR1 oracle: the same power iterations unrolled as CTEs r1..r`iters`,
    * generated by the same loop count and constants as the Spark side.
    */
  val oracles: Map[String, String] = Map(
    "pr1_pagerank" -> {
      val head =
        """WITH edges AS (
             SELECT DISTINCT 'o' || l_orderkey AS src, 's' || l_suppkey AS dst
             FROM lineitem),
           both_e AS (SELECT src, dst FROM edges UNION ALL SELECT dst, src FROM edges),
           deg AS (SELECT src, count(*) AS outdeg FROM both_e GROUP BY src),
           r0 AS (SELECT src AS node, 1.0 AS pr FROM deg)"""
      val iterations = (1 to iters).map { j =>
        s""",
           r$j AS (
             SELECT n.node,
               round(${1 - damping} + $damping * coalesce(s.in_sum, 0), 6) AS pr
             FROM (SELECT node FROM r0) n LEFT JOIN (
               SELECT e.dst AS node, sum(r.pr / d.outdeg) AS in_sum
               FROM both_e e JOIN r${j - 1} r ON e.src = r.node
               JOIN deg d ON e.src = d.src
               GROUP BY e.dst) s USING (node))"""
      }.mkString
      head + iterations +
        s"""
           SELECT node, pr FROM r$iters WHERE node LIKE 's%'"""
    },
    // ppr1: pr1's unrolled iterations with the personalized teleport —
    // restart p joined per round, (1−d)·coalesce(p,0) replacing the
    // uniform term, and r0 = the restart distribution itself
    "ppr1_personalized_pagerank" -> {
      val head =
        """WITH edges AS (
             SELECT DISTINCT 'o' || l_orderkey AS src, 's' || l_suppkey AS dst
             FROM lineitem),
           both_e AS (SELECT src, dst FROM edges UNION ALL SELECT dst, src FROM edges),
           deg AS (SELECT src, count(*) AS outdeg FROM both_e GROUP BY src),
           seeds AS (
             SELECT DISTINCT 's' || l_suppkey AS node FROM lineitem
             WHERE l_suppkey % 50 = 1),
           ns AS (SELECT count(*) AS ns FROM seeds),
           restart AS (SELECT node, round(1.0 / ns, 6) AS p FROM seeds, ns),
           r0 AS (
             SELECT d.src AS node, coalesce(rs.p, 0) AS pr
             FROM deg d LEFT JOIN restart rs ON d.src = rs.node)"""
      val iterations = (1 to iters).map { j =>
        s""",
           r$j AS (
             SELECT n.node,
               round(${1 - damping} * coalesce(rs.p, 0)
                     + $damping * coalesce(s.in_sum, 0), 6) AS pr
             FROM (SELECT node FROM r0) n
             LEFT JOIN restart rs ON n.node = rs.node
             LEFT JOIN (
               SELECT e.dst AS node, sum(r.pr / d.outdeg) AS in_sum
               FROM both_e e JOIN r${j - 1} r ON e.src = r.node
               JOIN deg d ON e.src = d.src
               GROUP BY e.dst) s ON n.node = s.node)"""
      }.mkString
      head + iterations +
        s"""
           SELECT node, pr FROM r$iters WHERE node LIKE 's%'"""
    },
    // min-distance BFS as a depth-capped recursive CTE; UNION (not ALL)
    // keeps the walk bounded by (node, dist) pairs, and the outer min
    // collapses them to true shortest distances
    "bfs1_supply_radius" ->
      """WITH RECURSIVE e AS (
           SELECT DISTINCT l_orderkey * 2 AS src, l_suppkey * 2 + 1 AS dst
           FROM lineitem),
         both_e AS (SELECT src, dst FROM e UNION ALL SELECT dst, src FROM e),
         walk(node, dist) AS (
           SELECT 3::BIGINT, 0
           UNION
           SELECT b.dst, w.dist + 1 FROM walk w JOIN both_e b ON b.src = w.node
           WHERE w.dist < 4)
         SELECT 's' || ((node - 1) // 2) AS node, min(dist)::BIGINT AS dist
         FROM walk WHERE node % 2 = 1
         GROUP BY 1""",
    // tc1: the census from first principles — triangles by the canonical
    // u<v<w 3-way self-join (no orientation; the oracle verifies the
    // COUNT, the Spark side's degree orientation is a cost measure that
    // must not change it), wedges as sum C(deg,2) over the degree table
    "tc1_triangle_count" ->
      """WITH op AS (
           SELECT DISTINCT l_orderkey AS k, l_partkey AS p
           FROM lineitem WHERE l_orderkey % 10 = 0),
         pairs AS (
           SELECT DISTINCT a.p AS u, b.p AS v
           FROM op a JOIN op b ON a.k = b.k AND a.p < b.p),
         deg AS (
           SELECT node, count(*) AS d
           FROM (SELECT u AS node FROM pairs UNION ALL SELECT v FROM pairs)
           GROUP BY node),
         tri AS (
           SELECT count(*)::BIGINT AS n_triangles
           FROM pairs p1
           JOIN pairs p2 ON p2.u = p1.v
           JOIN pairs p3 ON p3.u = p1.u AND p3.v = p2.v)
         SELECT n_nodes, n_edges, n_wedges, n_triangles,
           CASE WHEN n_wedges > 0
                THEN round(3.0::DOUBLE * n_triangles / n_wedges, 6)
           END AS global_cc
         FROM (
           SELECT
             (SELECT count(*)::BIGINT FROM deg) AS n_nodes,
             (SELECT (sum(d) // 2)::BIGINT FROM deg) AS n_edges,
             (SELECT sum(d * (d - 1) // 2)::BIGINT FROM deg) AS n_wedges,
             n_triangles
           FROM tri)""",
    // kc1: the same peeling unrolled to exactly kcIters rounds (generated
    // from the same constants as the Spark face); a post-fixpoint round
    // keeps the edge set unchanged, so the fixed unroll and the early-exit
    // loop agree by construction
    "kc1_kcore" -> {
      // AS MATERIALIZED: each e_j is referenced 4x by round j+1 (two
      // degree legs + two IN probes); DuckDB's default CTE inlining would
      // expand that 4^rounds-fold and run out of file handles on the leaf
      // scans (observed). Materialization makes the replay linear like
      // the Spark loop it mirrors.
      val head =
        """WITH op AS MATERIALIZED (
             SELECT DISTINCT l_orderkey AS k, l_partkey AS p
             FROM lineitem WHERE l_orderkey % 10 = 0),
           e0 AS MATERIALIZED (
             SELECT DISTINCT a.p AS u, b.p AS v
             FROM op a JOIN op b ON a.k = b.k AND a.p < b.p)"""
      val rounds = (1 to kcIters).map { j =>
        s""",
           n$j AS MATERIALIZED (
             SELECT node FROM (
               SELECT u AS node FROM e${j - 1}
               UNION ALL SELECT v FROM e${j - 1})
             GROUP BY node HAVING count(*) >= $kcK),
           e$j AS MATERIALIZED (
             SELECT u, v FROM e${j - 1}
             WHERE u IN (SELECT node FROM n$j)
               AND v IN (SELECT node FROM n$j))"""
      }.mkString
      head + rounds +
        s"""
           SELECT node, count(*)::BIGINT AS deg
           FROM (SELECT u AS node FROM e$kcIters UNION ALL SELECT v FROM e$kcIters)
           GROUP BY node"""
    },
    // lp1: the same synchronous rounds unrolled (generated from the same
    // lpRounds constant as the Spark face); MATERIALIZED for the kc1
    // reason — each l_j feeds round j+1's join twice via the window subquery
    "lp1_label_propagation" -> {
      val head =
        """WITH op AS MATERIALIZED (
             SELECT DISTINCT l_orderkey AS k, l_partkey AS p
             FROM lineitem WHERE l_orderkey % 10 = 0),
           e0 AS MATERIALIZED (
             SELECT DISTINCT a.p AS u, b.p AS v
             FROM op a JOIN op b ON a.k = b.k AND a.p < b.p),
           be AS MATERIALIZED (
             SELECT u AS src, v AS dst FROM e0
             UNION ALL SELECT v, u FROM e0),
           l0 AS MATERIALIZED (
             SELECT DISTINCT src AS node, src AS label FROM be)"""
      val rounds = (1 to lpRounds).map { j =>
        s""",
           v$j AS MATERIALIZED (
             SELECT b.dst AS node, l.label, count(*) AS cnt
             FROM be b JOIN l${j - 1} l ON b.src = l.node
             GROUP BY 1, 2),
           l$j AS MATERIALIZED (
             SELECT node, label FROM (
               SELECT node, label,
                 row_number() OVER (PARTITION BY node
                                    ORDER BY cnt DESC, label) AS r
               FROM v$j) WHERE r = 1)"""
      }.mkString
      head + rounds +
        s"""
           SELECT node, label FROM l$lpRounds"""
    }
  )
}
