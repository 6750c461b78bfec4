package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.dedup.Dedup
import graft.functions.Aggregators
import graft.multimodal.Multimodal
import graft.similarity.VectorOps

/** Dedup, similarity-search, and multimodal operator units. */
class NorthStarSpec extends SparkSpec {

  private def docs(rows: (Long, String)*) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(r => Row(r._1, r._2)), 2),
      StructType.fromDDL("doc_id BIGINT, text STRING"))

  test("shingles: 3-gram windows in order") {
    val out = docs((1L, "a b c d")).select(
      Dedup.shingles(split(col("text"), " ")).as("sh")).collect().head
    assert(out.getAs[Seq[String]]("sh") === Seq("a b c", "b c d"))
  }

  test("minhash: identical docs share signatures, jaccard detects near-dups") {
    val d = docs(
      (1L, "the quick brown fox jumps over the lazy dog today"),
      (2L, "the quick brown fox jumps over the lazy dog today"), // exact dup
      (3L, "the quick brown fox jumps over the lazy cat today"), // near dup
      (4L, "completely different text with no shared shingles at all ok"))
      .select(col("doc_id"), Dedup.shingles(split(col("text"), " ")).as("sh"))
    val sigs = Dedup.withMinhashSig(d, "sh", "sig").select("doc_id", "sig")
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toList).toMap
    assert(sigs(1L) === sigs(2L))
    // near-dup (J = 5/11 ≈ 0.45): expected matching minima ≈ 8 x J ≈ 3.6;
    // assert a loose lower bound, and strictly more than the unrelated doc.
    val nearShared = sigs(1L).zip(sigs(3L)).count { case (a, b) => a == b }
    assert(nearShared >= 2, s"nearShared=$nearShared")
    assert(sigs(1L).zip(sigs(4L)).count { case (a, b) => a == b } === 0)

    val a = d.filter(col("doc_id") === 1).select(col("sh").as("sha"))
    val b = d.filter(col("doc_id") === 3).select(col("sh").as("shb"))
    val j = a.crossJoin(b).select(Dedup.jaccard(col("sha"), col("shb")))
      .collect().head.getDouble(0)
    assert(j > 0.5 && j < 1.0)
  }

  test("lsh candidate pairs find the dup without a cross join") {
    val d = docs(
      (1L, "the quick brown fox jumps over the lazy dog today"),
      (2L, "the quick brown fox jumps over the lazy dog today"),
      (4L, "completely different text with no shared shingles at all ok"))
      .select(col("doc_id"), Dedup.shingles(split(col("text"), " ")).as("sh"))
    val sigs = Dedup.withMinhashSig(d, "sh", "sig").select("doc_id", "sig")
    val pairs = Dedup.candidatePairs(
      Dedup.lshBandKeys(sigs, "doc_id", "sig"), "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === Set((1L, 2L)))
  }

  test("simhash: native expression matches the declarative spec") {
    graft.functions.SimHash.register(spark)
    val d = docs(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "some other words appear here repeatedly repeatedly"),
      (3L, "x"))
      .select(col("doc_id"), split(col("text"), " ").as("w"))
    val both = d.select(col("doc_id"),
      Dedup.simhash(col("w")).as("spec"),
      graft.functions.SimHash.simhash(col("w")).as("native")).collect()
    both.foreach(r => assert(r.getLong(1) === r.getLong(2), s"doc ${r.getLong(0)}"))
  }

  test("simhash: equal for dups, near for near-dups, hamming works") {
    val d = docs(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"),
      (3L, "the quick brown fox jumps over the lazy cat"),
      (4L, "unrelated words entirely here nothing shared at all"))
      .select(col("doc_id"), Dedup.simhash(split(col("text"), " ")).as("sh"))
    val m = d.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(m(1L) === m(2L))
    assert(ham(m(1L), m(3L)) < ham(m(1L), m(4L)))
  }

  test("knn brute force: exact neighbors on constructed vectors") {
    val rows = Seq(
      (0L, Array(1f, 0f, 0f)), (1L, Array(0.9f, 0.1f, 0f)),
      (2L, Array(0f, 1f, 0f)), (3L, Array(-1f, 0f, 0f)))
    import spark.implicits._
    val c = rows.toDF("n_id", "embedding")
      .select(col("n_id"), VectorOps.toDouble(col("embedding")).as("nv"))
    val q = c.filter(col("n_id") === 0).select(col("n_id").as("q_id"), col("nv").as("qv"))
    val out = VectorOps.bruteForceTopK(c, q, 3).collect()
      .map(r => (r.getLong(1), r.getLong(2))).toList // (rank, n_id)
    assert(out === List((1L, 1L), (2L, 2L), (3L, 3L)))
  }

  test("lsh ann: high recall on clustered vectors") {
    // 10 clusters x 20 members; members of a cluster are tiny perturbations
    // of the centroid, so true neighbors share the cluster and LSH buckets.
    val rnd = new scala.util.Random(7)
    val dim = 16
    val centroids = Array.fill(10)(Array.fill(dim)(rnd.nextGaussian()))
    val vecs = for (c <- 0 until 10; m <- 0 until 20) yield {
      val v = centroids(c).map(x => (x + rnd.nextGaussian() * 0.01).toFloat)
      ((c * 20 + m).toLong, v)
    }
    import spark.implicits._
    val df = vecs.toDF("n_id", "embedding")
      .select(col("n_id"), VectorOps.toDouble(col("embedding")).as("nv"))
    val planes = VectorOps.randomPlanes(4, dim, seed = 11)
    val q = df.select(col("n_id").as("q_id"), col("nv").as("qv"))
    val bf = VectorOps.bruteForceTopK(df, q, 5).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val lsh = VectorOps.lshTopK(df, df, planes, 5).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (bf intersect lsh).size.toDouble / bf.size
    assert(recall > 0.9, s"recall=$recall")
  }

  test("ivf ann: high recall on clustered vectors, probes beat single cell") {
    val rnd = new scala.util.Random(13)
    val dim = 16
    val centroids = Array.fill(8)(Array.fill(dim)(rnd.nextGaussian()))
    val vecs = for (c <- 0 until 8; m <- 0 until 25) yield {
      val v = centroids(c).map(x => (x + rnd.nextGaussian() * 0.01).toFloat)
      ((c * 25 + m).toLong, v)
    }
    import spark.implicits._
    val df = vecs.toDF("n_id", "embedding")
      .select(col("n_id"), VectorOps.toDouble(col("embedding")).as("nv"))
    val q = df.select(col("n_id").as("q_id"), col("nv").as("qv"))
    val bf = VectorOps.bruteForceTopK(df, q, 5).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val ivf = VectorOps.ivfTopK(df, df, nCells = 16, nProbe = 2, k = 5).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (bf intersect ivf).size.toDouble / bf.size
    assert(recall > 0.9, s"recall=$recall")
    // the Lloyd-refined quantizer must not lose recall vs the raw seed
    val refined = VectorOps.ivfTopKRefined(df, df, nCells = 16, nProbe = 2, k = 5).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val refinedRecall = (bf intersect refined).size.toDouble / bf.size
    assert(refinedRecall >= recall - 1e-9, s"refined=$refinedRecall vs seed=$recall")
    assert(refinedRecall > 0.9, s"refinedRecall=$refinedRecall")
    // and the training loop composes: a second Lloyd pass holds recall
    val refined2 = VectorOps.ivfTopKRefined(df, df, nCells = 16, nProbe = 2, k = 5, iters = 2)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall2 = (bf intersect refined2).size.toDouble / bf.size
    assert(recall2 >= refinedRecall - 1e-9, s"iters=2 recall=$recall2 vs iters=1=$refinedRecall")
  }

  test("filtered ivf ann: every hit satisfies the predicate, none are dropped to post-filtering") {
    // ids INTERLEAVE the clusters (id % 8 — the PQ-test trick) so the
    // first-8 centroid seeds span one vector per cluster and every cell
    // holds a full 25-member cluster, ~13 of them even-id
    val rnd = new scala.util.Random(13)
    val dim = 16
    val centroids = Array.fill(8)(Array.fill(dim)(rnd.nextGaussian()))
    val vecs = (0 until 200).map { i =>
      val v = centroids(i % 8).map(x => (x + rnd.nextGaussian() * 0.01).toFloat)
      (i.toLong, v)
    }
    import spark.implicits._
    // tag alternates WITHIN each cluster ((id/8) % 2 — id % 2 would equal
    // cluster parity and empty the odd clusters wholesale), so every cell
    // keeps ~13 in-predicate members
    val df = vecs.toDF("n_id", "embedding")
      .select(col("n_id"), VectorOps.toDouble(col("embedding")).as("nv"))
      .withColumn("tag", (col("n_id") / lit(8)).cast("long") % 2)
    def tagOf(id: Long): Long = (id / 8) % 2
    val q = df.filter(col("n_id") < 10).select(col("n_id"), col("nv"))
    val filtered = VectorOps.ivfTopK(df, q, nCells = 8, nProbe = 2, k = 5,
      corpusFilter = Some(col("tag") === 0)).collect()
    assert(filtered.nonEmpty)
    // predicate holds on every returned neighbor
    assert(filtered.forall(r => tagOf(r.getLong(2)) == 0),
      "a neighbor violated the corpus predicate")
    // PRE-filtering keeps k filled from in-predicate rows: each query's own
    // cell alone has ~13 tag-0 members, so all 5 slots fill for every
    // query — a post-filtered top-5 (half its slots spent on tag-1 rows,
    // then dropped) could not
    val perQuery = filtered.groupBy(_.getLong(0)).map(_._2.length)
    assert(perQuery.size == 10 && perQuery.forall(_ == 5),
      s"under-filled k: ${perQuery.toSeq}")
    // unfiltered search on the same geometry returns tag-1 rows too — the
    // predicate is doing the restricting, not the fixture
    val unfiltered = VectorOps.ivfTopK(df, q, nCells = 8, nProbe = 2, k = 5)
      .collect()
    assert(unfiltered.exists(r => tagOf(r.getLong(2)) == 1))
  }

  test("tombstoned ivf ann: deleted ids never surface, survivors re-fill the k slots") {
    // the filtered-ANN fixture (interleaved clusters, seeds span them)
    val rnd = new scala.util.Random(13)
    val dim = 16
    val centroids = Array.fill(8)(Array.fill(dim)(rnd.nextGaussian()))
    val vecs = (0 until 200).map { i =>
      val v = centroids(i % 8).map(x => (x + rnd.nextGaussian() * 0.01).toFloat)
      (i.toLong, v)
    }
    import spark.implicits._
    val df = vecs.toDF("n_id", "embedding")
      .select(col("n_id"), VectorOps.toDouble(col("embedding")).as("nv"))
    val q = df.filter(col("n_id") < 10).select(col("n_id"), col("nv"))
    val before = VectorOps.ivfTopK(df, q, nCells = 8, nProbe = 2, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    // kill every id the untombstoned search returned for query 0: the
    // hardest case — all five of that query's former answers are gone
    val deadIds = before.filter(_._1 == 0L).map(_._2).toSet
    val dead = deadIds.toSeq.toDF("n_id")
    val after = VectorOps.ivfTopK(df, q, nCells = 8, nProbe = 2, k = 5,
      tombstones = Some(dead)).collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(after.forall(p => !deadIds.contains(p._2)),
      "a tombstoned id surfaced")
    // k re-fills from survivors: each cell still holds ~20 live members
    val perQuery = after.groupBy(_._1).map(_._2.length)
    assert(perQuery.size == 10 && perQuery.forall(_ == 5),
      s"under-filled k after deletes: ${perQuery.toSeq}")
    // and queries whose answers were untouched return them unchanged
    val touched = before.filter(p => deadIds.contains(p._2)).map(_._1).toSet
    val beforeByQ = before.groupBy(_._1); val afterByQ = after.groupBy(_._1)
    (0L until 10L).filterNot(touched).foreach { qid =>
      assert(beforeByQ(qid).toSet == afterByQ(qid).toSet, s"query $qid drifted")
    }
  }

  test("mmr rerank: redundancy is traded away, zero diversity weight degenerates to top-k") {
    import spark.implicits._
    // 2D fixture: c1 (5 deg off the query) and c2 (7 deg) are near-dups of
    // each other; c3 (-40 deg) is less relevant but fresh
    def v(deg: Double) = {
      val r = math.toRadians(deg)
      Array(math.cos(r), math.sin(r))
    }
    val corpus = Seq((1L, v(5)), (2L, v(7)), (3L, v(-40)))
      .toDF("n_id", "nv")
    val q = Seq((100L, v(0))).toDF("q_id", "qv")
    // equal weights: c2's ~1.0 similarity to the already-picked c1
    // outweighs its relevance edge over c3 — the diversified pick
    val picks = VectorOps.mmrRerank(corpus, q, shortlist = 3, k = 2,
      selW = 0.5, divW = 0.5).orderBy("step").collect()
      .map(r => (r.getLong(1), r.getLong(2)))
    assert(picks.toSeq == Seq((1L, 1L), (2L, 3L)),
      s"expected c1 then the diverse c3, got ${picks.toSeq}")
    // divW = 0 is exactly relevance order: c1, c2, c3
    val plain = VectorOps.mmrRerank(corpus, q, shortlist = 3, k = 3,
      selW = 1.0, divW = 0.0).orderBy("step").collect().map(_.getLong(2))
    assert(plain.toSeq == Seq(1L, 2L, 3L))
  }

  test("mmr rerank composes with an ivf shortlist (the serving-scale shape)") {
    val rnd = new scala.util.Random(13)
    val dim = 16
    val centroids = Array.fill(8)(Array.fill(dim)(rnd.nextGaussian()))
    val vecs = (0 until 200).map { i =>
      val v = centroids(i % 8).map(x => (x + rnd.nextGaussian() * 0.01).toFloat)
      (i.toLong, v)
    }
    import spark.implicits._
    val df = vecs.toDF("n_id", "embedding")
      .select(col("n_id"), VectorOps.toDouble(col("embedding")).as("nv"))
    val q = df.filter(col("n_id") < 6)
      .select(col("n_id").as("q_id"), col("nv").as("qv"))
    // shortlist through the index instead of the brute-force corpus scan
    // (the generator contract is (q_id, rank, n_id, cos); ivfTopK takes
    // (n_id, nv)-shaped queries, so the lambda adapts the column names)
    val viaIvf: (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame, Int) => org.apache.spark.sql.DataFrame =
      (c, qs, n) => VectorOps.ivfTopK(c,
        qs.select(col("q_id").as("n_id"), col("qv").as("nv")),
        nCells = 8, nProbe = 2, k = n)
    val picks = VectorOps.mmrRerank(df, q, shortlist = 10, k = 3,
      selW = 0.5, divW = 0.5, shortlistOf = viaIvf).collect()
    // k fills per query, no duplicate selections
    val byQ = picks.groupBy(_.getLong(0))
    assert(byQ.size == 6 && byQ.values.forall(_.length == 3))
    byQ.values.foreach(rows =>
      assert(rows.map(_.getLong(2)).distinct.length == 3, "duplicate pick"))
    // divW = 0 over the same shortlist is exactly the ivf top-k order
    val plain = VectorOps.mmrRerank(df, q, shortlist = 3, k = 3,
      selW = 1.0, divW = 0.0, shortlistOf = viaIvf)
      .orderBy("q_id", "step").collect().map(r => (r.getLong(0), r.getLong(2)))
    val want = viaIvf(df, q, 3)
      .orderBy("q_id", "rank").collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(plain.toSeq == want.toSeq)
  }

  test("ivf-pq ann: cluster-faithful retrieval under 16x code compression") {
    // PQ erases WITHIN-cluster distinctions by construction (same-cluster
    // members quantize to the same codes), so the meaningful quality bar is
    // cluster-level: every retrieved neighbor should come from the query's
    // own cluster. Ids interleave the clusters (id % 10) so the first-16
    // codebook/centroid seeds SPAN clusters instead of sampling one.
    val rnd = new scala.util.Random(41)
    val dim = 64
    val centroids = Array.fill(10)(Array.fill(dim)(rnd.nextGaussian()))
    val vecs = for (m <- 0 until 20; c <- 0 until 10) yield {
      val v = centroids(c).map(x => (x + rnd.nextGaussian() * 0.01).toFloat)
      ((m * 10 + c).toLong, v)
    }
    import spark.implicits._
    val df = vecs.toDF("n_id", "embedding")
      .select(col("n_id"), VectorOps.toDouble(col("embedding")).as("nv"))
    val got = VectorOps.ivfpqTopK(df, df, nCells = 16, nProbe = 4,
        m = 4, dsub = 16, ksub = 16, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    val queries = got.map(_._1).distinct
    assert(queries.length == 200, s"every vector should be answered, got ${queries.length}")
    val inCluster = got.count { case (q, n) => q % 10 == n % 10 }
    val share = inCluster.toDouble / got.length
    assert(share > 0.95, s"same-cluster share=$share")
  }

  test("ivf-pq residual encoding (ivfadc): recall holds or improves vs no-residual pq") {
    // Same clustered fixture as the cluster-faithful test: residual
    // codebooks only have to cover the WITHIN-cell spread, so quantization
    // error can only shrink — same-cluster share must be >= the raw-vector
    // PQ's, and still above the 0.95 bar.
    val rnd = new scala.util.Random(41)
    val dim = 64
    val centroids = Array.fill(10)(Array.fill(dim)(rnd.nextGaussian()))
    val vecs = for (m <- 0 until 20; c <- 0 until 10) yield {
      val v = centroids(c).map(x => (x + rnd.nextGaussian() * 0.01).toFloat)
      ((m * 10 + c).toLong, v)
    }
    import spark.implicits._
    val df = vecs.toDF("n_id", "embedding")
      .select(col("n_id"), VectorOps.toDouble(col("embedding")).as("nv"))
    def share(got: Array[(Long, Long)]): Double =
      got.count { case (q, n) => q % 10 == n % 10 }.toDouble / got.length
    val plain = share(VectorOps.ivfpqTopK(df, df, nCells = 16, nProbe = 4,
      m = 4, dsub = 16, ksub = 16, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(2))))
    val resid = share(VectorOps.ivfpqSearch(df,
      VectorOps.ivfpqTrain(df, nCells = 16, m = 4, dsub = 16, ksub = 16,
        residual = true),
      nProbe = 4, m = 4, dsub = 16, k = 5, residual = true)
      .collect().map(r => (r.getLong(0), r.getLong(2))))
    assert(resid >= plain - 1e-9, s"residual share=$resid < plain share=$plain")
    assert(resid > 0.95, s"residual same-cluster share=$resid")
  }

  test("foldAssign equals the window argmax on randomized vectors, ties included") {
    // The round-17 assignment rewrite (broadcast 1-row array fold instead
    // of crossJoin+window) must preserve the exact argmax contract —
    // csim DESC, cell ASC on equal cosine. Randomized seeded vectors plus
    // DELIBERATE ties: two centroids are the same direction (scaled
    // copies), so every row's cosine against them is equal and only the
    // smallest-cell tie-break separates the implementations.
    val rnd = new scala.util.Random(17)
    val dim = 16
    val vecs = (0 until 200).map { i =>
      (i.toLong, Array.fill(dim)(rnd.nextGaussian()))
    }
    import spark.implicits._
    graft.functions.DotProduct.register(spark)
    val df = vecs.toDF("n_id", "nv")
      .select(col("n_id"), col("nv").cast("array<double>").as("nv"))
      .withColumn("nn", VectorOps.l2norm(col("nv")))
    // centroids: first 11 vectors, plus cell 900 = 2x cell 0's vector
    // (same direction — a guaranteed cosine tie with cell 0 everywhere)
    val cents = df.filter(col("n_id") < 11)
      .select(col("n_id").as("cell"), col("nv").as("cv"), col("nn").as("cn"))
      .unionByName(df.filter(col("n_id") === 0)
        .select(lit(900L).as("cell"),
          transform(col("nv"), x => x * 2).as("cv"),
          (col("nn") * 2).as("cn")))
      .localCheckpoint()
    val got = VectorOps.foldAssign(df, cents, "nv", "nn")
      .select("n_id", "cell", "csim").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    // reference: the historical crossJoin + window argmax, same expression
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("n_id").orderBy(col("csim").desc, col("cell").asc)
    val want = df.crossJoin(broadcast(cents))
      .withColumn("csim",
        graft.functions.DotProduct.dot_product(col("nv"), col("cv")) /
          (col("nn") * col("cn")))
      .withColumn("r", row_number().over(w)).filter(col("r") === 1)
      .select("n_id", "cell", "csim").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got.keySet == want.keySet)
    got.foreach { case (id, (cell, csim)) =>
      assert((cell, csim) == want(id), s"row $id: fold=$cell/$csim window=${want(id)}")
    }
    // the tie really exercised the tie-break: row 0's winner is cell 0
    // (cos 1.0 against both 0 and 900 — smallest cell wins)
    assert(got(0L)._1 == 0L)
  }

  test("pq retrain on drift: only drifted cells re-encode, their error drops, recall holds") {
    // Drift scenario: the model trains on clusters 0..7 only; cluster 9's
    // vectors then ARRIVE and encode against that stale model (v9c's
    // append posture). Their cells' reconstruction error trips the
    // trigger, the cell-local retrain gives them their own codewords, and
    // cluster-9 queries recover same-cluster retrieval the stale
    // codebook was fumbling — without touching the fitted cells' codes.
    val rnd = new scala.util.Random(41)
    val dim = 64
    val centroids = Array.fill(10)(Array.fill(dim)(rnd.nextGaussian()))
    val vecs = for (m <- 0 until 20; c <- 0 until 10) yield {
      val v = centroids(c).map(x => (x + rnd.nextGaussian() * 0.01).toFloat)
      ((m * 10 + c).toLong, v)
    }
    import spark.implicits._
    val df = vecs.toDF("n_id", "embedding")
      .select(col("n_id"), VectorOps.toDouble(col("embedding")).as("nv"))
    val standing = df.filter(col("n_id") % 10 =!= 9)
    val arrivals = df.filter(col("n_id") % 10 === 9)
    val m0 = VectorOps.ivfpqTrain(standing, nCells = 16, m = 4, dsub = 16, ksub = 16)
    val full = VectorOps.IvfPqModel(m0.centroids.localCheckpoint(),
      m0.codebook.localCheckpoint(),
      m0.index.unionByName(VectorOps.ivfpqEncode(arrivals, m0, 4, 16))
        .localCheckpoint())
    def share(got: Array[(Long, Long)]): Double =
      got.count { case (q, n) => q % 10 == n % 10 }.toDouble / got.length
    val q9 = arrivals
    val before = share(VectorOps.ivfpqSearch(q9, full, nProbe = 4,
      m = 4, dsub = 16, k = 5).collect().map(r => (r.getLong(0), r.getLong(2))))
    val ov = VectorOps.ivfpqRetrainDrifted(df, full, m = 4, dsub = 16,
      ksub = 16, factor = 1.25)
    val driftedCells = ov.drifted.collect().map(_.getLong(0)).toSet
    assert(driftedCells.nonEmpty, "the arrival cluster must trip the trigger")
    // scope: every re-encoded vector lives in a drifted cell, and no
    // untouched cell's codes appear in the overlay
    val reenc = ov.codes.select("cell").distinct().collect().map(_.getLong(0)).toSet
    assert(reenc.subsetOf(driftedCells), s"re-encode leaked outside drifted cells: $reenc vs $driftedCells")
    // error on drifted cells drops: the overlay reconstruction beats the
    // stale codebook on its own metric
    val errBefore = VectorOps.pqDriftAudit(df, full, 4, 16)
      .filter(col("cell").isin(driftedCells.toSeq: _*))
      .agg(avg("mean_err")).head.getDouble(0)
    val retrained = VectorOps.IvfPqModel(full.centroids,
      ov.codebook.select(col("b"), col("code").as("cell"), col("cv")),
      ov.codes.select(col("n_id"), col("cell"), col("b"), col("code")))
    // audit the drifted cells against their own overlay: join through the
    // overlay codebook keyed by (cell, b, code)
    val subsErr = {
      import org.apache.spark.sql.DataFrame
      val withN = df.withColumn("nn", VectorOps.l2norm(col("nv")))
      val u = withN.select(col("n_id"),
        transform(col("nv"), x => x / col("nn")).as("u"))
      val s2 = u.select(col("n_id"),
          explode(sequence(lit(0), lit(3))).as("b"), col("u"))
        .select(col("n_id"), col("b"), slice(col("u"), col("b") * 16 + 1, lit(16)).as("sv"))
      ov.codes.join(s2, Seq("n_id", "b"))
        .join(ov.codebook, Seq("cell", "b", "code"))
        .withColumn("err2", graft.functions.L2Sq.l2sq(col("sv"), col("cv")))
        .groupBy("n_id").agg(sum("err2").as("verr"))
        .agg(avg("verr")).head.getDouble(0)
    }
    assert(subsErr < errBefore,
      s"retrain must reduce drifted-cell reconstruction error: $subsErr vs $errBefore")
    // recall: cluster-9 queries through the mixed index hold or improve
    val after = share(VectorOps.ivfpqSearchOverlay(q9, full, ov, nProbe = 4,
      m = 4, dsub = 16, k = 5).collect().map(r => (r.getLong(0), r.getLong(2))))
    assert(after >= before - 1e-9, s"retrain lost recall: after=$after before=$before")
  }

  test("ivf-pq ann on the fixture: far above chance, below uncompressed ivf (the trade)") {
    // Random fixture embeddings are PQ's worst case (no cluster structure
    // for the codebooks to exploit) — the pinned floor documents the
    // recall/memory trade honestly: ~0.3 vs chance 5/499 ≈ 0.01, against
    // v4's ~0.85 at 16x the candidate-side memory.
    graft.functions.DotProduct.register(spark)
    val e = Tables.embeddings(spark, "/root/testdata/sf0.001").select(
      col("vec_id").as("n_id"), VectorOps.toDouble(col("embedding")).as("nv"))
    val q = e.filter(col("n_id") < 20).select(col("n_id").as("q_id"), col("nv").as("qv"))
    val bf = VectorOps.bruteForceTopK(e, q, 5).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val pq = VectorOps.ivfpqTopK(e, e, nCells = 16, nProbe = 4,
        m = 4, dsub = 16, ksub = 16, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
      .filter(_._1 < 20).toSet
    val recall = (bf intersect pq).size.toDouble / bf.size
    assert(recall > 0.2, s"recall=$recall")
  }

  test("ivf-pq rerank: exact-cosine reranking recovers recall the codes lose") {
    // The fixture floor test above pins plain ADC recall ~0.3 on random
    // embeddings (PQ's worst case). Reranking the 20-candidate ADC
    // shortlist with the exact cosine must recover a strict improvement —
    // the candidates are usually RIGHT, their compressed ordering is what's
    // wrong — at the cost of 20 exact dots per query, not a corpus scan.
    graft.functions.DotProduct.register(spark)
    val e = Tables.embeddings(spark, "/root/testdata/sf0.001").select(
      col("vec_id").as("n_id"), VectorOps.toDouble(col("embedding")).as("nv"))
    val q = e.filter(col("n_id") < 20).select(col("n_id").as("q_id"), col("nv").as("qv"))
    val bf = VectorOps.bruteForceTopK(e, q, 5).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val model = VectorOps.ivfpqTrain(e, nCells = 16, m = 4, dsub = 16, ksub = 16)
    def recallOf(got: Array[(Long, Long)]): Double =
      (bf intersect got.filter(_._1 < 20).toSet).size.toDouble / bf.size
    val adc = recallOf(VectorOps.ivfpqSearch(e.filter(col("n_id") < 20), model,
      nProbe = 4, m = 4, dsub = 16, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(2))))
    val rr = recallOf(VectorOps.ivfpqRerank(e, e.filter(col("n_id") < 20), model,
      nProbe = 4, m = 4, dsub = 16, shortlist = 20, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(2))))
    assert(rr > adc, s"rerank recall=$rr did not improve on adc recall=$adc")
    assert(rr > 0.5, s"rerank recall=$rr")
  }

  test("truncated-dim prefilter: cluster-faithful on clustered vectors, honest floor on random") {
    // v12's contract: on embeddings with cluster structure (what
    // Matryoshka-style training produces — prefixes carry the coarse
    // geometry), the 16-dim prefilter + exact rerank retrieves from the
    // query's own cluster; on RANDOM vectors the prefix carries only
    // tdim/dim of the signal and the documented floor applies (the v9
    // worst-case pattern).
    val rnd = new scala.util.Random(41)
    val dim = 64
    val centroids = Array.fill(10)(Array.fill(dim)(rnd.nextGaussian()))
    val vecs = for (m <- 0 until 20; c <- 0 until 10) yield {
      val v = centroids(c).map(x => (x + rnd.nextGaussian() * 0.01).toFloat)
      ((m * 10 + c).toLong, v)
    }
    import spark.implicits._
    val df = vecs.toDF("n_id", "embedding")
      .select(col("n_id"), VectorOps.toDouble(col("embedding")).as("nv"))
    val tdim = 16
    val ct = df.select(col("n_id"), slice(col("nv"), 1, tdim).as("tv"))
      .withColumn("tn", VectorOps.l2norm(col("tv")))
    val qt = ct.filter(col("n_id") < 20)
      .select(col("n_id").as("q_id"), col("tv").as("qv"), col("tn").as("qn"))
    val w1 = org.apache.spark.sql.expressions.Window
      .partitionBy("q_id").orderBy(col("tcos").desc, col("n_id").asc)
    val sl = ct.crossJoin(broadcast(qt))
      .filter(col("n_id") =!= col("q_id"))
      .withColumn("tcos", VectorOps.dot(col("qv"), col("tv")) / (col("qn") * col("tn")))
      .withColumn("r", row_number().over(w1))
      .filter(col("r") <= 20)
    val full = df.withColumn("nn", VectorOps.l2norm(col("nv")))
    val qf = full.filter(col("n_id") < 20)
      .select(col("n_id").as("q_id"), col("nv").as("fqv"), col("nn").as("fqn"))
    val w2 = org.apache.spark.sql.expressions.Window
      .partitionBy("q_id").orderBy(col("cos").desc, col("n_id").asc)
    val got = sl.select("q_id", "n_id").join(qf, "q_id").join(full, "n_id")
      .withColumn("cos", VectorOps.dot(col("fqv"), col("nv")) / (col("fqn") * col("nn")))
      .withColumn("rank", row_number().over(w2))
      .filter(col("rank") <= 5)
      .collect().map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("n_id")))
    val share = got.count { case (q, n) => q % 10 == n % 10 }.toDouble / got.length
    assert(share > 0.95, s"same-cluster share=$share")
  }

  test("opq-lite permutation: recall holds vs unpermuted rerank on clustered vectors, " +
      "and the permutation actually balances block energy") {
    // The round-8 verdict's v9e gate: the energy-balanced coordinate
    // permutation (closed-form OPQ) must not lose recall against the v9d
    // serving shape (same rerank stage — a permutation is orthogonal, so
    // exact scores are unchanged; only the compressed shortlist can move).
    val rnd = new scala.util.Random(41)
    val dim = 64
    val centroids = Array.fill(10)(Array.fill(dim)(rnd.nextGaussian()))
    val vecs = for (m <- 0 until 20; c <- 0 until 10) yield {
      val v = centroids(c).map(x => (x + rnd.nextGaussian() * 0.01).toFloat)
      ((m * 10 + c).toLong, v)
    }
    import spark.implicits._
    val df = vecs.toDF("n_id", "embedding")
      .select(col("n_id"), VectorOps.toDouble(col("embedding")).as("nv"))
    def share(got: Array[(Long, Long)]): Double =
      got.count { case (q, n) => q % 10 == n % 10 }.toDouble / got.length
    val plainModel = VectorOps.ivfpqTrain(df, nCells = 16, m = 4, dsub = 16, ksub = 16)
    val plain = share(VectorOps.ivfpqRerank(df, df, plainModel,
      nProbe = 4, m = 4, dsub = 16, shortlist = 20, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(2))))
    val perm = VectorOps.energyBalancedPerm(df, 4)
    assert(perm.sorted == (0 until dim), "perm must be a permutation of the dims")
    val opqModel = VectorOps.ivfpqTrain(df, nCells = 16, m = 4, dsub = 16,
      ksub = 16, perm = perm)
    val opq = share(VectorOps.ivfpqRerank(df, df, opqModel,
      nProbe = 4, m = 4, dsub = 16, shortlist = 20, k = 5, perm = perm)
      .collect().map(r => (r.getLong(0), r.getLong(2))))
    assert(opq >= plain - 1e-9, s"opq-lite share=$opq < plain rerank share=$plain")
    assert(opq > 0.95, s"opq-lite same-cluster share=$opq")
    // and the permutation does what it claims: the max/min per-block energy
    // ratio after dealing must not exceed the unpermuted blocking's
    def blockEnergies(p: Seq[Int]): Seq[Double] = {
      val unit = df.withColumn("nn", VectorOps.l2norm(col("nv")))
        .select(transform(col("nv"), _ / col("nn")).as("u"))
        .collect().map(_.getSeq[Double](0))
      val energy = Array.tabulate(dim)(i => unit.map(u => u(i) * u(i)).sum)
      (0 until 4).map(b => (0 until 16).map(s => energy(p(b * 16 + s))).sum)
    }
    val before = blockEnergies(0 until dim)
    val after = blockEnergies(perm)
    assert(after.max / after.min <= before.max / before.min + 1e-9,
      s"permutation failed to balance block energy: before=$before after=$after")
  }

  test("lsh near-dup pairs: exact precision, high recall on clustered vectors") {
    // Near-dup pairs = same-cluster pairs (members are tiny perturbations of
    // a shared centroid, cos ≈ 1; cross-cluster cos is far below threshold).
    val rnd = new scala.util.Random(23)
    val dim = 16
    val centroids = Array.fill(10)(Array.fill(dim)(rnd.nextGaussian()))
    val vecs = for (c <- 0 until 10; m <- 0 until 20) yield {
      val v = centroids(c).map(x => (x + rnd.nextGaussian() * 0.01).toFloat)
      ((c * 20 + m).toLong, v)
    }
    import spark.implicits._
    val df = vecs.toDF("n_id", "embedding")
      .select(col("n_id"), VectorOps.toDouble(col("embedding")).as("nv"))
    val planes = VectorOps.randomPlanes(4, dim, seed = 31)
    val exact = VectorOps.cosineDupPairs(df, 0.9).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = VectorOps.cosineDupPairsLsh(df, planes, 0.9).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty)
    // Precision is exact by construction: candidates still pass the true
    // cosine predicate, so every LSH pair is a true pair.
    assert((lsh -- exact).isEmpty)
    val recall = (exact intersect lsh).size.toDouble / exact.size
    assert(recall > 0.9, s"recall=$recall")
  }

  test("approx distinct sketch stays within 10% of exact") {
    val li = Tables.lineitem(spark, "/root/testdata/sf0.001")
    val r = li.agg(
      countDistinct(col("l_partkey")).as("exact"),
      approx_count_distinct(col("l_partkey")).as("approx")).collect().head
    val (exact, approx) = (r.getLong(0).toDouble, r.getLong(1).toDouble)
    assert(math.abs(approx - exact) / exact < 0.1, s"exact=$exact approx=$approx")
  }

  test("multimodal: stub decode through mapPartitions, frame sampling") {
    import spark.implicits._
    val media = Multimodal.mediaFromDocuments(
      docs((0L, "abcd"), (1L, "efgh"), (2L, "ijklmnop")))
    val feats = Multimodal.extractFeatures(media.as[Multimodal.MediaRecord], batchSize = 2)
      .collect().map(f => f.id -> f).toMap
    assert(feats(0L).kind === "image" && feats(1L).kind === "audio" && feats(2L).kind === "video")
    assert(feats(2L).n_bytes === 8L && feats(2L).height === 'i'.toInt)
    assert(feats(2L).n_frames === 9) // video: 8 % 30 + 1
    assert(feats(0L).digest.length === 64)

    val frames = Multimodal.sampleFrameOffsets(media, 4).collect()
      .map(r => r.getLong(1))
    assert(frames.toSeq === Seq(0L, 2L, 4L, 6L)) // doc 2 is video, 8 bytes
  }

  test("quantize stats: tight error bound, constant vector degenerates cleanly") {
    import spark.implicits._
    val rows = Seq(
      (0L, Array.tabulate(16)(i => (i * 0.37 - 3.0).toFloat)), // spread values
      (1L, Array.fill(16)(2.5f)))                              // constant vector
    val df = rows.toDF("n_id", "embedding")
      .select(col("n_id"), VectorOps.toDouble(col("embedding")).as("nv"))
    val out = VectorOps.quantizeStats(df).collect()
      .map(r => r.getLong(0) -> r).toMap
    // per-dim |error| <= scale/2 -> mse <= (range/255)^2 / 4
    val range = 15 * 0.37
    val bound = math.pow(range / 255.0, 2) / 4.0 + 1e-15
    assert(out(0L).getDouble(3) >= 0.0 && out(0L).getDouble(3) <= bound)
    assert(out(1L).getDouble(3) === 0.0) // constant vector: exact reconstruction
    assert(out(1L).getDouble(1) === 2.5 && out(1L).getDouble(2) === 2.5)
  }

  test("multimodal: real PNG codec round trip — dims AND pixel survive") {
    val png = Multimodal.synthesizePng(width = 7, height = 3, rgb = 0xABCDEF)
    // PNG magic proves a real container, not a fake byte blob
    assert(png.take(4).toSeq === Seq(0x89.toByte, 'P'.toByte, 'N'.toByte, 'G'.toByte))
    val feats = Multimodal.ImageIoDecoder(Multimodal.MediaRecord(1L, "image", png))
    assert(feats.width === 7 && feats.height === 3 && feats.n_frames === 1)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
    assert((img.getRGB(0, 0) & 0xFFFFFF) === 0xABCDEF)
    // non-image payloads fall back to stub semantics
    val junk = Multimodal.MediaRecord(2L, "image", "not a png".getBytes)
    assert(Multimodal.ImageIoDecoder(junk) === Multimodal.StubDecoder(junk))
  }

  test("multimodal: real WAV codec round trip — rate, channels, frames survive") {
    val wav = Multimodal.synthesizeWav(sampleRate = 11000, nFrames = 321)
    // RIFF/WAVE magic proves a real container, not a fake byte blob
    assert(wav.take(4).map(_.toChar).mkString === "RIFF")
    assert(wav.slice(8, 12).map(_.toChar).mkString === "WAVE")
    val feats = Multimodal.WavDecoder(Multimodal.MediaRecord(1L, "audio", wav))
    assert(feats.width === 11000 && feats.height === 1 && feats.n_frames === 321)
    // unparseable audio falls back to stub; images route to the PNG decoder
    val junk = Multimodal.MediaRecord(2L, "audio", "not a wav".getBytes)
    assert(Multimodal.WavDecoder(junk) === Multimodal.StubDecoder(junk))
    val png = Multimodal.MediaRecord(3L, "image",
      Multimodal.synthesizePng(width = 5, height = 4, rgb = 0x123456))
    assert(Multimodal.WavDecoder(png) === Multimodal.ImageIoDecoder(png))
  }

  test("multimodal: real GIF container round trip — frame count survives") {
    val gif = Multimodal.synthesizeGif(width = 9, height = 6, nFrames = 4)
    // GIF magic proves a real container
    assert(gif.take(6).map(_.toChar).mkString.startsWith("GIF8"))
    val feats = Multimodal.GifVideoDecoder(Multimodal.MediaRecord(1L, "video", gif))
    assert(feats.width === 9 && feats.height === 6 && feats.n_frames === 4)
    // unparseable video falls back to stub; audio routes to the WAV decoder
    val junk = Multimodal.MediaRecord(2L, "video", "not a gif".getBytes)
    assert(Multimodal.GifVideoDecoder(junk) === Multimodal.StubDecoder(junk))
    val wav = Multimodal.MediaRecord(3L, "audio",
      Multimodal.synthesizeWav(sampleRate = 9000, nFrames = 17))
    assert(Multimodal.GifVideoDecoder(wav) === Multimodal.WavDecoder(wav))
  }

  test("multimodal: per-frame walk reads every frame's pixels") {
    import spark.implicits._
    val media = spark.createDataset(Seq(
      Multimodal.MediaRecord(1L, "video", Multimodal.synthesizeGif(5, 4, 3)),
      Multimodal.MediaRecord(2L, "image", Multimodal.synthesizePng(8, 8, 7)),
      Multimodal.MediaRecord(3L, "video", "junk".getBytes)))
    val rows = Multimodal.walkFrames(media).collect().sortBy(f => (f.id, f.frame_idx))
    // video 1: one row per frame, pixel (0,0) carries the frame index;
    // non-video and unparseable payloads contribute nothing
    assert(rows.map(_.id).toSeq === Seq(1L, 1L, 1L))
    assert(rows.map(_.frame_idx).toSeq === Seq(0, 1, 2))
    assert(rows.forall(f => f.width === 5 && f.height === 4))
    assert(rows.map(_.rgb00).toSeq === Seq(0, 1, 2))
  }

  test("sequence packing: bins respect the bounded-overflow contract") {
    // sp1's packing admits bounded overflow (a doc starting before the
    // boundary stays in its bin), and per-doc counts are capped at the
    // window capacity — so every bin's token sum is < 2*cap, and within a
    // shard only the LAST bin may be under-full relative to the boundary
    // walk. The first property is the training-window contract; assert it.
    val cap = 512L
    val bins = graft.SparkEntry.queries("sp1_sequence_packing")(
      spark, "/root/testdata/sf0.001").collect()
    assert(bins.nonEmpty)
    val over = bins.filter(_.getAs[Long]("tok_sum") >= 2 * cap)
    assert(over.isEmpty,
      s"bins violating the <2*cap overflow bound: ${over.mkString(", ")}")
  }

  test("bpe3 token sequences are consistent with bpe2 token counts") {
    // Same trained merges, two faces: bpe3's per-doc token-row count must
    // equal bpe2's per-doc n_tokens, and token ids must be a dense 1..V
    // ranking of the vocabulary.
    import org.apache.spark.sql.functions._
    val sfDir = "/root/testdata/sf0.001"
    val counts = graft.SparkEntry.queries("bpe2_encode")(spark, sfDir)
      .select(col("doc_id"), col("n_tokens"))
    val seqs = graft.SparkEntry.queries("bpe3_tokenize")(spark, sfDir)
    val mismatch = seqs.groupBy("doc_id").agg(count(lit(1)).as("n_rows"))
      .join(counts, "doc_id")
      .filter(col("n_rows") =!= col("n_tokens"))
      .count()
    assert(mismatch == 0, "bpe3 row counts disagree with bpe2 token counts")
    val ids = seqs.select("token_id").distinct()
    val v = ids.count()
    assert(v > 0 && ids.agg(min("token_id"), max("token_id")).head ==
      org.apache.spark.sql.Row(1L, v), "token ids are not a dense 1..V ranking")
  }

  test("star-contraction CC: agrees with min-label CC and is logarithmic on a chain") {
    import spark.implicits._
    // The case star contraction exists for: a 200-node chain (diameter
    // 199). Min-label propagation needs ~diameter rounds (default maxIter
    // 10 would NOT converge here); star contraction must finish inside its
    // default 25 — i.e., ~log2(n) round pairs, not O(n).
    val chain = (0L until 199L).map(i => (i, i + 1)).toDF("a", "b")
    val star = graft.dedup.Dedup.connectedComponentsStar(chain).collect()
    assert(star.length == 200)
    assert(star.forall(_.getAs[Long]("cluster") == 0L),
      "chain must collapse to a single cluster rooted at 0")
    // and on branchy random-ish pairs the two algorithms agree label-for-label
    val pairs = (0L until 300L).filter(_ % 3 != 0)
      .map(i => (i / 7 * 7, i)).filter { case (a, b) => a != b }.toDF("a", "b")
    val viaProp = graft.dedup.Dedup.connectedComponents(pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val viaStar = graft.dedup.Dedup.connectedComponentsStar(pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaStar == viaProp)
  }

  test("ANN query batch covers every vector at the verify scales") {
    // The v3/v4/v4b/v9/v9b/v10 faces serve the n_id < qBatch query batch
    // (oracle-mirrored as vec_id < qBatch). The verify fixtures currently
    // hold <= qBatch embeddings, so the faces' correctness scope is the
    // WHOLE corpus — if a regenerated fixture ever grows past qBatch, that
    // scope silently shrinks to a subset (hash checks stay green because
    // query and oracle filter identically). Fail loudly instead.
    for (sf <- Seq("sf0.001", "sf0.01")) {
      val n = Tables.embeddings(spark, s"/root/testdata/$sf").count()
      assert(n <= graft.queries.VectorQueries.qBatch,
        s"$sf embeddings count $n exceeds the ANN faces' query batch " +
          s"(${graft.queries.VectorQueries.qBatch}): the faces no longer " +
          "cover the full corpus at verify scale — raise qBatch (and the " +
          "oracle literals follow automatically) or shrink the fixture")
    }
  }

  test("vector mean: ragged embeddings fail fast with the dimension message") {
    import spark.implicits._
    val vm = org.apache.spark.sql.functions.udaf(new Aggregators.VectorMean)
    val ok = Seq((1L, Seq(1.0, 2.0)), (1L, Seq(3.0, 4.0))).toDF("k", "v")
      .groupBy("k").agg(vm(org.apache.spark.sql.functions.col("v")).as("m"))
      .collect().head.getSeq[Double](1)
    assert(ok === Seq(2.0, 3.0))
    val ragged = Seq((1L, Seq(1.0, 2.0)), (1L, Seq(3.0))).toDF("k", "v")
      .groupBy("k").agg(vm(org.apache.spark.sql.functions.col("v")).as("m"))
    val e = intercept[org.apache.spark.SparkException] { ragged.collect() }
    assert(e.getMessage.contains("VectorMean"), s"unexpected: ${e.getMessage}")
  }
}
