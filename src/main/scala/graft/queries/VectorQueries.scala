package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.similarity.VectorOps

/** Similarity-search queries over the embeddings table. ALL carry full
  * DuckDB oracles: double math is engine-identical, and the LSH hyperplanes /
  * IVF centroids are deterministic (fixed seed / first-N-by-id), so the
  * bucket assignment replays in closed-form SQL — the plane literals are
  * emitted into the oracle from the very same [[VectorOps.randomPlanes]]
  * call the Spark plan uses.
  */
object VectorQueries {
  private type Q = (SparkSession, String) => DataFrame

  private def corpus(s: SparkSession, d: String): DataFrame = {
    graft.functions.DotProduct.register(s)
    Tables.embeddings(s, d).select(
      col("vec_id").as("n_id"), VectorOps.toDouble(col("embedding")).as("nv"))
  }

  val queries: Map[String, Q] = Map(
    // V1: brute-force cosine top-5 for the first 20 query vectors.
    "v1_knn_bruteforce" -> ((s, d) => {
      val c = corpus(s, d)
      val q = c.filter(col("n_id") < 20).select(col("n_id").as("q_id"), col("nv").as("qv"))
      VectorOps.bruteForceTopK(c, q, 5)
    }),

    // V2: embedding near-dup pairs above a cosine threshold — exact oracle
    // face, id-bounded (like d4/ld1) so the cross-join is constant-size at
    // any sf. The unbounded scale path is v2b.
    "v2_cosine_dup_pairs" -> ((s, d) =>
      VectorOps.cosineDupPairs(corpus(s, d).filter(col("n_id") < 300), 0.35)),

    // V2b: the same near-dup predicate over LSH bucket candidates — the
    // production form: candidate generation is an equi-join on bucket id,
    // never a cross-join, so it scales to the full corpus.
    "v2b_cosine_dup_lsh" -> ((s, d) =>
      VectorOps.cosineDupPairsLsh(corpus(s, d), planes, 0.35)),

    // V3: LSH-bucketed ANN (6 hyperplanes -> 64 buckets). Full closed-form
    // oracle (plane literals replayed in SQL); recall vs v1 in NorthStarSpec.
    "v3_knn_lsh" -> ((s, d) =>
      VectorOps.lshTopK(corpus(s, d), planes, 5)),

    // V4: IVF ANN (16 cells, probe 4). Full closed-form oracle (first-16
    // centroids replayed in SQL); recall vs brute force in NorthStarSpec.
    "v4_knn_ivf" -> ((s, d) =>
      VectorOps.ivfTopK(corpus(s, d), nCells = 16, nProbe = 4, k = 5)),

    // V4b: IVF with a TRAINED quantizer — one deterministic Lloyd refinement
    // of the first-16 seed (per-cell mean centroids, rounded 6dp so the SQL
    // replay is exact), then the same 4-probe search. Full closed-form
    // oracle like v4.
    "v4b_knn_ivf_refined" -> ((s, d) =>
      VectorOps.ivfTopKRefined(corpus(s, d), nCells = 16, nProbe = 4, k = 5)),

    // V6: int8 scalar-quantization audit — per-vector range + dequantization
    // MSE (shuffle-free per-row math; the go/no-go check before storing
    // embeddings at 1 byte/dim).
    "v6_quantize_stats" -> ((s, d) =>
      VectorOps.quantizeStats(corpus(s, d))),

    // V5: same brute-force top-5 as v1 but reduced by the bounded-heap TopK
    // Aggregator instead of a window — map-side partial combine keeps at
    // most k pairs per (query, partition), so the shuffle carries heaps,
    // not every scored pair (the 100 TB shape). Same oracle as v1.
    "v5_knn_topk_agg" -> ((s, d) => {
      val c = corpus(s, d)
        .withColumn("nn", VectorOps.l2norm(col("nv")))
        .repartition(s.sparkContext.defaultParallelism)
      val q = c.filter(col("n_id") < 20)
        .select(col("n_id").as("q_id"), col("nv").as("qv"), col("nn").as("qn"))
      val topk = udaf(new graft.functions.Aggregators.TopK(5))
      c.crossJoin(broadcast(q))
        .filter(col("n_id") =!= col("q_id"))
        .withColumn("cos", VectorOps.dot(col("qv"), col("nv")) / (col("qn") * col("nn")))
        .groupBy("q_id")
        .agg(topk(col("cos"), col("n_id")).as("top"))
        .select(col("q_id"), posexplode(col("top")))
        .select(col("q_id"), (col("pos") + 1).cast("bigint").as("rank"),
          col("col._2").as("n_id"), round(col("col._1"), 6).as("cos"))
    })
  )

  /** The hyperplanes shared by v2b/v3 — ONE deterministic generation feeds
    * both the Spark plan and the SQL oracle literals below.
    */
  private val planes: Seq[Array[Double]] = VectorOps.randomPlanes(6, 64)

  private val eCte = "SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings"
  private val cosExpr =
    """list_inner_product(a.v, b.v) /
       (sqrt(list_inner_product(a.v, a.v)) * sqrt(list_inner_product(b.v, b.v)))"""

  /** A plane as a DuckDB DOUBLE[] literal. Scala's Double.toString is the
    * shortest round-trip decimal repr, so DuckDB parses back the identical
    * binary double and the sign-bit bucket replay is exact.
    */
  private def planeLit(p: Array[Double]): String =
    p.mkString("[", ", ", "]::DOUBLE[]")

  /** Replay of [[VectorOps.lshBucket]]: sum of sign bits ≙ when(dot>0, 2^i). */
  private def bucketSql(vCol: String): String =
    planes.zipWithIndex.map { case (p, i) =>
      s"(CASE WHEN list_inner_product($vCol, ${planeLit(p)}) > 0 THEN ${1L << i} ELSE 0 END)"
    }.mkString("(", " + ", ")")

  /** Bucketed corpus CTE shared by the v2b/v3 oracles: per-row norm + bucket. */
  private def bucketedCte: String =
    s"""WITH e AS ($eCte),
       bk AS (SELECT vec_id, v, sqrt(list_inner_product(v, v)) AS nrm,
                ${bucketSql("v")} AS bucket
              FROM e)"""

  private val pairCos = "list_inner_product(q.v, n.v) / (q.nrm * n.nrm)"
  // (knnOracle below is shared by v1 and v5 — identical semantics, different
  // physical reduction.)

  private val knnOracle =
    s"""WITH e AS ($eCte)
       SELECT q_id, rank, n_id, cos FROM (
         SELECT a.vec_id AS q_id, b.vec_id AS n_id,
           row_number() OVER (PARTITION BY a.vec_id ORDER BY $cosExpr DESC, b.vec_id) AS rank,
           round($cosExpr, 6) AS cos
         FROM e a, e b
         WHERE a.vec_id < 20 AND b.vec_id != a.vec_id)
       WHERE rank <= 5"""

  val oracles: Map[String, String] = Map(
    "v6_quantize_stats" ->
      s"""WITH e AS ($eCte)
         SELECT vec_id AS n_id,
           round(list_min(v), 6) AS q_min,
           round(list_max(v), 6) AS q_max,
           round(list_sum(list_transform(
             list_transform(v, x ->
               x - (CASE WHEN list_max(v) = list_min(v) THEN list_min(v)
                    ELSE list_min(v) + floor((x - list_min(v)) / ((list_max(v) - list_min(v)) / 255.0) + 0.5)
                           * ((list_max(v) - list_min(v)) / 255.0) END)),
             y -> y * y)) / len(v), 12) AS mse
         FROM e""",
    "v5_knn_topk_agg" -> knnOracle,
    "v1_knn_bruteforce" ->
      s"""WITH e AS ($eCte)
         SELECT q_id, rank, n_id, cos FROM (
           SELECT a.vec_id AS q_id, b.vec_id AS n_id,
             row_number() OVER (PARTITION BY a.vec_id ORDER BY $cosExpr DESC, b.vec_id) AS rank,
             round($cosExpr, 6) AS cos
           FROM e a, e b
           WHERE a.vec_id < 20 AND b.vec_id != a.vec_id)
         WHERE rank <= 5""",
    "v2_cosine_dup_pairs" ->
      s"""WITH e AS ($eCte)
         SELECT a.vec_id AS a, b.vec_id AS b, round($cosExpr, 6) AS cos
         FROM e a, e b
         WHERE a.vec_id < 300 AND b.vec_id < 300
           AND a.vec_id < b.vec_id AND $cosExpr >= 0.35""",
    "v2b_cosine_dup_lsh" ->
      s"""$bucketedCte
         SELECT q.vec_id AS a, n.vec_id AS b, round($pairCos, 6) AS cos
         FROM bk q JOIN bk n ON q.bucket = n.bucket AND q.vec_id < n.vec_id
         WHERE $pairCos >= 0.35""",
    "v3_knn_lsh" ->
      s"""$bucketedCte
         SELECT q_id, rank, n_id, cos FROM (
           SELECT q.vec_id AS q_id, n.vec_id AS n_id,
             row_number() OVER (PARTITION BY q.vec_id
                                ORDER BY $pairCos DESC, n.vec_id) AS rank,
             round($pairCos, 6) AS cos
           FROM bk q JOIN bk n ON q.bucket = n.bucket AND n.vec_id != q.vec_id)
         WHERE rank <= 5""",
    "v4b_knn_ivf_refined" ->
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v,
                sqrt(list_inner_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
              FROM embeddings),
         seeds AS (SELECT vec_id AS cell, v AS cv, nrm AS cn
                   FROM e ORDER BY vec_id LIMIT 16),
         sscore AS (
           SELECT e.vec_id, e.v, e.nrm, seeds.cell,
             row_number() OVER (PARTITION BY e.vec_id
               ORDER BY list_inner_product(e.v, seeds.cv) / (e.nrm * seeds.cn) DESC,
                        seeds.cell) AS r
           FROM e CROSS JOIN seeds),
         sassign AS (SELECT vec_id, v, nrm, cell FROM sscore WHERE r = 1),
         dims AS (
           SELECT cell, i, round(avg(v[i+1]), 6) AS m
           FROM sassign, unnest(range(len(v))) u(i)
           GROUP BY cell, i),
         refined AS (
           SELECT cell, list(m ORDER BY i) AS cv,
             sqrt(list_inner_product(list(m ORDER BY i), list(m ORDER BY i))) AS cn
           FROM dims GROUP BY cell),
         cscore AS (
           SELECT e.vec_id, e.v, e.nrm, refined.cell,
             row_number() OVER (PARTITION BY e.vec_id
               ORDER BY list_inner_product(e.v, refined.cv) / (e.nrm * refined.cn) DESC,
                        refined.cell) AS r
           FROM e CROSS JOIN refined),
         ccell AS (SELECT vec_id, v, nrm, cell FROM cscore WHERE r <= 1),
         qcell AS (SELECT vec_id, v, nrm, cell FROM cscore WHERE r <= 4)
         SELECT q_id, rank, n_id, cos FROM (
           SELECT q.vec_id AS q_id, n.vec_id AS n_id,
             row_number() OVER (PARTITION BY q.vec_id
                                ORDER BY $pairCos DESC, n.vec_id) AS rank,
             round($pairCos, 6) AS cos
           FROM qcell q JOIN ccell n ON q.cell = n.cell AND n.vec_id != q.vec_id)
         WHERE rank <= 5""",
    "v4_knn_ivf" ->
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v,
                sqrt(list_inner_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
              FROM embeddings),
         cent AS (SELECT vec_id AS cell, v AS cv, nrm AS cn
                  FROM e ORDER BY vec_id LIMIT 16),
         scored AS (
           SELECT e.vec_id, e.v, e.nrm, cent.cell,
             row_number() OVER (PARTITION BY e.vec_id
               ORDER BY list_inner_product(e.v, cent.cv) / (e.nrm * cent.cn) DESC,
                        cent.cell) AS r
           FROM e CROSS JOIN cent),
         ccell AS (SELECT vec_id, v, nrm, cell FROM scored WHERE r <= 1),
         qcell AS (SELECT vec_id, v, nrm, cell FROM scored WHERE r <= 4)
         SELECT q_id, rank, n_id, cos FROM (
           SELECT q.vec_id AS q_id, n.vec_id AS n_id,
             row_number() OVER (PARTITION BY q.vec_id
                                ORDER BY $pairCos DESC, n.vec_id) AS rank,
             round($pairCos, 6) AS cos
           FROM qcell q JOIN ccell n ON q.cell = n.cell AND n.vec_id != q.vec_id)
         WHERE rank <= 5"""
  )
}
