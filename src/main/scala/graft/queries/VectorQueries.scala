package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.similarity.VectorOps

/** Similarity-search queries over the embeddings table. v1/v2 carry full
  * DuckDB oracles (double math is engine-identical); the LSH variant is the
  * scale path, recall-checked against v1 in the test suite (no closed-form
  * SQL oracle for the hyperplane literals — registered as rows-only).
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

    // V2: embedding near-dup pairs above a cosine threshold.
    "v2_cosine_dup_pairs" -> ((s, d) =>
      VectorOps.cosineDupPairs(corpus(s, d), 0.35)),

    // V3: LSH-bucketed ANN (6 hyperplanes -> 64 buckets). Rows-only driver
    // check; recall vs v1 asserted in NorthStarSpec.
    "v3_knn_lsh" -> ((s, d) =>
      VectorOps.lshTopK(corpus(s, d), VectorOps.randomPlanes(6, 64), 5)),

    // V4: IVF ANN (16 cells, probe 4). Rows-only driver check; recall vs
    // brute force asserted in NorthStarSpec.
    "v4_knn_ivf" -> ((s, d) =>
      VectorOps.ivfTopK(corpus(s, d), nCells = 16, nProbe = 4, k = 5)),

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

  private val eCte = "SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings"
  private val cosExpr =
    """list_inner_product(a.v, b.v) /
       (sqrt(list_inner_product(a.v, a.v)) * sqrt(list_inner_product(b.v, b.v)))"""
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
         WHERE a.vec_id < b.vec_id AND $cosExpr >= 0.35"""
  )
}
