package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Similarity-search operators over embedding columns (Array[Float], dim 64
  * in the fixtures) — north-star surface; the reference has no vector ops.
  *
  * All math is done in double precision via codegen'd higher-order functions
  * (`zip_with`/`aggregate`) — element-wise then sequential fold, so the
  * DuckDB oracle reproduces values exactly. No UDFs.
  *
  * Scale posture: brute-force top-k broadcasts the (small) query set and
  * streams the corpus — one pass, no shuffle of the corpus, a per-partition
  * top-k would bound memory; the LSH path buckets vectors by random
  * hyperplane signs so candidate generation is an equi-join on bucket id
  * (never the quadratic cross-join) — the standard 100 TB ANN shape.
  */
object VectorOps {

  /** Float array -> double array (deterministic widening). */
  def toDouble(v: Column): Column = transform(v, _.cast("double"))

  /** Sequential-fold dot product. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def l2norm(v: Column): Column = sqrt(dot(v, v))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2norm(a) * l2norm(b))

  /** Brute-force cosine top-k: for each query vector, the k nearest corpus
    * vectors (self excluded), rank tie-broken by neighbor id.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val joined = corpus.crossJoin(broadcast(queries))
      .filter(col("n_id") =!= col("q_id"))
      .withColumn("cos", cosine(col("qv"), col("nv")))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("n_id").asc)
    joined
      .withColumn("rank", row_number().over(w).cast("bigint"))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("n_id"), round(col("cos"), 6).as("cos"))
  }

  /** Deterministic random hyperplanes (fixed seed -> identical plan every
    * run); nPlanes sign bits form the LSH bucket id.
    */
  def randomPlanes(nPlanes: Int, dim: Int, seed: Long = 42L): Seq[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(nPlanes)(Array.fill(dim)(rnd.nextGaussian()))
  }

  /** Bucket id from hyperplane sign bits. */
  def lshBucket(v: Column, planes: Seq[Array[Double]]): Column =
    planes.zipWithIndex.map { case (p, i) =>
      val planeCol = array(p.map(lit): _*)
      when(dot(v, planeCol) > 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** LSH-bucketed ANN: candidates share a bucket; top-k within candidates.
    * Trades recall for replacing the cross-join with an equi-join — recall
    * measured against [[bruteForceTopK]] in the test suite.
    */
  def lshTopK(vectors: DataFrame, planes: Seq[Array[Double]], k: Int): DataFrame = {
    val bucketed = vectors.withColumn("bucket", lshBucket(col("nv"), planes))
    val q = bucketed.select(col("n_id").as("q_id"), col("nv").as("qv"), col("bucket"))
    val joined = bucketed.join(q, "bucket")
      .filter(col("n_id") =!= col("q_id"))
      .withColumn("cos", cosine(col("qv"), col("nv")))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("n_id").asc)
    joined
      .withColumn("rank", row_number().over(w).cast("bigint"))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("n_id"), round(col("cos"), 6).as("cos"))
  }

  /** All pairs above a cosine threshold (embedding near-dup detection).
    * Brute-force face for oracle checking; at scale the same predicate runs
    * over LSH candidates instead of the cross-join.
    */
  def cosineDupPairs(vectors: DataFrame, threshold: Double): DataFrame = {
    val a = vectors.select(col("n_id").as("a"), col("nv").as("va"))
    val b = vectors.select(col("n_id").as("b"), col("nv").as("vb"))
    a.crossJoin(b).filter(col("a") < col("b"))
      .withColumn("cos", cosine(col("va"), col("vb")))
      .filter(col("cos") >= threshold)
      .select(col("a"), col("b"), round(col("cos"), 6).as("cos"))
  }
}
