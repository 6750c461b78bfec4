package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus retrieval operators (the tx17/tx18 registry faces made a library
  * surface — a training-data pipeline uses these for benchmark-style
  * retrieval evaluation and hard-negative mining, not just ad-hoc queries).
  *
  * Reference surface: none (the w0bm reference has no retrieval); this is
  * north-star territory — see SURVEY.md "what the driver's north star adds".
  */
object Retrieval {

  /** Okapi BM25 top-k retrieval for a QUERY TABLE.
    *
    * `docs`: (docIdCol, textCol); `queries`: (queryIdCol, termCol) — one
    * row per (query, term), duplicate terms within a query score twice
    * (standard bag-of-terms query semantics). Returns one row per
    * (query_id, rank<=k): (query_id, rank, doc_id, bm25), ranked by score
    * descending with doc_id as the deterministic tie-break. Only documents
    * containing >= 1 query term are scored (a 0-tf doc scores 0 and must
    * not pad a thin top-k).
    *
    * Scale shapes (the tx18 plan, audited in RegistryPlanSpec):
    *   - ONE pass over the exploded corpus into (doc, word) counts — the
    *     inverted-index build, linear with one shuffle, checkpointed so
    *     the dl/tf/df consumers re-read (doc x distinct-word)-cardinality
    *     rows instead of re-exploding the corpus each;
    *   - the query table, per-term dfs, and corpus stats broadcast
    *     (queries are human-authored — never corpus-scale);
    *   - per-query top-k via the bounded TopK aggregator: k rows per
    *     (query, partition) cross the wire, never a global window sort.
    *
    * Determinism contract: each per-term factor is one fixed
    * parenthesization over integer counts; contributions are scaled to
    * integers (x 1e9, round) and summed as LONGs, so the variable-length
    * per-(query, doc) sum is exact and order-independent — bit-identical
    * across engines and shuffle orders. Scores are therefore exact to 1e-9
    * (far below any ranking-relevant difference).
    */
  def bm25TopK(docs: DataFrame, queries: DataFrame, k: Int = 10,
      k1: Double = 1.2, b: Double = 0.75,
      docIdCol: String = "doc_id", textCol: String = "text",
      queryIdCol: String = "query_id", termCol: String = "term"): DataFrame = {
    val qt = broadcast(queries.select(col(queryIdCol).as("query_id"),
      col(termCol).as("term")))
    val words = docs
      .select(col(docIdCol).as("doc_id"),
        explode(split(lower(trim(col(textCol))), "\\s+")).as("word"))
      .filter(col("word") =!= "")
    val tc = graft.ops.Checkpoints.tracked(
      words.groupBy("doc_id", "word").agg(count(lit(1)).as("cnt")))
    val lens = tc.groupBy("doc_id").agg(sum("cnt").as("dl"))
    val stats = lens.agg(count(lit(1)).as("n_docs"), sum("dl").as("sum_dl"))
    // semi-filter the index to query terms BEFORE any join — tf cardinality
    // is (docs containing a term x terms), not the whole index
    val tf = tc.join(broadcast(queries.select(col(termCol).as("word")).distinct()),
      "word")
    val dfs = tf.groupBy("word").agg(count(lit(1)).as("df"))
      .withColumnRenamed("word", "df_word")
    // idf(t) * ((tf*(k1+1)) / (tf + k1*((1-b) + b*(dl/(sum_dl/n_docs)))))
    val contrib = tf
      .join(qt, col("word") === col("term"))
      .join(lens, "doc_id")
      .crossJoin(broadcast(stats))
      .join(broadcast(dfs), col("word") === col("df_word"))
      .withColumn("c", round(
        (log((col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)) + lit(1.0)) *
          ((col("cnt") * lit(k1 + 1.0)) /
            (col("cnt") + lit(k1) *
              (lit(1.0 - b) + lit(b) * (col("dl") / (col("sum_dl") / col("n_docs"))))))
        ) * lit(1e9)).cast("long"))
    val topk = udaf(new graft.functions.Aggregators.TopK(k))
    contrib.groupBy("query_id", "doc_id").agg(sum("c").as("s_e9"))
      .groupBy("query_id")
      .agg(topk(col("s_e9").cast("double"), col("doc_id")).as("top"))
      .select(col("query_id"), posexplode(col("top")))
      .select(col("query_id"), (col("pos") + 1).cast("bigint").as("rank"),
        col("col._2").as("doc_id"),
        round(col("col._1") / lit(1e9), 6).as("bm25"))
  }
}
