package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.multimodal.Multimodal

/** Multimodal plumbing queries. The stub decoder's features are
  * deterministic functions of the payload bytes, so even the
  * mapPartitions/case-class typed path gets a full DuckDB oracle.
  */
object MediaQueries {
  private type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // MM2: batched per-partition "decode" through the typed Dataset path.
    "mm2_decode_features" -> ((s, d) => {
      import s.implicits._
      Multimodal.extractFeatures(
        Multimodal.mediaFromDocuments(Tables.documents(s, d))
          .as[Multimodal.MediaRecord])
        .toDF()
        .select(col("id"), col("kind"), col("n_bytes"),
          col("width").cast("bigint").as("width"),
          col("height").cast("bigint").as("height"),
          col("n_frames").cast("bigint").as("n_frames"),
          col("digest"))
    }),

    // MM3: frame-offset sampling arithmetic + explode shape.
    "mm3_frame_offsets" -> ((s, d) =>
      Multimodal.sampleFrameOffsets(
        Multimodal.mediaFromDocuments(Tables.documents(s, d)), 4))
  )

  private val kindExpr = "['image','audio','video'][(doc_id % 3 + 1)::INT]"

  val oracles: Map[String, String] = Map(
    "mm2_decode_features" ->
      s"""SELECT doc_id AS id, $kindExpr AS kind,
           octet_length(encode(text))::BIGINT AS n_bytes,
           (octet_length(encode(text)) % 1024)::BIGINT AS width,
           CASE WHEN octet_length(encode(text)) > 0 THEN ascii(substr(text, 1, 1)) ELSE 0 END::BIGINT AS height,
           CASE WHEN $kindExpr = 'video' THEN octet_length(encode(text)) % 30 + 1 ELSE 1 END::BIGINT AS n_frames,
           sha256(text) AS digest
         FROM documents""",
    "mm3_frame_offsets" ->
      s"""SELECT doc_id AS id,
           (i * octet_length(encode(text))) // 4 AS frame_offset
         FROM documents, unnest([0, 1, 2, 3]) u(i)
         WHERE $kindExpr = 'video'"""
  )
}
