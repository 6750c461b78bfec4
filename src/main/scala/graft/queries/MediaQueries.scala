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
        Multimodal.mediaFromDocuments(Tables.documents(s, d)), 4)),

    // MM4: REAL codec round trip — synthesize a PNG with closed-form dims
    // per doc (executor-side ImageIO.write), decode it back through the
    // Decoder seam (ImageIO.read), emit the decoded dimensions. The oracle
    // knows only the arithmetic: the row hashes can match ONLY if a real
    // PNG encoder and decoder both ran. Bounded to 200 docs — codec work is
    // per-row CPU, and the check needs coverage, not volume.
    "mm4_png_decode" -> ((s, d) => {
      import s.implicits._
      val media = Tables.documents(s, d).filter(col("doc_id") < 200)
        .select(col("doc_id")).as[Long]
        .map { id =>
          Multimodal.MediaRecord(id, "image", Multimodal.synthesizePng(
            width = (id % 64 + 1).toInt, height = (id % 48 + 1).toInt,
            rgb = ((id * 1000003L) % 16777216L).toInt))
        }
      Multimodal.extractFeatures(media, Multimodal.ImageIoDecoder)
        .toDF()
        .select(col("id"),
          col("width").cast("bigint").as("width"),
          col("height").cast("bigint").as("height"),
          col("n_frames").cast("bigint").as("n_frames"))
    }),

    // MM8: perceptual-hash IMAGE DEDUP — the multimodal curation operator:
    // synthesize a patterned 8x8 PNG per doc (ids sharing id % 16 produce
    // byte-identical images: the planted dup groups), round-trip it through
    // the REAL codec (ImageIO encode + decode), compute the 64-bit
    // average-hash from the DECODED pixels, and resolve each hash group to
    // its min-id representative. The oracle knows only the pixel
    // arithmetic — rows can match ONLY if a real encoder, decoder, and the
    // hash pipeline all ran. Grouping is an equi-join/window on the hash
    // (the d1 exact-dedup shape with a perceptual key), so the plan scales
    // like any hash dedup.
    "mm8_phash_dedup" -> ((s, d) => {
      import s.implicits._
      val w = org.apache.spark.sql.expressions.Window.partitionBy("phash")
      Tables.documents(s, d).filter(col("doc_id") < 200)
        .select(col("doc_id")).as[Long]
        .map { id =>
          (id, Multimodal.averageHash(Multimodal.synthesizePatternPng(id)))
        }
        .toDF("id", "phash")
        .withColumn("group_rep", min(col("id")).over(w))
        .select(col("id"), col("phash"), col("group_rep"))
    }),

    // MM5: REAL audio codec round trip, the WAV analog of mm4 — synthesize a
    // 16-bit mono PCM WAV with closed-form sample rate / frame count per doc
    // (executor-side AudioSystem.write), decode it back through the Decoder
    // seam (AudioSystem.getAudioInputStream), emit the decoded container
    // facts. The oracle knows only the arithmetic, so hashes match ONLY if a
    // real WAV encoder and parser both ran.
    "mm5_wav_decode" -> ((s, d) => {
      import s.implicits._
      val media = Tables.documents(s, d).filter(col("doc_id") < 200)
        .select(col("doc_id")).as[Long]
        .map { id =>
          Multimodal.MediaRecord(id, "audio", Multimodal.synthesizeWav(
            sampleRate = (8000 + (id % 8) * 1000).toInt,
            nFrames = (id % 500 + 1).toInt))
        }
      Multimodal.extractFeatures(media, Multimodal.WavDecoder)
        .toDF()
        .select(col("id"),
          col("width").cast("bigint").as("sample_rate"),
          col("height").cast("bigint").as("n_channels"),
          col("n_frames").cast("bigint").as("n_frames"))
    }),

    // MM9: sample-level AUDIO FEATURES over the real codec — peak amplitude,
    // RMS energy, zero-crossing count from the DECODED PCM (wavSamples), the
    // speech/music/silence triage features an audio-corpus gate runs first.
    // The oracle replays the synthesizeWav sample formula closed-form
    // (generate_series), so a hash match proves the javax.sound round trip
    // preserved every 16-bit sample — content-level, where mm5 pins only
    // header fields. Integer-exact peak/zcr; rms is one sqrt over an exact
    // integer sum (the apx/tx rounding contract). Per-row decode,
    // shuffle-free.
    "mm9_audio_features" -> ((s, d) => {
      import s.implicits._
      val media = Tables.documents(s, d).filter(col("doc_id") < 200)
        .select(col("doc_id")).as[Long]
        .map { id =>
          Multimodal.MediaRecord(id, "audio", Multimodal.synthesizeWav(
            sampleRate = (8000 + (id % 8) * 1000).toInt,
            nFrames = (id % 500 + 1).toInt))
        }
      media.map { m =>
        val sm = Multimodal.wavSamples(m.payload)
        var zcr = 0L; var sumSq = 0L; var peak = 0L; var i = 0
        while (i < sm.length) {
          val v = sm(i).toLong
          if (i > 0 && ((v >= 0) != (sm(i - 1) >= 0))) zcr += 1
          sumSq += v * v
          val a = math.abs(v); if (a > peak) peak = a
          i += 1
        }
        (m.id, peak, math.sqrt(sumSq.toDouble / sm.length), zcr)
      }.toDF("id", "peak", "rms", "zcr")
        .select(col("id"), col("peak"), round(col("rms"), 6).as("rms"), col("zcr"))
    }),

    // MM6: REAL video-container round trip — synthesize an animated GIF
    // with a closed-form frame count per doc (executor-side multi-frame
    // imageio write), decode dimensions AND the container's actual frame
    // count back through the Decoder seam. The oracle knows only the
    // arithmetic: hashes match ONLY if a real multi-frame container was
    // written and walked.
    "mm6_gif_decode" -> ((s, d) => {
      import s.implicits._
      val media = Tables.documents(s, d).filter(col("doc_id") < 200)
        .select(col("doc_id")).as[Long]
        .map { id =>
          Multimodal.MediaRecord(id, "video", Multimodal.synthesizeGif(
            width = (id % 32 + 1).toInt, height = (id % 24 + 1).toInt,
            nFrames = (id % 5 + 1).toInt))
        }
      Multimodal.extractFeatures(media, Multimodal.GifVideoDecoder)
        .toDF()
        .select(col("id"),
          col("width").cast("bigint").as("width"),
          col("height").cast("bigint").as("height"),
          col("n_frames").cast("bigint").as("n_frames"))
    }),

    // MM7: per-frame walk of the same synthesized GIFs — one row per
    // contained frame with its decoded dims and the (0,0) pixel payload
    // (synthesizeGif stores the frame index there). The oracle knows only
    // the closed-form arithmetic, so the hash can match ONLY if every
    // frame of a real multi-frame container was decoded and its pixels
    // read — mm6 proves the container walk, mm7 proves per-frame pixel
    // access through the same seam.
    "mm7_frame_walk" -> ((s, d) => {
      import s.implicits._
      val media = Tables.documents(s, d).filter(col("doc_id") < 200)
        .select(col("doc_id")).as[Long]
        .map { id =>
          Multimodal.MediaRecord(id, "video", Multimodal.synthesizeGif(
            width = (id % 32 + 1).toInt, height = (id % 24 + 1).toInt,
            nFrames = (id % 5 + 1).toInt))
        }
      Multimodal.walkFrames(media)
        .toDF()
        .select(col("id"),
          col("frame_idx").cast("bigint").as("frame_idx"),
          col("width").cast("bigint").as("width"),
          col("height").cast("bigint").as("height"),
          col("rgb00").cast("bigint").as("rgb00"))
    })
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
         WHERE $kindExpr = 'video'""",
    "mm4_png_decode" ->
      """SELECT doc_id AS id,
           (doc_id % 64 + 1)::BIGINT AS width,
           (doc_id % 48 + 1)::BIGINT AS height,
           1::BIGINT AS n_frames
         FROM documents WHERE doc_id < 200""",
    "mm8_phash_dedup" ->
      """WITH px AS (
           SELECT doc_id AS id, x, y,
             ((doc_id % 16) * 7 + x * 3 + y * 5) % 256 AS p
           FROM documents, unnest(range(8)) ux(x), unnest(range(8)) uy(y)
           WHERE doc_id < 200),
         m AS (SELECT id, avg(p) AS mean FROM px GROUP BY id),
         h AS (
           SELECT px.id,
             string_agg(CASE WHEN px.p > m.mean THEN '1' ELSE '0' END, ''
               ORDER BY px.y * 8 + px.x) AS phash
           FROM px JOIN m USING (id) GROUP BY px.id),
         reps AS (SELECT phash, min(id) AS group_rep FROM h GROUP BY phash)
         SELECT h.id, h.phash, reps.group_rep
         FROM h JOIN reps USING (phash)""",
    "mm5_wav_decode" ->
      """SELECT doc_id AS id,
           (8000 + (doc_id % 8) * 1000)::BIGINT AS sample_rate,
           1::BIGINT AS n_channels,
           (doc_id % 500 + 1)::BIGINT AS n_frames
         FROM documents WHERE doc_id < 200""",
    // closed-form replay of the synthesizeWav sample stream: v_i =
    // (i*257) % 65536 - 32768 — matches only if the real codec round-trips
    // every sample
    "mm9_audio_features" ->
      """WITH f AS (SELECT doc_id AS id, (doc_id % 500 + 1)::BIGINT AS n
                    FROM documents WHERE doc_id < 200),
         u AS (SELECT id, unnest(generate_series(0, (n - 1)::INT)) AS i FROM f),
         s AS (SELECT id, i, ((i * 257) % 65536 - 32768)::BIGINT AS v FROM u),
         w AS (SELECT id, i, v, lag(v) OVER (PARTITION BY id ORDER BY i) AS prev FROM s)
         SELECT id,
           max(abs(v))::BIGINT AS peak,
           round(sqrt(sum(v * v)::DOUBLE / count(*)), 6) AS rms,
           sum(CASE WHEN prev IS NOT NULL AND (v >= 0) != (prev >= 0)
                    THEN 1 ELSE 0 END)::BIGINT AS zcr
         FROM w GROUP BY id""",
    "mm6_gif_decode" ->
      """SELECT doc_id AS id,
           (doc_id % 32 + 1)::BIGINT AS width,
           (doc_id % 24 + 1)::BIGINT AS height,
           (doc_id % 5 + 1)::BIGINT AS n_frames
         FROM documents WHERE doc_id < 200""",
    "mm7_frame_walk" ->
      """SELECT doc_id AS id, i::BIGINT AS frame_idx,
           (doc_id % 32 + 1)::BIGINT AS width,
           (doc_id % 24 + 1)::BIGINT AS height,
           i::BIGINT AS rgb00
         FROM documents, unnest(range(doc_id % 5 + 1)) u(i)
         WHERE doc_id < 200"""
  )
}
