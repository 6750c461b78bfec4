package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (builder-prompt north star): image/audio/video
  * as opaque binary columns with typed metadata, batch feature extraction
  * via mapPartitions.
  *
  * Decoders: images decode for real ([[ImageIoDecoder]], javax.imageio) and
  * so does WAV audio ([[WavDecoder]], javax.sound.sampled) — both pure-JVM
  * parsers. Video decode is STUBBED ([[StubDecoder]], deterministic fake
  * features from the bytes): no video codecs exist in this environment. The
  * Spark-side plumbing — schema, batched per-partition processing, feature
  * struct shape — is identical for all three; swapping in a real video
  * decoder changes one function.
  *
  * Scale posture: payloads stay opaque binary end-to-end (no driver
  * collect); extraction is per-partition with an explicit batch size so a
  * real decoder can amortize model/codec init per batch, exactly like a
  * Pandas-UDF `mapInPandas` would on the Python side.
  */
object Multimodal {

  /** A media row: payload + typed metadata. */
  case class MediaRecord(id: Long, kind: String, payload: Array[Byte])

  /** Extracted features (decoder output schema). */
  case class MediaFeatures(
      id: Long, kind: String, n_bytes: Long,
      width: Int, height: Int, n_frames: Int, digest: String)

  /** The decode seam: bytes -> features. Swap for a real codec binding.
    * Serializable: decoder instances ship inside the mapPartitions closure.
    */
  trait Decoder extends (MediaRecord => MediaFeatures) with Serializable

  /** STUB decoder — deterministic fake decode standing in for
    * image/audio/video codecs (not available in this container). Field
    * derivations are arbitrary but stable: real plumbing, fake pixels.
    */
  object StubDecoder extends Decoder {
    def apply(m: MediaRecord): MediaFeatures = {
      val n = m.payload.length.toLong
      val digest = java.security.MessageDigest.getInstance("SHA-256")
        .digest(m.payload).map("%02x".format(_)).mkString
      // "height" = first code point of the payload decoded as UTF-8 (NOT the
      // first raw byte: the DuckDB oracle's ascii() is code-point-based, and
      // the two diverge on multibyte text).
      // Decode only the first 4 bytes (a UTF-8 code point is at most 4) —
      // payloads model multi-MB media blobs; never decode the whole thing.
      val firstCp =
        if (n > 0) new String(m.payload, 0, math.min(4, m.payload.length),
          java.nio.charset.StandardCharsets.UTF_8).codePointAt(0)
        else 0
      MediaFeatures(
        id = m.id, kind = m.kind, n_bytes = n,
        width = (n % 1024).toInt,
        height = firstCp,
        n_frames = if (m.kind == "video") (n % 30).toInt + 1 else 1,
        digest = digest)
    }
  }

  /** REAL image decoder — pure-JVM `javax.imageio` (PNG/BMP/GIF readers ship
    * with the JDK, no native codecs needed). For image payloads ImageIO can
    * parse, width/height are the decoded pixel dimensions; anything else
    * falls back to [[StubDecoder]] so audio/video (whose codecs genuinely
    * aren't in this container) keep the documented stub semantics.
    */
  object ImageIoDecoder extends Decoder {
    def apply(m: MediaRecord): MediaFeatures =
      if (m.kind != "image") StubDecoder(m)
      else {
        // NonFatal, not just IOException: corrupt headers can surface as
        // IndexOutOfBounds/NegativeArraySize from the format readers, and a
        // bad blob must degrade to the stub, not kill the task.
        val img =
          try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(m.payload))
          catch { case scala.util.control.NonFatal(_) => null }
        if (img == null) StubDecoder(m)
        else StubDecoder(m).copy(width = img.getWidth, height = img.getHeight, n_frames = 1)
      }
  }

  /** REAL audio decoder — pure-JVM `javax.sound.sampled` (the WAV/AIFF/AU
    * file parsers ship with the JDK, no native codecs needed). For audio
    * payloads AudioSystem can parse, the feature fields carry the decoded
    * container facts: width = sample rate (Hz), height = channel count,
    * n_frames = PCM frame count. Images delegate to [[ImageIoDecoder]];
    * video (whose codecs genuinely aren't in this container) and
    * unparseable audio keep the documented stub semantics.
    */
  object WavDecoder extends Decoder {
    def apply(m: MediaRecord): MediaFeatures =
      if (m.kind == "image") ImageIoDecoder(m)
      else if (m.kind != "audio") StubDecoder(m)
      else {
        val parsed =
          try {
            val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
              new java.io.ByteArrayInputStream(m.payload))
            try Some((ais.getFormat.getSampleRate.toInt, ais.getFormat.getChannels,
              ais.getFrameLength.toInt))
            finally ais.close()
          } catch { case scala.util.control.NonFatal(_) => None }
        parsed match {
          case Some((rate, channels, frames)) =>
            StubDecoder(m).copy(width = rate, height = channels, n_frames = frames)
          case None => StubDecoder(m)
        }
      }
  }

  /** REAL video-container decoder — animated GIF through the JDK's own
    * imageio GIF plugin (moving pictures in a multi-frame container; no
    * native codecs needed). For payloads the GIF reader can parse, width/
    * height are frame 0's pixel dimensions and n_frames is the container's
    * actual frame count (`getNumImages(true)` walks every frame). Audio
    * delegates to [[WavDecoder]], images to [[ImageIoDecoder]]; anything
    * unparseable (including real-world mp4/webm, whose codecs aren't in
    * this container) degrades to the documented stub.
    */
  object GifVideoDecoder extends Decoder {
    def apply(m: MediaRecord): MediaFeatures =
      if (m.kind != "video") WavDecoder(m)
      else {
        val parsed =
          try {
            val ios = javax.imageio.ImageIO.createImageInputStream(
              new java.io.ByteArrayInputStream(m.payload))
            val readers = javax.imageio.ImageIO.getImageReaders(ios)
            if (!readers.hasNext) { ios.close(); None }
            else {
              val r = readers.next()
              try {
                r.setInput(ios)
                Some((r.getWidth(0), r.getHeight(0), r.getNumImages(true)))
              } finally { r.dispose(); ios.close() }
            }
          } catch { case scala.util.control.NonFatal(_) => None }
        parsed match {
          case Some((w, h, frames)) =>
            StubDecoder(m).copy(width = w, height = h, n_frames = frames)
          case None => StubDecoder(m)
        }
      }
  }

  /** A real animated-GIF payload: `nFrames` frames of the given dimensions
    * (frame f carries f in pixel (0,0)). Runs executor-side per row — the
    * write half of the codec round trip the mm6 oracle pins.
    */
  def synthesizeGif(width: Int, height: Int, nFrames: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(out)
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      var f = 0
      while (f < nFrames) {
        val img = new java.awt.image.BufferedImage(
          width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
        img.setRGB(0, 0, f)
        writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
        f += 1
      }
      writer.endWriteSequence()
    } finally { writer.dispose(); ios.close() }
    out.toByteArray
  }

  /** A real 16-bit mono PCM WAV payload with the given sample rate and frame
    * count (deterministic ramp samples). Runs executor-side per row — the
    * write half of the codec round trip the mm5 oracle pins.
    */
  def synthesizeWav(sampleRate: Int, nFrames: Int): Array[Byte] = {
    val fmt = new javax.sound.sampled.AudioFormat(sampleRate.toFloat, 16, 1, true, false)
    val data = new Array[Byte](nFrames * 2)
    var i = 0
    while (i < nFrames) {
      val v = (i * 257 % 65536 - 32768).toShort
      data(2 * i) = (v & 0xFF).toByte
      data(2 * i + 1) = ((v >> 8) & 0xFF).toByte
      i += 1
    }
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, nFrames.toLong)
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  /** Decode a WAV payload's FULL PCM content through the real javax.sound
    * codec: 16-bit signed little-endian mono samples as ints. The mm9 face
    * computes sample-level features from this, so its oracle (which replays
    * the synthesizeWav formula closed-form) only matches if the codec
    * round-trips every sample bit-exactly — a stronger proof than mm5's
    * header fields.
    */
  def wavSamples(payload: Array[Byte]): Array[Int] = {
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(payload))
    // The loop below interprets the raw stream as 16-bit LE mono PCM; any
    // other encoding (8-bit, big-endian, stereo, float) would silently
    // decode to garbage samples — fail loudly instead, since mm9's oracle
    // match depends on exact sample interpretation.
    val fmt = ais.getFormat
    require(fmt.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED &&
        fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1 && !fmt.isBigEndian,
      s"wavSamples expects 16-bit little-endian mono PCM_SIGNED, got $fmt")
    val bytes = ais.readAllBytes()
    val n = bytes.length / 2
    val out = new Array[Int](n)
    var i = 0
    while (i < n) {
      out(i) = ((bytes(2 * i) & 0xFF) | (bytes(2 * i + 1) << 8)).toShort.toInt
      i += 1
    }
    out
  }

  /** A real PNG payload with the given dimensions; pixel (0,0) carries
    * `rgb` (24-bit). Runs executor-side per row — the write half of the
    * codec round trip the mm4 oracle pins.
    */
  def synthesizePng(width: Int, height: Int, rgb: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, rgb)
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** 8x8 grayscale pattern PNG for the perceptual-hash dedup face (mm8):
    * pixel(x, y) = ((id % 16)·7 + x·3 + y·5) mod 256 on every channel.
    * Closed-form per (id % 16), so ids sharing the residue produce
    * byte-identical images — the planted duplicate groups — and the oracle
    * can replay the pixels (PNG is lossless) without ever decoding one.
    */
  def synthesizePatternPng(id: Long): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      8, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 8; x <- 0 until 8) {
      val g = (((id % 16) * 7 + x * 3 + y * 5) % 256).toInt
      img.setRGB(x, y, (g << 16) | (g << 8) | g)
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** 64-bit average-hash (aHash) of a decoded image's top-left 8x8 gray
    * block: bit (y·8 + x) set iff pixel > mean. THE standard cheap
    * perceptual fingerprint for image dedup — identical for re-encoded
    * copies, Hamming-close under small edits. Emitted as a 64-char '0'/'1'
    * string in bit order (bit 63 of a BIGINT overflows DuckDB's checked
    * shift, and the string groups/compares identically).
    */
  def averageHash(png: Array[Byte]): String = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
    val px = for (y <- 0 until 8; x <- 0 until 8)
      yield img.getRGB(x, y) & 0xFF
    val mean = px.sum.toDouble / 64.0
    px.map(p => if (p.toDouble > mean) '1' else '0').mkString
  }

  /** Batched per-partition feature extraction. `batchSize` groups records so
    * a real decoder initializes once per batch (grouped() is lazy — no
    * partition-wide materialization).
    */
  def extractFeatures(
      media: Dataset[MediaRecord],
      decoder: Decoder = StubDecoder,
      batchSize: Int = 64): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // Real decoders: init codec/model HERE, once per batch.
        batch.map(decoder)
      }
    }
  }

  /** Per-frame features from a frame walk. */
  case class FrameFeatures(
      id: Long, frame_idx: Int, width: Int, height: Int, rgb00: Int)

  /** Walk EVERY frame of each video payload and emit one row per frame —
    * the per-frame feature-extraction shape (thumbnail hashing, shot
    * detection, frame-level captioning input) through the same imageio
    * seam as [[GifVideoDecoder]]: frame index, decoded dimensions, and the
    * (0,0) pixel's 24-bit RGB as the stand-in "feature". Non-video and
    * unparseable payloads contribute no rows (the per-frame analog of the
    * stub fallback: a corrupt blob must not kill the task). The row
    * explosion happens executor-side inside flatMap — payload bytes never
    * move, only the metadata-sized frame rows do.
    */
  def walkFrames(media: Dataset[MediaRecord]): Dataset[FrameFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.flatMap { m =>
      if (m.kind != "video") Iterator.empty
      else
        try {
          val ios = javax.imageio.ImageIO.createImageInputStream(
            new java.io.ByteArrayInputStream(m.payload))
          val readers = javax.imageio.ImageIO.getImageReaders(ios)
          if (!readers.hasNext) { ios.close(); Iterator.empty }
          else {
            val r = readers.next()
            try {
              r.setInput(ios)
              // strict materialization: frames must be read before dispose
              (0 until r.getNumImages(true)).map { f =>
                val img = r.read(f)
                FrameFeatures(m.id, f, img.getWidth, img.getHeight,
                  img.getRGB(0, 0) & 0xFFFFFF)
              }
            } finally { r.dispose(); ios.close() }
          }
        } catch { case scala.util.control.NonFatal(_) => Iterator.empty }
    }
  }

  /** Fixture stand-in: wrap the documents table's text as binary payloads
    * (kind round-robins over media types by id).
    */
  def mediaFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("kind"),
      col("text").cast("binary").as("payload"))

  /** Frame sampling for video payloads: n evenly spaced pseudo-offsets.
    * With a real container parser the offsets become frame timestamps; the
    * sampling arithmetic and explode shape are the real thing.
    */
  def sampleFrameOffsets(media: DataFrame, n: Int): DataFrame =
    media.filter(col("kind") === "video")
      .select(col("id"),
        explode(transform(sequence(lit(0), lit(n - 1)),
          i => (i.cast("bigint") * octet_length(col("payload")).cast("bigint") / n)
            .cast("bigint"))).as("frame_offset"))
}
