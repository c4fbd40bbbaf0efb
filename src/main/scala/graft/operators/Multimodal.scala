package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling for the training-data pipeline: media
  * payloads are opaque `binary` columns with typed metadata; decode /
  * feature-extraction runs as a typed `mapPartitions` over batches (the
  * JVM analog of an Arrow-batched decode UDF).
  *
  * Two decode paths coexist:
  *  - [[stubDecode]] — the declared stand-in for codecs this container
  *    lacks (JPEG/H.264/...), kept so q35/q51 gate the metadata plumbing
  *    unchanged. Swap its body for a codec call (e.g.
  *    TwelveMonkeys/JavaCV) to productionize; the plan shape is final.
  *  - [[decodeBmp]] / [[decodeWav]] — REAL pure-JVM codecs for the two
  *    formats that need no native library: uncompressed 24-bit BMP
  *    (little-endian header walk, bottom-up padded pixel rows) and PCM16
  *    RIFF/WAVE (chunk-list walk, fmt/data parse). Gated end-to-end by
  *    q78 against a closed-form oracle: the encoder synthesizes payload
  *    bytes whose decoded statistics DuckDB can derive arithmetically, so
  *    a wrong header offset, a mishandled row pad, or an unskipped chunk
  *    breaks the hash match.
  *
  * Scale notes: payload bytes never pass through a shuffle here — features
  * are extracted map-side and only the slim metadata rows move on. That is
  * the pattern that matters at 100 TB of media: project early, shuffle
  * features, never bytes.
  */
object Multimodal {

  final case class MediaRow(doc_id: Long, media_type: String,
                            payload: Array[Byte])
  final case class MediaFeatures(doc_id: Long, media_type: String,
                                 n_bytes: Long, width: Int, height: Int,
                                 n_frames: Int, checksum: Long)

  /** Attach a synthetic binary payload to the documents table (stand-in
    * for real image/audio bytes; deterministic: UTF-8 of the text). */
  def attachPayloads(docs: DataFrame): Dataset[MediaRow] = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id"),
        when(col("doc_id") % 3 === 0, lit("image"))
          .when(col("doc_id") % 3 === 1, lit("audio"))
          .otherwise(lit("video")).as("media_type"),
        col("text").cast("binary").as("payload"))
      .as[MediaRow]
  }

  /** STUB decode: deterministic pseudo-features from the payload bytes.
    * A real implementation would decode the codec here; the signature,
    * batching, and output schema are the production shape. */
  def stubDecode(r: MediaRow): MediaFeatures = {
    val n = r.payload.length.toLong
    // byte-sum checksum — forces a real scan of the payload bytes, the
    // same access pattern a codec would have
    var sum = 0L
    var i = 0
    while (i < r.payload.length) { sum += r.payload(i) & 0xff; i += 1 }
    MediaFeatures(r.doc_id, r.media_type, n,
      width = (64 + n % 1024).toInt,
      height = (64 + (n * 7) % 768).toInt,
      n_frames = (1 + n % 30).toInt,
      checksum = sum)
  }

  /** Distributed feature extraction: mapPartitions over payload batches. */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map(stubDecode))
  }

  /** End-to-end: documents → payloads → features (driver-testdata shape). */
  def features(s: SparkSession, dir: String): DataFrame =
    extractFeatures(attachPayloads(graft.Tables.documents(s, dir)))
      .toDF()
      .orderBy(col("doc_id"))

  // ------------------------------------------------------------------
  // Real pure-JVM codecs (BMP / WAV) + the q78 decode-stats pipeline
  // ------------------------------------------------------------------

  import java.nio.{ByteBuffer, ByteOrder}

  final case class MediaBytes(doc_id: Long, media_type: String,
                              payload: Array[Byte])
  final case class MediaDecodeRow(doc_id: Long, media_type: String,
                                  n_bytes: Long, width: Option[Int],
                                  height: Option[Int],
                                  sample_rate: Option[Int],
                                  n_samples: Option[Long],
                                  content_sum: Long, corner_sum: Option[Long])

  /** Encode an uncompressed bottom-up 24-bit BMP. `pixels` is the logical
    * TOP-DOWN pixel byte stream (w·h·3 BGR bytes); the writer emits rows
    * bottom-up with each file row padded to a 4-byte boundary, per the
    * format. A real (if minimal) encoder — the output opens in any image
    * viewer. */
  def encodeBmp24(width: Int, height: Int, pixels: Array[Byte]): Array[Byte] = {
    require(pixels.length == width * height * 3, "pixel buffer size mismatch")
    val rowSize = ((width * 3 + 3) / 4) * 4
    val dataSize = rowSize * height
    val fileSize = 54 + dataSize
    val bb = ByteBuffer.allocate(fileSize).order(ByteOrder.LITTLE_ENDIAN)
    bb.put('B'.toByte).put('M'.toByte)
    bb.putInt(fileSize).putInt(0).putInt(54) // reserved, pixel-data offset
    bb.putInt(40).putInt(width).putInt(height) // BITMAPINFOHEADER
    bb.putShort(1).putShort(24) // planes, bpp
    bb.putInt(0).putInt(dataSize) // BI_RGB (uncompressed), image size
    bb.putInt(2835).putInt(2835).putInt(0).putInt(0) // 72 DPI, palette
    val pad = new Array[Byte](rowSize - width * 3)
    for (r <- (height - 1) to 0 by -1) { // bottom-up row order
      bb.put(pixels, r * width * 3, width * 3)
      bb.put(pad)
    }
    bb.array()
  }

  /** Decode an uncompressed 24-bit BMP: validate the `BM` magic, read the
    * little-endian header fields, then walk the padded bottom-up pixel
    * rows. Returns (width, height, content_sum = unsigned sum of all
    * pixel bytes EXCLUDING row padding, corner_sum = the 3 bytes of the
    * logical top-left pixel — which live at the START of the LAST file
    * row, so a decoder that ignores the bottom-up layout gets it
    * wrong). */
  def decodeBmp(bytes: Array[Byte]): (Int, Int, Long, Long) = {
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    require(bytes(0) == 'B' && bytes(1) == 'M', "not a BMP")
    val dataOffset = bb.getInt(10)
    val width = bb.getInt(18)
    val height = bb.getInt(22)
    val bpp = bb.getShort(28)
    val compression = bb.getInt(30)
    require(bpp == 24 && compression == 0,
      s"only uncompressed 24-bit BMP supported (bpp=$bpp, comp=$compression)")
    val rowSize = ((width * 3 + 3) / 4) * 4
    var sum = 0L
    var r = 0
    while (r < height) {
      val rowStart = dataOffset + r * rowSize
      var c = 0
      while (c < width * 3) { sum += bytes(rowStart + c) & 0xff; c += 1 }
      r += 1
    }
    // logical top-left pixel = first pixel of the LAST row in file order
    val tl = dataOffset + (height - 1) * rowSize
    val corner = (bytes(tl) & 0xff).toLong + (bytes(tl + 1) & 0xff) +
      (bytes(tl + 2) & 0xff)
    (width, height, sum, corner)
  }

  /** Encode a PCM16 mono RIFF/WAVE file; with `junkChunk` set, a 4-byte
    * `JUNK` chunk is inserted between `fmt ` and `data` (valid per the
    * RIFF spec — decoders must walk chunks, not assume the canonical
    * 44-byte layout). */
  def encodeWavPcm16(sampleRate: Int, samples: Array[Short],
                     junkChunk: Boolean): Array[Byte] = {
    val dataSize = samples.length * 2
    val extra = if (junkChunk) 12 else 0
    val riffSize = 36 + extra + dataSize
    val bb = ByteBuffer.allocate(8 + riffSize).order(ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("ASCII")).putInt(riffSize)
      .put("WAVE".getBytes("ASCII"))
    bb.put("fmt ".getBytes("ASCII")).putInt(16)
    bb.putShort(1).putShort(1) // PCM, mono
    bb.putInt(sampleRate).putInt(sampleRate * 2) // byte rate
    bb.putShort(2).putShort(16) // block align, bits per sample
    if (junkChunk)
      bb.put("JUNK".getBytes("ASCII")).putInt(4).putInt(0)
    bb.put("data".getBytes("ASCII")).putInt(dataSize)
    samples.foreach(bb.putShort)
    bb.array()
  }

  /** Decode a PCM16 RIFF/WAVE file by walking the chunk list (skipping
    * unknown chunks such as `JUNK`/`LIST`, honoring odd-size padding) —
    * returns (sample_rate, n_samples, sample_sum). */
  def decodeWav(bytes: Array[Byte]): (Int, Long, Long) = {
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    def fourCC(off: Int) = new String(bytes, off, 4, "ASCII")
    require(fourCC(0) == "RIFF" && fourCC(8) == "WAVE", "not a WAVE file")
    var pos = 12
    var sampleRate = -1
    var bits = -1
    var channels = -1
    var nSamples = 0L
    var sum = 0L
    var sawData = false
    while (pos + 8 <= bytes.length) {
      val id = fourCC(pos)
      val size = bb.getInt(pos + 4)
      id match {
        case "fmt " =>
          require(bb.getShort(pos + 8) == 1, "only PCM supported")
          channels = bb.getShort(pos + 10)
          sampleRate = bb.getInt(pos + 12)
          bits = bb.getShort(pos + 22)
        case "data" =>
          require(bits == 16 && channels == 1,
            s"only PCM16 mono supported (bits=$bits, ch=$channels)")
          nSamples = size / 2L
          var i = 0
          while (i < nSamples) { sum += bb.getShort(pos + 8 + i * 2); i += 1 }
          sawData = true
        case _ => // JUNK/LIST/...: skip
      }
      pos += 8 + size + (size & 1) // chunks are word-aligned
    }
    require(sawData, "no data chunk")
    (sampleRate, nSamples, sum)
  }

  /** Deterministic media synthesis for the q78 gate: even doc_ids get a
    * real BMP (w = 4 + id%13, h = 3 + id%7, pixel byte i = (id·7+i)%256),
    * odd ones a real WAV (rate = 8000 + (id%5)·1000, n = 50 + id%100,
    * sample i = (id·31+i·17)%65536 − 32768; every id%4==1 doc also gets a
    * JUNK chunk). Everything is integer arithmetic on doc_id, so DuckDB
    * derives the expected DECODED statistics without parsing a byte —
    * the oracle checks the encode→decode roundtrip arithmetically. */
  def synthMedia(docs: DataFrame): Dataset[MediaBytes] = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id")).as[Long].map { id =>
      if (id % 2 == 0) {
        val w = (4 + id % 13).toInt
        val h = (3 + id % 7).toInt
        val px = Array.tabulate(w * h * 3)(i => ((id * 7 + i) % 256).toByte)
        MediaBytes(id, "bmp", encodeBmp24(w, h, px))
      } else {
        val n = (50 + id % 100).toInt
        val sr = (8000 + (id % 5) * 1000).toInt
        val ss = Array.tabulate(n)(i =>
          ((id * 31 + i.toLong * 17) % 65536 - 32768).toShort)
        MediaBytes(id, "wav", encodeWavPcm16(sr, ss, junkChunk = id % 4 == 1))
      }
    }
  }

  /** q78: synthesize real BMP/WAV payloads, decode them with the REAL
    * codecs, report per-doc decode statistics. Encode+decode are one
    * map-side pass per document — bytes never shuffle; only the slim
    * stats rows move. */
  def decodeStats(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    synthMedia(graft.Tables.documents(s, dir)).map { m =>
      if (m.media_type == "bmp") {
        val (w, h, sum, corner) = decodeBmp(m.payload)
        MediaDecodeRow(m.doc_id, "bmp", m.payload.length.toLong,
          Some(w), Some(h), None, None, sum, Some(corner))
      } else {
        val (sr, n, sum) = decodeWav(m.payload)
        MediaDecodeRow(m.doc_id, "wav", m.payload.length.toLong,
          None, None, Some(sr), Some(n), sum, None)
      }
    }.toDF()
      .orderBy(col("doc_id"))
  }

  /** Frame sampling + resize planning over video features — the remaining
    * multimodal pipeline stages, expressed as declarative generators (no
    * UDF): one output row per every-`everyN`-th frame via
    * `explode(sequence(...))`, with fit-into-`target`² letterbox dims
    * (scale = min(target/w, target/h), floor) and a deterministic per-frame
    * checksum derived from the stub decode. The frame-bytes extraction
    * itself would live in [[stubDecode]]'s codec slot; the row explosion,
    * dims math, and downstream schema are the production shape — frames
    * multiply ROWS map-side, bytes still never shuffle. */
  def sampleFrames(feats: DataFrame, everyN: Int, target: Int): DataFrame = {
    val scale = least(lit(target.toDouble) / col("width"),
      lit(target.toDouble) / col("height"))
    feats.filter(col("media_type") === "video")
      .select(col("doc_id"), col("n_frames"), col("width"), col("height"),
        col("checksum"),
        explode(sequence(lit(0), col("n_frames") - 1, lit(everyN)))
          .as("frame_idx"))
      .select(col("doc_id"), col("frame_idx"),
        floor(col("width") * scale).cast("int").as("out_w"),
        floor(col("height") * scale).cast("int").as("out_h"),
        ((col("checksum") * 31 + col("frame_idx")) % 1000000007L)
          .as("frame_checksum"))
  }
}
