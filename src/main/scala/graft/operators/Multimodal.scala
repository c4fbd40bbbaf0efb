package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling for the training-data pipeline: media
  * payloads are opaque `binary` columns with typed metadata; decode /
  * feature-extraction runs as a typed `mapPartitions` over batches (the
  * JVM analog of an Arrow-batched decode UDF).
  *
  * The actual byte decode is a STUB — this container has no image/audio
  * codecs — replaced by a deterministic feature synthesizer over the raw
  * bytes ([[stubDecode]]). Everything around it is the real distributed
  * plumbing: schema, binary payload column, per-partition batched
  * iteration, typed output. Swap [[stubDecode]]'s body for a codec call
  * (e.g. TwelveMonkeys/JavaCV) to productionize; the plan shape does not
  * change.
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
