package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.functions.Text

/** Streaming exact dedup at ingest — the streaming counterpart of the
  * batch fingerprint dedup (q09): documents arrive on a stream, each gets
  * the canonical content fingerprint (normalize → md5, [[Text.fingerprint]]),
  * and `dropDuplicatesWithinWatermark` keeps the first occurrence per
  * fingerprint while the event-time watermark bounds the dedup state —
  * without it, streaming dedup state grows forever, the classic unbounded-
  * state failure of ingest dedup at 100 TB.
  *
  * `dropDuplicatesWithinWatermark` (not plain `dropDuplicates`) is the
  * load-bearing choice: exact global dedup needs unbounded state; within-
  * watermark dedup is the honest streaming contract — duplicates farther
  * apart than the lateness bound are handled by the periodic batch dedup
  * (q09), the standard lambda split for training-data pipelines.
  */
object StreamDedup {

  final case class Doc(ts: java.sql.Timestamp, docId: Long, text: String)

  /** Fingerprint + first-per-fingerprint within the watermark. On a batch
    * Dataset the same operator degrades to a plain fingerprint
    * `dropDuplicates` (`dropDuplicatesWithinWatermark` is streaming-only),
    * which is exactly the batch q09 semantic — the spec proves the two
    * paths agree on in-order data. */
  def dedup(docs: Dataset[Doc], lateness: String): DataFrame = {
    val fp = docs.toDF().withColumn("fp", Text.fingerprint(col("text")))
    if (docs.isStreaming)
      fp.withWatermark("ts", lateness).dropDuplicatesWithinWatermark("fp")
    else fp.dropDuplicates("fp")
  }
}
