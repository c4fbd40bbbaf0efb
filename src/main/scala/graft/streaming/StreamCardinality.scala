package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.functions.Text
import graft.operators.HllSketch

/** Streaming cardinality monitor: distinct-user estimates per event-time
  * window via the [[HllSketch]] Aggregator — the streaming face of q82.
  * This is why the sketch exists at all: a streaming `count_distinct` is
  * unsupported (distinct state is unbounded), but an HLL is an ordinary
  * ASSOCIATIVE aggregation whose per-group state is a fixed 1 KiB register
  * array, so it drops straight into a watermarked window `groupBy` and the
  * state store holds registers, not user ids.
  *
  * The emitted `s51` register digest is the same lossless state q82's
  * oracle gates, so batch/stream equivalence is checkable bit-exactly
  * (see StreamingSpec): one unified plan, identical registers either way. */
object StreamCardinality {

  final case class Event(ts: java.sql.Timestamp, userId: Long,
                         eventType: String)

  /** Watermarked tumbling-window distinct-user estimate per event type.
    * Works identically on streaming and batch Datasets (unified plan —
    * how the spec proves equivalence). */
  def windowedDistinct(events: Dataset[Event], windowLen: String,
                       lateness: String): DataFrame =
    events.toDF()
      .withWatermark("ts", lateness)
      .select(col("ts"), col("eventType"),
        Text.hash60(col("userId").cast("string")).as("__h60"))
      .groupBy(window(col("ts"), windowLen), col("eventType"))
      .agg(count(lit(1)).as("n_events"),
        HllSketch.hll60(col("__h60")).as("hll"))
      .select(col("window.start").as("win_start"), col("eventType"),
        col("n_events"),
        col("hll.hll_estimate").as("distinct_users_est"),
        col("hll.s51").as("s51"))
}
