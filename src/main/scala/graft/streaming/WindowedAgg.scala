package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Watermarked event-time windowed aggregation — the canonical Structured
  * Streaming shape (readStream → watermark → window → agg → writeStream)
  * for the engine's streaming ingest path: daily-bar feeds aggregate into
  * event-time buckets while the watermark bounds state and discards
  * late-beyond-tolerance rows.
  *
  * Complements [[BreadthStream]] (arbitrary per-key state): use windows +
  * watermarks when the aggregation is time-bucketed and associative; use
  * mapGroupsWithState only when state is genuinely custom (SURVEY §2.9).
  */
object WindowedAgg {

  final case class Event(ts: java.sql.Timestamp, userId: Long, value: Double)

  /** Tumbling event-time aggregation with a lateness watermark. Works for
    * both streaming and batch Datasets (same plan — Spark's unified
    * semantics — which is how the spec proves stream/batch equivalence). */
  def tumbling(events: Dataset[Event], windowLen: String,
               lateness: String): DataFrame =
    events.toDF()
      .withWatermark("ts", lateness)
      .groupBy(window(col("ts"), windowLen), col("userId"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(12,2)")).cast("double").as("total"))
      .select(col("window.start").as("win_start"), col("userId"),
        col("n_events"), col("total"))

  /** Session-window aggregation: per-key event-time sessions that close
    * after `gap` of inactivity — the streaming counterpart of the batch
    * session expansion (q28). `session_window` keeps per-key session
    * state, merges sessions that an event bridges, and emits a closed
    * session once the watermark passes its end; state is bounded by the
    * watermark exactly as in [[tumbling]]. */
  def sessions(events: Dataset[Event], gap: String,
               lateness: String): DataFrame =
    events.toDF()
      .withWatermark("ts", lateness)
      .groupBy(session_window(col("ts"), gap), col("userId"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(12,2)")).cast("double").as("total"))
      .select(col("session_window.start").as("sess_start"),
        col("session_window.end").as("sess_end"), col("userId"),
        col("n_events"), col("total"))
}
