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
}
