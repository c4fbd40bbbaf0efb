package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Stream-stream event-time interval join — the sixth streaming shape
  * (after windowed agg, ingest dedup, near-dup screen, HLL cardinality,
  * breadth state): attribute each click to every view by the SAME user
  * within the preceding attribution window. Both sides carry watermarks
  * and the join condition carries an event-time range, which is exactly
  * what lets Spark bound the state store: a buffered view is evicted once
  * the click-side watermark passes `viewTs + window`, so state holds one
  * attribution window of data per side, not the whole stream.
  *
  * Works identically on batch Datasets (unified semantics) — the q105
  * gate runs it to completion on MemoryStreams and hash-matches the
  * pure-batch DuckDB oracle.
  */
object StreamStreamJoin {

  final case class Click(clickTs: java.sql.Timestamp, clickUser: Long,
                         clickId: Long)
  final case class View(viewTs: java.sql.Timestamp, viewUser: Long,
                        viewId: Long)

  /** Clicks joined to same-user views with
    * `clickTs - window <= viewTs <= clickTs` (inclusive bounds, mirrored
    * by the oracle). `lateness` is the watermark delay on both sides —
    * with in-order arrival nothing is late and the join is exhaustive;
    * under disorder it trades completeness for bounded state, the
    * standard streaming contract. */
  def attributed(clicks: Dataset[Click], views: Dataset[View],
                 windowSec: Long, lateness: String): DataFrame = {
    val c = clicks.toDF().withWatermark("clickTs", lateness)
    val v = views.toDF().withWatermark("viewTs", lateness)
    c.join(v, expr(
      s"""clickUser = viewUser
         |AND viewTs <= clickTs
         |AND viewTs >= clickTs - INTERVAL $windowSec SECONDS""".stripMargin))
      .select(col("clickUser").as("user_id"),
        col("clickId").as("click_id"), col("viewId").as("view_id"),
        expr("(unix_micros(clickTs) - unix_micros(viewTs)) DIV 1000000")
          .as("lag_sec"))
  }

  /** LEFT OUTER variant: every click appears — attributed to its views,
    * or once with NULL view/lag when no same-user view fell in the
    * window. The outer semantics are WATERMARK-DRIVEN: an unmatched
    * click's null row can only be emitted once the watermark passes
    * `clickTs + window` (before that a matching view could still
    * arrive), so the state store evicts-and-emits instead of
    * evicts-and-drops. Same state bound as the inner form. */
  def attributedLeft(clicks: Dataset[Click], views: Dataset[View],
                     windowSec: Long, lateness: String): DataFrame = {
    val c = clicks.toDF().withWatermark("clickTs", lateness)
    val v = views.toDF().withWatermark("viewTs", lateness)
    c.join(v, expr(
      s"""clickUser = viewUser
         |AND viewTs <= clickTs
         |AND viewTs >= clickTs - INTERVAL $windowSec SECONDS""".stripMargin),
      "left_outer")
      .select(col("clickUser").as("user_id"),
        col("clickId").as("click_id"), col("viewId").as("view_id"),
        expr("(unix_micros(clickTs) - unix_micros(viewTs)) DIV 1000000")
          .as("lag_sec"))
  }
}
