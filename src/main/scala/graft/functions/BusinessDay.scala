package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Business-day navigation against a trading-calendar table
  * (`src/lib/utils/business-day.ts:19-216`) — kept as table operations
  * (joins against the calendar), never scalar UDFs: the calendar is tiny
  * and broadcasts, so navigation is a map-side lookup at any scale.
  *
  * Calendar schema: `calendar_date date, is_business_day boolean`
  * (00003:5-15).
  */
object BusinessDay {

  /** Index business days 1..N in date order (the navigation backbone). */
  def indexed(calendar: DataFrame): DataFrame =
    calendar.filter(col("is_business_day"))
      .withColumn("bd_idx",
        row_number().over(Window.orderBy(col("calendar_date"))))
      .select(col("calendar_date"), col("bd_idx"))

  /** For each row of `df`, the next business day strictly after `dateCol`
    * (null when the calendar runs out). */
  def next(df: DataFrame, dateCol: String, calendar: DataFrame): DataFrame = {
    val cal = indexed(calendar)
    val asOf = df.join(broadcast(cal.select(
        col("calendar_date").as("__cd"), col("bd_idx").as("__i"))),
      col("__cd") > col(dateCol), "left")
      .groupBy(df.columns.map(col): _*)
      .agg(min(col("__cd")).as("next_business_day"))
    asOf
  }

  /** Shift each row's `dateCol` by `n` business days (n may be negative).
    * Dates not on the calendar resolve via the previous business day's
    * index, matching the reference's snap-then-shift behavior. */
  def addBusinessDays(df: DataFrame, dateCol: String, calendar: DataFrame,
                      n: Int): DataFrame = {
    val cal = indexed(calendar)
    // snap: index of the latest business day <= dateCol
    val snapped = df.join(broadcast(cal.select(
        col("calendar_date").as("__cd"), col("bd_idx").as("__i"))),
      col("__cd") <= col(dateCol), "left")
      .groupBy(df.columns.map(col): _*)
      .agg(max(col("__i")).as("__idx"))
    snapped.join(broadcast(cal.select(col("bd_idx"),
        col("calendar_date").as("shifted_day"))),
        col("bd_idx") === col("__idx") + n, "left")
      .drop("__idx", "bd_idx")
  }
}
