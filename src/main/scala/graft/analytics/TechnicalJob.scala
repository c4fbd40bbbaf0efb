package graft.analytics

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Distributed driver for the recursive indicator kernels: one shuffle on
  * the entity key, then a per-key in-memory kernel run over a bounded
  * lookback — the honest Spark shape for state-carrying recurrences
  * (SURVEY §2.5 option (a) rejected: EMA/RSI/ATR are not frame-expressible).
  *
  * Mirrors the reference's own execution model (400-bar lookback per code,
  * `scripts/cron/refresh-technical.ts:33,260-282`). At 100 TB the lookback
  * bound keeps per-group state O(1); entity keys are high-cardinality so
  * the single shuffle balances; no driver-side collection anywhere.
  */
object TechnicalJob {

  final case class KeyedBar(key: Long, ord: Long, open: Double, high: Double,
                            low: Double, close: Double, volume: Double)

  final case class KeyedSnapshot(
      key: Long, n_bars: Int,
      close: Option[Double], sma_25: Option[Double], sma_75: Option[Double],
      sma_200: Option[Double], dev_25: Option[Double],
      above_sma200: Option[Boolean], cross_25_75: Option[String],
      cross_25_75_age: Option[Int], rsi_14: Option[Double],
      macd: Option[Double], macd_signal: Option[Double],
      macd_hist: Option[Double], stoch_k: Option[Double],
      stoch_d: Option[Double], bb_percent_b: Option[Double],
      bb_bandwidth: Option[Double], atr_14: Option[Double],
      atr_pct: Option[Double], vol_ratio_20: Option[Double],
      ichimoku_state: Option[String])

  /** Per-key latest snapshot from a (key, ord, o, h, l, c, v) frame. */
  def snapshots(bars: Dataset[KeyedBar], lookback: Int = 400): Dataset[KeyedSnapshot] = {
    import bars.sparkSession.implicits._
    bars.groupByKey(_.key).mapGroups { (k, it) =>
      val sorted = it.toArray.sortBy(_.ord).takeRight(lookback)
      val arr = sorted.map(b => Technical.Bar(b.open, b.high, b.low, b.close, b.volume))
      val s = Technical.snapshot(arr).get // group is non-empty by construction
      KeyedSnapshot(k, arr.length, s.close, s.sma25, s.sma75, s.sma200,
        s.dev25, s.aboveSma200, s.cross2575, s.cross2575Age, s.rsi14,
        s.macd, s.macdSignal, s.macdHist, s.stochK, s.stochD,
        s.bbPercentB, s.bbBandwidth, s.atr14, s.atrPct, s.volRatio20,
        s.ichimokuState)
    }
  }

  /** Synthesize daily OHLCV bars per user from the events stream (open =
    * first value of the day, close = last, high/low = extremes, volume =
    * event count) and run the kernel per user. Driver-testdata adapter for
    * the q31 rows-only check. */
  def fromEvents(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, dir)
    val wAsc = Window.partitionBy(col("user_id"), col("day"))
      .orderBy(col("ts"), col("event_id"))
    val wFull = wAsc.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val daily = ev.withColumn("day", to_date(col("ts")))
      .withColumn("rn", row_number().over(wAsc))
      .withColumn("open", first(col("value")).over(wFull))
      .withColumn("close", last(col("value")).over(wFull))
      .withColumn("high", max(col("value")).over(wFull))
      .withColumn("low", min(col("value")).over(wFull))
      .withColumn("volume", count(lit(1)).over(wFull).cast("double"))
      .filter(col("rn") === 1)
      .select(col("user_id").as("key"),
        datediff(col("day"), lit("2024-01-01")).cast("long").as("ord"),
        col("open"), col("high"), col("low"), col("close"), col("volume"))
    snapshots(daily.as[KeyedBar]).toDF()
      .orderBy(col("key"))
  }
}
