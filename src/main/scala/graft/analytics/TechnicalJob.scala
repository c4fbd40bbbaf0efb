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

  /** Per-key latest snapshot from a (key, ord, o, h, l, c, v) frame.
    *
    * The group iterator is consumed through a bounded min-heap on
    * `(ord, arrival seq)` (capacity = lookback), so per-key task memory is
    * O(lookback) even for entities with decade-long histories — the
    * iterator streams from the shuffle, only the newest `lookback` bars are
    * ever retained. Ties on duplicate `ord` break deterministically on
    * arrival order (later-seen wins), matching a stable
    * sort-then-takeRight — but note duplicate ords within a key have no
    * meaningful kernel semantics (which bar is "the" bar for that day?);
    * callers such as [[fromEvents]] must supply unique ords per key. */
  def snapshots(bars: Dataset[KeyedBar], lookback: Int = 400): Dataset[KeyedSnapshot] = {
    import bars.sparkSession.implicits._
    bars.groupByKey(_.key).mapGroups { (k, it) =>
      // min-heap on (ord, seq): lexicographic, so equal-ord bars evict the
      // earlier-seen one — deterministic regardless of shuffle order only
      // when ords are unique (see scaladoc)
      val heap = scala.collection.mutable.PriorityQueue
        .empty[(Long, Long, KeyedBar)](
          Ordering.by((t: (Long, Long, KeyedBar)) => (-t._1, -t._2)))
      var seq = 0L
      it.foreach { b =>
        if (heap.size < lookback) heap.enqueue((b.ord, seq, b))
        else if (b.ord > heap.head._1 ||
                 (b.ord == heap.head._1 && seq > heap.head._2)) {
          heap.dequeue(); heap.enqueue((b.ord, seq, b))
        }
        seq += 1
      }
      val sorted = heap.dequeueAll.toArray
        .sortBy(t => (t._1, t._2)).map(_._3)
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
  def fromEvents(s: SparkSession, dir: String): DataFrame =
    fromEventsDf(Tables.events(s, dir))

  /** The same kernel over an explicit events relation — the
    * landed-table refresh mode (the composed pipeline points this at
    * the landing job's output). Must carry the testdata events column
    * names (user_id, ts, event_id, value). */
  def fromEventsDf(ev: DataFrame): DataFrame = {
    val s = ev.sparkSession
    import s.implicits._
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

  /** DuckDB oracle for q31: the recursive kernels (EMA/RSI/ATR/MACD-signal,
    * Wilder smoothing, running SMA accumulators, cross tracking) are replayed
    * as a recursive CTE that performs the exact same IEEE-754 operations in
    * the exact same order as [[Technical]] (technical.ts:75-410 contract);
    * frame-expressible parts (stochastic, Bollinger sq-sum, Ichimoku
    * midlines) use window functions / ordered-list folds with matching
    * accumulation order. Bit-exact vs the Spark output at sf0.001/sf0.01.
    */
  val oracleQ31: String =
    """WITH RECURSIVE daily AS (
      |  SELECT CAST(user_id AS BIGINT) AS key,
      |         CAST(ts AS DATE) AS day,
      |         CAST(last(value ORDER BY ts, event_id) AS DOUBLE) AS c,
      |         CAST(max(value) AS DOUBLE) AS h,
      |         CAST(min(value) AS DOUBLE) AS l,
      |         CAST(count(*) AS DOUBLE) AS v
      |  FROM events
      |  GROUP BY 1, 2
      |), trunc AS (
      |  SELECT * FROM (
      |    SELECT *, row_number() OVER (PARTITION BY key ORDER BY day DESC) AS rd
      |    FROM daily) t WHERE rd <= 400
      |), bars AS (
      |  SELECT key,
      |         CAST(row_number() OVER (PARTITION BY key ORDER BY day) AS INT) AS rn,
      |         CAST(count(*) OVER (PARTITION BY key) AS INT) AS n,
      |         h, l, c, v
      |  FROM trunc
      |), state AS (
      |  SELECT key, CAST(1 AS INT) AS i, c AS prev_c, v AS prev_v,
      |         c AS sum25, c AS sum75, c AS sum200, c AS sum20c, v AS sum20v,
      |         CAST(0.0 AS DOUBLE) AS gain_sum, CAST(0.0 AS DOUBLE) AS loss_sum,
      |         CAST(NULL AS DOUBLE) AS ag, CAST(NULL AS DOUBLE) AS al,
      |         c AS sum12, CAST(NULL AS DOUBLE) AS e12,
      |         c AS sum26, CAST(NULL AS DOUBLE) AS e26,
      |         CAST(0 AS INT) AS jsig, CAST(0.0 AS DOUBLE) AS sumsig, CAST(NULL AS DOUBLE) AS sig,
      |         CAST(0.0 AS DOUBLE) AS sumtr, CAST(NULL AS DOUBLE) AS atrv,
      |         CAST(0 AS INT) AS prev_sign, CAST(NULL AS INT) AS cross_idx,
      |         CAST(NULL AS VARCHAR) AS cross_type
      |  FROM bars WHERE rn = 1
      |  UNION ALL
      |  SELECT s.key, b.rn AS i, b.c AS prev_c, b.v AS prev_v,
      |    -- running add/subtract accumulators, same op order as the kernel
      |    (s.sum25 + b.c) - COALESCE(b25.c, 0.0) AS n_sum25,
      |    (s.sum75 + b.c) - COALESCE(b75.c, 0.0) AS n_sum75,
      |    (s.sum200 + b.c) - COALESCE(b200.c, 0.0) AS n_sum200,
      |    (s.sum20c + b.c) - COALESCE(b20.c, 0.0) AS n_sum20c,
      |    (s.sum20v + b.v) - COALESCE(b20.v, 0.0) AS n_sum20v,
      |    -- RSI seed sums over changes at rn 2..15
      |    CASE WHEN b.rn <= 15 AND (b.c - s.prev_c) >= 0
      |         THEN s.gain_sum + (b.c - s.prev_c) ELSE s.gain_sum END AS n_gain_sum,
      |    CASE WHEN b.rn <= 15 AND (b.c - s.prev_c) < 0
      |         THEN s.loss_sum - (b.c - s.prev_c) ELSE s.loss_sum END AS n_loss_sum,
      |    CASE WHEN b.rn = 15 THEN n_gain_sum / 14.0
      |         WHEN b.rn > 15 THEN (s.ag * 13.0 +
      |           (CASE WHEN (b.c - s.prev_c) > 0 THEN (b.c - s.prev_c) ELSE 0.0 END)) / 14.0
      |         END AS n_ag,
      |    CASE WHEN b.rn = 15 THEN n_loss_sum / 14.0
      |         WHEN b.rn > 15 THEN (s.al * 13.0 +
      |           (CASE WHEN (b.c - s.prev_c) < 0 THEN -(b.c - s.prev_c) ELSE 0.0 END)) / 14.0
      |         END AS n_al,
      |    -- EMA(12) / EMA(26), SMA-seeded
      |    CASE WHEN b.rn < 12 THEN s.sum12 + b.c ELSE s.sum12 END AS n_sum12,
      |    CASE WHEN b.rn = 12 THEN (s.sum12 + b.c) / 12.0
      |         WHEN b.rn > 12 THEN b.c * (2.0/13.0) + s.e12 * (1.0 - 2.0/13.0)
      |         END AS n_e12,
      |    CASE WHEN b.rn < 26 THEN s.sum26 + b.c ELSE s.sum26 END AS n_sum26,
      |    CASE WHEN b.rn = 26 THEN (s.sum26 + b.c) / 26.0
      |         WHEN b.rn > 26 THEN b.c * (2.0/27.0) + s.e26 * (1.0 - 2.0/27.0)
      |         END AS n_e26,
      |    -- MACD signal EMA(9) over the defined MACD slice (rn >= 26)
      |    CASE WHEN b.rn >= 26 THEN s.jsig + 1 ELSE s.jsig END AS n_jsig,
      |    CASE WHEN b.rn >= 26 AND n_jsig <= 9
      |         THEN s.sumsig + (n_e12 - n_e26) ELSE s.sumsig END AS n_sumsig,
      |    CASE WHEN n_jsig = 9 AND b.rn >= 26 THEN n_sumsig / 9.0
      |         WHEN n_jsig > 9 THEN (n_e12 - n_e26) * (2.0/10.0) + s.sig * (1.0 - 2.0/10.0)
      |         END AS n_sig,
      |    -- ATR(14), Wilder; TR defined from rn 2
      |    CASE WHEN b.rn <= 15 THEN s.sumtr +
      |      greatest(b.h - b.l, greatest(abs(b.h - s.prev_c), abs(b.l - s.prev_c)))
      |      ELSE s.sumtr END AS n_sumtr,
      |    CASE WHEN b.rn = 15 THEN n_sumtr / 14.0
      |         WHEN b.rn > 15 THEN (s.atrv * 13.0 +
      |           greatest(b.h - b.l, greatest(abs(b.h - s.prev_c), abs(b.l - s.prev_c)))) / 14.0
      |         END AS n_atrv,
      |    -- SMA25 x SMA75 cross tracking (anchor order: prev_sign, cross_idx, cross_type)
      |    CASE WHEN b.rn >= 75 AND (n_sum25 / 25.0 - n_sum75 / 75.0) != 0
      |         THEN (CASE WHEN (n_sum25 / 25.0 - n_sum75 / 75.0) > 0 THEN CAST(1 AS INT) ELSE CAST(-1 AS INT) END)
      |         ELSE s.prev_sign END AS n_prev_sign,
      |    CASE WHEN b.rn >= 75 AND (n_sum25 / 25.0 - n_sum75 / 75.0) != 0
      |              AND s.prev_sign != 0
      |              AND (CASE WHEN (n_sum25 / 25.0 - n_sum75 / 75.0) > 0 THEN 1 ELSE -1 END) != s.prev_sign
      |         THEN b.rn ELSE s.cross_idx END AS n_cross_idx,
      |    CASE WHEN b.rn >= 75 AND (n_sum25 / 25.0 - n_sum75 / 75.0) != 0
      |              AND s.prev_sign != 0
      |              AND (CASE WHEN (n_sum25 / 25.0 - n_sum75 / 75.0) > 0 THEN 1 ELSE -1 END) != s.prev_sign
      |         THEN (CASE WHEN (n_sum25 / 25.0 - n_sum75 / 75.0) > 0 THEN 'golden' ELSE 'dead' END)
      |         ELSE s.cross_type END AS n_cross_type
      |  FROM state s
      |  JOIN bars b ON b.key = s.key AND b.rn = s.i + 1
      |  LEFT JOIN bars b25 ON b25.key = s.key AND b25.rn = s.i + 1 - 25
      |  LEFT JOIN bars b75 ON b75.key = s.key AND b75.rn = s.i + 1 - 75
      |  LEFT JOIN bars b200 ON b200.key = s.key AND b200.rn = s.i + 1 - 200
      |  LEFT JOIN bars b20 ON b20.key = s.key AND b20.rn = s.i + 1 - 20
      |), fin AS (
      |  SELECT * FROM state
      |  QUALIFY row_number() OVER (PARTITION BY key ORDER BY i DESC) = 1
      |), w1 AS (
      |  SELECT key, rn, n, c,
      |    CASE WHEN rn >= 14 THEN max(h) OVER w14 END AS hh14,
      |    CASE WHEN rn >= 14 THEN min(l) OVER w14 END AS ll14,
      |    CASE WHEN rn >= 9 THEN (max(h) OVER w9 + min(l) OVER w9) / 2 END AS t9,
      |    CASE WHEN rn >= 26 THEN (max(h) OVER w26 + min(l) OVER w26) / 2 END AS k26,
      |    CASE WHEN rn >= 52 THEN (max(h) OVER w52 + min(l) OVER w52) / 2 END AS sb52
      |  FROM bars
      |  WINDOW
      |    w14 AS (PARTITION BY key ORDER BY rn ROWS BETWEEN 13 PRECEDING AND CURRENT ROW),
      |    w9  AS (PARTITION BY key ORDER BY rn ROWS BETWEEN 8 PRECEDING AND CURRENT ROW),
      |    w26 AS (PARTITION BY key ORDER BY rn ROWS BETWEEN 25 PRECEDING AND CURRENT ROW),
      |    w52 AS (PARTITION BY key ORDER BY rn ROWS BETWEEN 51 PRECEDING AND CURRENT ROW)
      |), w2 AS (
      |  SELECT *, CASE WHEN hh14 IS NOT NULL AND hh14 != ll14
      |                 THEN (c - ll14) / (hh14 - ll14) * 100 END AS rawk
      |  FROM w1
      |), w3 AS (
      |  SELECT *, (lag(rawk, 2) OVER wk3 + lag(rawk, 1) OVER wk3 + rawk) / 3.0 AS kst
      |  FROM w2 WINDOW wk3 AS (PARTITION BY key ORDER BY rn)
      |), w4 AS (
      |  SELECT *, (lag(kst, 2) OVER wk4 + lag(kst, 1) OVER wk4 + kst) / 3.0 AS dst
      |  FROM w3 WINDOW wk4 AS (PARTITION BY key ORDER BY rn)
      |), stc AS (
      |  SELECT key, kst, dst FROM w4 WHERE rn = n
      |), ich AS (
      |  SELECT key,
      |    CASE WHEN t9 IS NOT NULL AND k26 IS NOT NULL THEN (t9 + k26) / 2 END AS sa,
      |    sb52 AS sb
      |  FROM w1 WHERE rn = n - 26
      |), l20 AS (
      |  SELECT key, list(c ORDER BY rn) AS cs
      |  FROM bars WHERE rn > n - 20
      |  GROUP BY key HAVING count(*) = 20
      |)
      |SELECT
      |  f.key,
      |  f.i AS n_bars,
      |  floor(f.prev_c * 100.0 + 0.5) / 100.0 AS close,
      |  CASE WHEN f.i >= 25 THEN floor(f.sum25 / 25.0 * 10000.0 + 0.5) / 10000.0 END AS sma_25,
      |  CASE WHEN f.i >= 75 THEN floor(f.sum75 / 75.0 * 10000.0 + 0.5) / 10000.0 END AS sma_75,
      |  CASE WHEN f.i >= 200 THEN floor(f.sum200 / 200.0 * 10000.0 + 0.5) / 10000.0 END AS sma_200,
      |  CASE WHEN f.i >= 25 AND f.sum25 / 25.0 != 0
      |       THEN floor((f.prev_c - f.sum25 / 25.0) / (f.sum25 / 25.0) * 100 * 100.0 + 0.5) / 100.0
      |       END AS dev_25,
      |  CASE WHEN f.i >= 200 THEN f.prev_c > f.sum200 / 200.0 END AS above_sma200,
      |  f.cross_type AS cross_25_75,
      |  CASE WHEN f.cross_idx IS NOT NULL THEN f.i - f.cross_idx END AS cross_25_75_age,
      |  CASE WHEN f.al IS NOT NULL THEN
      |    floor((CASE WHEN f.al = 0 THEN (CASE WHEN f.ag = 0 THEN 50.0 ELSE 100.0 END)
      |                WHEN f.ag = 0 THEN 0.0
      |                ELSE 100.0 - 100.0 / (1.0 + f.ag / f.al) END) * 100.0 + 0.5) / 100.0
      |    END AS rsi_14,
      |  CASE WHEN f.e26 IS NOT NULL
      |       THEN floor((f.e12 - f.e26) * 10000.0 + 0.5) / 10000.0 END AS macd,
      |  CASE WHEN f.sig IS NOT NULL
      |       THEN floor(f.sig * 10000.0 + 0.5) / 10000.0 END AS macd_signal,
      |  CASE WHEN f.sig IS NOT NULL
      |       THEN floor(((f.e12 - f.e26) - f.sig) * 10000.0 + 0.5) / 10000.0 END AS macd_hist,
      |  floor(stc.kst * 100.0 + 0.5) / 100.0 AS stoch_k,
      |  floor(stc.dst * 100.0 + 0.5) / 100.0 AS stoch_d,
      |  CASE WHEN f.i >= 20 AND (f.sum20c / 20.0 + 2.0 * sqrt(
      |         list_reduce(list_transform(l20.cs, x -> (x - f.sum20c / 20.0) * (x - f.sum20c / 20.0)),
      |                     (a, b) -> a + b) / 20.0))
      |       != (f.sum20c / 20.0 - 2.0 * sqrt(
      |         list_reduce(list_transform(l20.cs, x -> (x - f.sum20c / 20.0) * (x - f.sum20c / 20.0)),
      |                     (a, b) -> a + b) / 20.0))
      |       THEN floor((f.prev_c - (f.sum20c / 20.0 - 2.0 * sqrt(
      |         list_reduce(list_transform(l20.cs, x -> (x - f.sum20c / 20.0) * (x - f.sum20c / 20.0)),
      |                     (a, b) -> a + b) / 20.0)))
      |         / ((f.sum20c / 20.0 + 2.0 * sqrt(
      |         list_reduce(list_transform(l20.cs, x -> (x - f.sum20c / 20.0) * (x - f.sum20c / 20.0)),
      |                     (a, b) -> a + b) / 20.0))
      |         - (f.sum20c / 20.0 - 2.0 * sqrt(
      |         list_reduce(list_transform(l20.cs, x -> (x - f.sum20c / 20.0) * (x - f.sum20c / 20.0)),
      |                     (a, b) -> a + b) / 20.0))) * 10000.0 + 0.5) / 10000.0
      |       END AS bb_percent_b,
      |  CASE WHEN f.i >= 20 AND f.sum20c / 20.0 != 0
      |       THEN floor(((f.sum20c / 20.0 + 2.0 * sqrt(
      |         list_reduce(list_transform(l20.cs, x -> (x - f.sum20c / 20.0) * (x - f.sum20c / 20.0)),
      |                     (a, b) -> a + b) / 20.0))
      |         - (f.sum20c / 20.0 - 2.0 * sqrt(
      |         list_reduce(list_transform(l20.cs, x -> (x - f.sum20c / 20.0) * (x - f.sum20c / 20.0)),
      |                     (a, b) -> a + b) / 20.0)))
      |         / (f.sum20c / 20.0) * 10000.0 + 0.5) / 10000.0
      |       END AS bb_bandwidth,
      |  CASE WHEN f.atrv IS NOT NULL
      |       THEN floor(f.atrv * 10000.0 + 0.5) / 10000.0 END AS atr_14,
      |  CASE WHEN f.atrv IS NOT NULL AND f.prev_c != 0
      |       THEN floor(f.atrv / f.prev_c * 100 * 100.0 + 0.5) / 100.0 END AS atr_pct,
      |  CASE WHEN f.i >= 20 AND f.sum20v / 20.0 != 0
      |       THEN floor(f.prev_v / (f.sum20v / 20.0) * 1000.0 + 0.5) / 1000.0 END AS vol_ratio_20,
      |  CASE WHEN ich.sa IS NOT NULL AND ich.sb IS NOT NULL THEN
      |    (CASE WHEN f.prev_c > greatest(ich.sa, ich.sb) THEN 'above'
      |          WHEN f.prev_c < least(ich.sa, ich.sb) THEN 'below'
      |          ELSE 'inside' END) END AS ichimoku_state
      |FROM fin f
      |LEFT JOIN stc ON stc.key = f.key
      |LEFT JOIN ich ON ich.key = f.key
      |LEFT JOIN l20 ON l20.key = f.key
      |ORDER BY f.key
      |""".stripMargin.trim
}
