package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Full market-breadth parity (market-breadth.ts:1-310) — the reference's
  * single most user-visible derived table, re-expressed as one declarative
  * pass instead of the reference's streaming `BreadthAccumulator`:
  *
  *   - advancers/decliners/unchanged vs the previous *available* bar
  *     (state carries across gaps; first bar of a code never counts)
  *   - new highs/lows under the Nikkei year-inclusion rule
  *     (market-breadth.ts:115-119,165-174): the base period is the current
  *     year *excluding today*; in Jan–Mar the previous year is included —
  *     but only if the code actually traded in `year - 1`
  *     (`rolledState`, :215-243: a 2+ year gap empties the base period)
  *   - %-above-SMA25/200 with the count guard (:148-198): the denominator
  *     is codes whose close-ring-buffer holds ≥ window entries (ring caps
  *     at 200, so both windows read "last N bars"); a day with zero
  *     eligible codes is null, not 0%
  *   - the 25-day advancers/decliners ratio with the all-25-present null
  *     rule (`computeAdvDecRatio25`, :283-299) and the decSum=0 guard
  *   - turnover sum + prime bar count (coverage gate input, :155-156)
  *
  * Universe discipline matches the reference: per-code state (prev close,
  * year buckets, SMA buffer) is maintained over ALL codes, the counts are
  * filtered to the prime universe (:127-131, here: suppliers with
  * s_nationkey < 20, broadcast-joined).
  *
  * Scale shape: everything per-code is windows over one hash partitioning
  * on the code key (the year-bucket aggregate reuses it — ClusteredDistribution
  * on (key, year) is satisfied by hash(key)); the only other exchange is the
  * final per-day rollup, whose output is bounded by the trading calendar, so
  * the unpartitioned ratio window over it is safe at any input scale.
  *
  * Numeric parity: SMA and turnover sums go through DECIMAL(12,2) (exact,
  * order-free — computeSma's double loop is replaced by an exact sum on
  * both engines); percentage/ratio math is identical IEEE double ops;
  * rounding is floor(x·10^d+0.5)/10^d on both sides (reference uses
  * toFixed — same value except on sub-ulp decimal ties).
  */
object Breadth {

  private val D2 = "decimal(12,2)"

  def q42MarketBreadth(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    val sup = Tables.supplier(s, dir)

    // Daily per-code bars: close = last print of the day (deterministic
    // order), high/low = extremes, turnover = exact decimal sum.
    // extendedprice DESC final key: duplicate (orderkey, linenumber) rows
    // exist in the synthetic lineitem — without it the close pick is not a
    // total order and engines may disagree
    val wDay = Window.partitionBy(col("key"), col("day"))
      .orderBy(col("l_orderkey").desc, col("l_linenumber").desc,
        col("l_extendedprice").desc)
    val bars = li
      .select(col("l_suppkey").as("key"), to_date(col("l_shipdate")).as("day"),
        col("l_extendedprice"), col("l_orderkey"), col("l_linenumber"))
      .withColumn("rn_day", row_number().over(wDay))
      .groupBy(col("key"), col("day"))
      .agg(
        max(when(col("rn_day") === 1, col("l_extendedprice"))).as("close"),
        max(col("l_extendedprice")).as("high"),
        min(col("l_extendedprice")).as("low"),
        sum(col("l_extendedprice").cast(D2)).as("turn"))

    val wKey = Window.partitionBy(col("key")).orderBy(col("day"))
    val wYtd = Window.partitionBy(col("key"), col("yr")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val w25 = wKey.rowsBetween(-24, 0)
    val w200 = wKey.rowsBetween(-199, 0)

    // Previous-year high/low buckets; joined back only when that bucket is
    // exactly year-1 (the rolledState 2+year-gap rule).
    val yearly = bars.groupBy(col("key"), year(col("day")).as("yr"))
      .agg(max(col("high")).as("ymax"), min(col("low")).as("ymin"))
    val wYr = Window.partitionBy(col("key")).orderBy(col("yr"))
    val prevYear = yearly.select(col("key"), col("yr"),
      when(lag(col("yr"), 1).over(wYr) === col("yr") - 1,
        lag(col("ymax"), 1).over(wYr)).as("prev_ymax"),
      when(lag(col("yr"), 1).over(wYr) === col("yr") - 1,
        lag(col("ymin"), 1).over(wYr)).as("prev_ymin"))

    val enriched = bars
      .withColumn("yr", year(col("day")))
      .withColumn("rn", row_number().over(wKey))
      .withColumn("prev_close", lag(col("close"), 1).over(wKey))
      .withColumn("cur_max", max(col("high")).over(wYtd))
      .withColumn("cur_min", min(col("low")).over(wYtd))
      .withColumn("sma25",
        when(col("rn") >= 25, sum(col("close").cast(D2)).over(w25).cast("double") / 25.0))
      .withColumn("sma200",
        when(col("rn") >= 200, sum(col("close").cast(D2)).over(w200).cast("double") / 200.0))
      .join(prevYear, Seq("key", "yr"), "left")
      .withColumn("base_max", greatest(col("cur_max"),
        when(month(col("day")) <= 3, col("prev_ymax"))))
      .withColumn("base_min", least(col("cur_min"),
        when(month(col("day")) <= 3, col("prev_ymin"))))
      .join(broadcast(sup.select(col("s_suppkey").as("key"),
        (col("s_nationkey") < 20).as("is_prime"))), Seq("key"), "left")

    val daily = enriched.groupBy(col("day")).agg(
      sum(when(col("is_prime") && col("prev_close").isNotNull &&
        col("close") > col("prev_close"), 1).otherwise(0)).as("advancers"),
      sum(when(col("is_prime") && col("prev_close").isNotNull &&
        col("close") < col("prev_close"), 1).otherwise(0)).as("decliners"),
      sum(when(col("is_prime") && col("prev_close").isNotNull &&
        col("close") === col("prev_close"), 1).otherwise(0)).as("unchanged"),
      sum(when(col("is_prime") && col("high") > col("base_max"), 1)
        .otherwise(0)).as("new_highs"),
      sum(when(col("is_prime") && col("low") < col("base_min"), 1)
        .otherwise(0)).as("new_lows"),
      sum(when(col("is_prime"), col("turn"))).as("turn_sum"),
      sum(when(col("is_prime"), 1).otherwise(0)).as("prime_bar_count"),
      sum(when(col("is_prime") && col("sma25").isNotNull &&
        col("close") > col("sma25"), 1).otherwise(0)).as("sma25_above"),
      sum(when(col("is_prime") && col("sma25").isNotNull, 1).otherwise(0)).as("sma25_denom"),
      sum(when(col("is_prime") && col("sma200").isNotNull &&
        col("close") > col("sma200"), 1).otherwise(0)).as("sma200_above"),
      sum(when(col("is_prime") && col("sma200").isNotNull, 1).otherwise(0)).as("sma200_denom"))

    // Day-level series is bounded by the trading calendar — the global
    // (unpartitioned) ratio window is safe at any input scale.
    val wCal = Window.orderBy(col("day")).rowsBetween(-24, 0)
    daily
      .withColumn("pct_above_sma25", when(col("sma25_denom") > 0,
        floor(col("sma25_above").cast("double") / col("sma25_denom").cast("double")
          * 100 * 10.0 + 0.5) / 10.0))
      .withColumn("pct_above_sma200", when(col("sma200_denom") > 0,
        floor(col("sma200_above").cast("double") / col("sma200_denom").cast("double")
          * 100 * 10.0 + 0.5) / 10.0))
      .withColumn("adv_sum_25", sum(col("advancers")).over(wCal))
      .withColumn("dec_sum_25", sum(col("decliners")).over(wCal))
      .withColumn("n_days_25", count(lit(1)).over(wCal))
      .withColumn("adv_dec_ratio_25",
        when(col("n_days_25") === 25 && col("dec_sum_25") =!= 0,
          floor(col("adv_sum_25").cast("double") / col("dec_sum_25").cast("double")
            * 100 * 100.0 + 0.5) / 100.0))
      .select(col("day"), col("advancers"), col("decliners"), col("unchanged"),
        col("new_highs"), col("new_lows"),
        col("turn_sum").cast("double").as("turnover_value"),
        col("prime_bar_count"),
        col("pct_above_sma25"), col("pct_above_sma200"),
        col("adv_dec_ratio_25"))
      .orderBy(col("day"))
  }

  val oracleQ42: String =
    """WITH bars AS (
      |  SELECT l_suppkey AS key, CAST(l_shipdate AS DATE) AS day,
      |    CAST(max(CASE WHEN rn_day = 1 THEN l_extendedprice END) AS DOUBLE) AS close,
      |    CAST(max(l_extendedprice) AS DOUBLE) AS high,
      |    CAST(min(l_extendedprice) AS DOUBLE) AS low,
      |    SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS turn
      |  FROM (
      |    SELECT *, row_number() OVER (PARTITION BY l_suppkey, CAST(l_shipdate AS DATE)
      |      ORDER BY l_orderkey DESC, l_linenumber DESC, l_extendedprice DESC) AS rn_day
      |    FROM lineitem) t
      |  GROUP BY 1, 2
      |), yearly AS (
      |  SELECT key, year(day) AS yr, max(high) AS ymax, min(low) AS ymin
      |  FROM bars GROUP BY 1, 2
      |), prev_year AS (
      |  SELECT key, yr,
      |    CASE WHEN lag(yr) OVER wy = yr - 1 THEN lag(ymax) OVER wy END AS prev_ymax,
      |    CASE WHEN lag(yr) OVER wy = yr - 1 THEN lag(ymin) OVER wy END AS prev_ymin
      |  FROM yearly WINDOW wy AS (PARTITION BY key ORDER BY yr)
      |), enriched AS (
      |  SELECT b.*, year(b.day) AS yr,
      |    row_number() OVER wk AS rn,
      |    lag(b.close) OVER wk AS prev_close,
      |    max(b.high) OVER wytd AS cur_max,
      |    min(b.low) OVER wytd AS cur_min,
      |    CASE WHEN row_number() OVER wk >= 25 THEN
      |      CAST(sum(CAST(b.close AS DECIMAL(12,2))) OVER w25 AS DOUBLE) / 25.0 END AS sma25,
      |    CASE WHEN row_number() OVER wk >= 200 THEN
      |      CAST(sum(CAST(b.close AS DECIMAL(12,2))) OVER w200 AS DOUBLE) / 200.0 END AS sma200
      |  FROM bars b
      |  WINDOW
      |    wk AS (PARTITION BY b.key ORDER BY b.day),
      |    wytd AS (PARTITION BY b.key, year(b.day) ORDER BY b.day
      |             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
      |    w25 AS (PARTITION BY b.key ORDER BY b.day ROWS BETWEEN 24 PRECEDING AND CURRENT ROW),
      |    w200 AS (PARTITION BY b.key ORDER BY b.day ROWS BETWEEN 199 PRECEDING AND CURRENT ROW)
      |), flagged AS (
      |  SELECT e.*,
      |    greatest(e.cur_max, CASE WHEN month(e.day) <= 3 THEN p.prev_ymax END) AS base_max,
      |    least(e.cur_min, CASE WHEN month(e.day) <= 3 THEN p.prev_ymin END) AS base_min,
      |    (s.s_nationkey < 20) AS is_prime
      |  FROM enriched e
      |  LEFT JOIN prev_year p ON p.key = e.key AND p.yr = e.yr
      |  LEFT JOIN supplier s ON s.s_suppkey = e.key
      |), daily AS (
      |  SELECT day,
      |    CAST(SUM(CASE WHEN is_prime AND prev_close IS NOT NULL AND close > prev_close THEN 1 ELSE 0 END) AS BIGINT) AS advancers,
      |    CAST(SUM(CASE WHEN is_prime AND prev_close IS NOT NULL AND close < prev_close THEN 1 ELSE 0 END) AS BIGINT) AS decliners,
      |    CAST(SUM(CASE WHEN is_prime AND prev_close IS NOT NULL AND close = prev_close THEN 1 ELSE 0 END) AS BIGINT) AS unchanged,
      |    CAST(SUM(CASE WHEN is_prime AND high > base_max THEN 1 ELSE 0 END) AS BIGINT) AS new_highs,
      |    CAST(SUM(CASE WHEN is_prime AND low < base_min THEN 1 ELSE 0 END) AS BIGINT) AS new_lows,
      |    SUM(CASE WHEN is_prime THEN turn END) AS turn_sum,
      |    CAST(SUM(CASE WHEN is_prime THEN 1 ELSE 0 END) AS BIGINT) AS prime_bar_count,
      |    CAST(SUM(CASE WHEN is_prime AND sma25 IS NOT NULL AND close > sma25 THEN 1 ELSE 0 END) AS BIGINT) AS sma25_above,
      |    CAST(SUM(CASE WHEN is_prime AND sma25 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS sma25_denom,
      |    CAST(SUM(CASE WHEN is_prime AND sma200 IS NOT NULL AND close > sma200 THEN 1 ELSE 0 END) AS BIGINT) AS sma200_above,
      |    CAST(SUM(CASE WHEN is_prime AND sma200 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS sma200_denom
      |  FROM flagged GROUP BY day
      |)
      |SELECT day, advancers, decliners, unchanged, new_highs, new_lows,
      |  CAST(turn_sum AS DOUBLE) AS turnover_value, prime_bar_count,
      |  CASE WHEN sma25_denom > 0 THEN
      |    floor(CAST(sma25_above AS DOUBLE) / CAST(sma25_denom AS DOUBLE) * 100 * 10.0 + 0.5) / 10.0
      |    END AS pct_above_sma25,
      |  CASE WHEN sma200_denom > 0 THEN
      |    floor(CAST(sma200_above AS DOUBLE) / CAST(sma200_denom AS DOUBLE) * 100 * 10.0 + 0.5) / 10.0
      |    END AS pct_above_sma200,
      |  CASE WHEN count(*) OVER wc = 25
      |        AND CAST(sum(decliners) OVER wc AS BIGINT) != 0 THEN
      |    floor(CAST(sum(advancers) OVER wc AS DOUBLE) / CAST(sum(decliners) OVER wc AS DOUBLE)
      |      * 100 * 100.0 + 0.5) / 100.0
      |    END AS adv_dec_ratio_25
      |FROM daily
      |WINDOW wc AS (ORDER BY day ROWS BETWEEN 24 PRECEDING AND CURRENT ROW)
      |ORDER BY day""".stripMargin
}
