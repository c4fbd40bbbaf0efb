package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.rowMean
import graft.operators.Windows

/** The flagship program — the `refresh_stock_metrics` plan shape
  * (`00108_refresh_stock_metrics_perf.sql:17-209`, traced in SURVEY §3.2)
  * re-expressed over the driver testdata:
  *
  * {{{
  * orders  (bars)    → row_number window → conditional-agg pivot (rn 1/5/10)
  * lineitem⋈orders   → per-entity fundamental sums (exact decimal)
  * customer⋈nation   → current dimension (broadcast)
  * base = px ⋈ dim ⋈ fin → derived ratios (momentum, PER-like)
  * scored: inverted percent_rank ×2 + z-score per sector (one window partition)
  * final: null-aware row-mean composite score
  * }}}
  *
  * Scale notes (100 TB): the bars scan aggregates map-side after one shuffle
  * on entity; the dimension join is broadcast; the sector windows partition
  * on a low-cardinality key but carry only the slim scored projection
  * (~entities × 10 cols), mirroring the reference's 1.14M→4.6k row collapse
  * before its window stage.
  */
object ScreenMetrics {

  private val D2 = "decimal(18,2)"

  def run(s: SparkSession, dir: String): DataFrame =
    fromTables(Tables.orders(s, dir), Tables.lineitem(s, dir),
      Tables.customer(s, dir))

  /** The same program over explicit input relations — the landed-table
    * refresh mode ([[graft.jobs.DailyRefreshJob]] points this at the
    * tables the landing job just wrote, the reference's cron-A
    * post-step shape, `cron-a-direct.ts:115-147`). Inputs must carry
    * the testdata column names. */
  def fromTables(orders: DataFrame, lineitem: DataFrame,
                 customer: DataFrame): DataFrame = {
    // px: latest/5th/10th reference prices per entity — single-scan pivot,
    // NOT a 5-way self-join (the 00049 regression).
    val wRank = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
    val ranked = orders
      .select(col("o_custkey"), col("o_totalprice"), col("o_orderdate"), col("o_orderkey"))
      .withColumn("rn", row_number().over(wRank))
    val px = ranked.groupBy(col("o_custkey")).agg(
      max(when(col("rn") === 1, col("o_totalprice"))).as("p1"),
      max(when(col("rn") === 5, col("o_totalprice"))).as("p5"),
      max(when(col("rn") === 10, col("o_totalprice"))).as("p10"),
      count(lit(1)).as("n_orders"))

    // fin: fundamental sums per entity (exact decimal, order-insensitive).
    val price = col("l_extendedprice").cast(D2)
    val disc = lit(1).cast(D2) - col("l_discount").cast(D2)
    val fin = orders.join(lineitem, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_custkey"))
      .agg(
        sum((price * disc).cast("decimal(30,4)")).cast("double").as("sales"),
        sum(col("l_quantity").cast(D2)).cast("double").as("units"))

    // dim: current master (broadcast — 25 nations, 150k customers max).
    val dim = customer.select(col("c_custkey"), col("c_mktsegment").as("segment"),
      col("c_acctbal"))

    val base = px
      .join(dim, col("c_custkey") === col("o_custkey"))
      .join(fin.withColumnRenamed("o_custkey", "fin_custkey"),
        col("fin_custkey") === col("o_custkey"), "left")
      .withColumn("momentum_5", when(col("p5") > 0, col("p1") / col("p5") - 1))
      .withColumn("momentum_10", when(col("p10") > 0, col("p1") / col("p10") - 1))
      .withColumn("per_like",
        when(col("sales") > 0 && col("units") > 0,
          col("p1") / (col("sales") / col("units"))))
      .select(col("c_custkey"), col("segment"), col("c_acctbal"), col("p1"),
        col("p5"), col("momentum_5"), col("momentum_10"), col("per_like"))

    // scored: sector-relative percentiles (nulls excluded from the rank
    // denominator, 00108:141-150) + z-score from exact sums.
    val pct1 = Windows.invertedPercentile(base, col("segment"),
      col("momentum_5"), "momo5_pct", lowerIsBetter = false)
    val pct2 = Windows.invertedPercentile(pct1, col("segment"),
      col("per_like"), "per_pct", lowerIsBetter = true)
    val wSeg = Window.partitionBy(col("segment"))
    val xd = col("c_acctbal").cast(D2)
    val n = count(lit(1)).over(wSeg)
    val mu = sum(xd).over(wSeg).cast("double") / n
    val msq = sum((xd * xd).cast("decimal(30,4)")).over(wSeg).cast("double") / n
    val variance = msq - mu * mu
    val scored = pct2.withColumn("bal_z",
      when(variance > 0, (col("c_acctbal") - mu) / sqrt(variance)))

    scored
      .withColumn("composite_score", rowMean(col("momo5_pct"), col("per_pct")))
      .select(col("c_custkey"), col("segment"), col("p1"), col("p5"),
        col("momentum_5"), col("per_like"), col("momo5_pct"), col("per_pct"),
        col("bal_z"), col("composite_score"))
      .orderBy(col("c_custkey"))
  }

  /** DuckDB oracle translation of [[run]] — identical plan, identical
    * IEEE-754 scalar math. */
  val oracle: String =
    """WITH ranked AS (
      |  SELECT o_custkey, o_totalprice,
      |         ROW_NUMBER() OVER (PARTITION BY o_custkey
      |                            ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
      |  FROM orders
      |), px AS (
      |  SELECT o_custkey,
      |         MAX(CASE WHEN rn = 1 THEN o_totalprice END) AS p1,
      |         MAX(CASE WHEN rn = 5 THEN o_totalprice END) AS p5,
      |         MAX(CASE WHEN rn = 10 THEN o_totalprice END) AS p10,
      |         COUNT(*) AS n_orders
      |  FROM ranked GROUP BY o_custkey
      |), fin AS (
      |  SELECT o_custkey,
      |         CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
      |               * (1 - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(30,4)))
      |              AS DOUBLE) AS sales,
      |         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS units
      |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey
      |  GROUP BY o_custkey
      |), base AS (
      |  SELECT c.c_custkey, c.c_mktsegment AS segment, c.c_acctbal,
      |         px.p1, px.p5,
      |         CASE WHEN px.p5  > 0 THEN px.p1 / px.p5  - 1 END AS momentum_5,
      |         CASE WHEN px.p10 > 0 THEN px.p1 / px.p10 - 1 END AS momentum_10,
      |         CASE WHEN fin.sales > 0 AND fin.units > 0
      |              THEN px.p1 / (fin.sales / fin.units) END AS per_like
      |  FROM px JOIN customer c ON c.c_custkey = px.o_custkey
      |  LEFT JOIN fin ON fin.o_custkey = px.o_custkey
      |), scored AS (
      |  SELECT *,
      |    CASE WHEN momentum_5 IS NOT NULL THEN
      |      (1 - percent_rank() OVER (PARTITION BY segment, momentum_5 IS NULL
      |                                ORDER BY momentum_5 DESC)) * 100 END AS momo5_pct,
      |    CASE WHEN per_like IS NOT NULL THEN
      |      (1 - percent_rank() OVER (PARTITION BY segment, per_like IS NULL
      |                                ORDER BY per_like ASC)) * 100 END AS per_pct,
      |    CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) OVER wseg AS DOUBLE)
      |      / COUNT(*) OVER wseg AS mu,
      |    CAST(SUM(CAST(CAST(c_acctbal AS DECIMAL(18,2))
      |          * CAST(c_acctbal AS DECIMAL(18,2)) AS DECIMAL(30,4))) OVER wseg
      |         AS DOUBLE) / COUNT(*) OVER wseg AS msq
      |  FROM base
      |  WINDOW wseg AS (PARTITION BY segment)
      |)
      |SELECT c_custkey, segment, p1, p5, momentum_5, per_like, momo5_pct, per_pct,
      |  CASE WHEN msq - mu*mu > 0
      |       THEN (c_acctbal - mu) / sqrt(msq - mu*mu) END AS bal_z,
      |  CASE WHEN momo5_pct IS NOT NULL AND per_pct IS NOT NULL
      |         THEN ((0 + momo5_pct) + per_pct) / 2
      |       WHEN momo5_pct IS NOT NULL THEN momo5_pct
      |       WHEN per_pct IS NOT NULL THEN per_pct END AS composite_score
      |FROM scored ORDER BY c_custkey""".stripMargin
}
