package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{AsOfJoin, Windows}

/** Core relational operators (SURVEY.md §2.1–§2.6) demonstrated over the
  * driver testdata, each with a DuckDB oracle in [[graft.SparkEntry.oracleSql]].
  *
  * Numeric-parity discipline (SURVEY §7.4.1): sums are computed over DECIMAL
  * casts (order-insensitive, exact) and cast back to double; scalar math on
  * those exact inputs is plain IEEE-754 double arithmetic, identical
  * instruction-for-instruction to the oracle SQL. No `round()` anywhere —
  * when rounding is semantically needed we use the reference's JS convention
  * `floor(x*10^d + 0.5)/10^d` in both engines.
  */
object Core {

  private val D2 = "decimal(12,2)"

  /** §2.4 group-by sums/ratios (TPC-H Q1 shape; mirrors
    * `aggregateShortSellingByDate`, indicators-sync.ts:500-521). */
  def q01PricingAgg(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    val price = col("l_extendedprice").cast(D2)
    val disc = lit(1).cast(D2) - col("l_discount").cast(D2)
    val tax = lit(1).cast(D2) + col("l_tax").cast(D2)
    li.groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity").cast(D2)).cast("double").as("sum_qty"),
        sum(price).cast("double").as("sum_base_price"),
        sum((price * disc).cast("decimal(30,6)")).cast("double").as("sum_disc_price"),
        sum((price * disc * tax).cast("decimal(30,6)")).cast("double").as("sum_charge"),
        count(lit(1)).as("count_order"))
      .withColumn("avg_qty", col("sum_qty") / col("count_order"))
      .withColumn("avg_price", col("sum_base_price") / col("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  /** §2.3/§2.6 top-1 per group (`DISTINCT ON` / LATERAL LIMIT 1,
    * 00093:53-58, 00116:168-184). */
  def q02LatestOrder(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    Windows.topKPerGroup(o, Seq(col("o_custkey")),
        Seq(col("o_orderdate").desc, col("o_orderkey").desc), k = 1)
      .select(col("o_custkey"), col("o_orderkey").as("latest_orderkey"),
        to_date(col("o_orderdate")).as("latest_orderdate"),
        col("o_totalprice").as("latest_totalprice"))
      .orderBy(col("o_custkey"))
  }

  /** §2.5 inverted percent_rank per sector (00108:141-150). */
  def q03SectorPercentile(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir)
    Windows.invertedPercentile(c, col("c_nationkey"), col("c_acctbal"),
        "bal_pctile", lowerIsBetter = false)
      .select(col("c_custkey"), col("c_nationkey"), col("c_acctbal"),
        col("bal_pctile"))
      .orderBy(col("c_custkey"))
  }

  /** §2.5 population z-score per sector (00108:151-156), computed from
    * exact decimal sums so the result is bit-identical regardless of
    * aggregation order. */
  def q04SectorZscore(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir)
    val w = Window.partitionBy(col("c_nationkey"))
    val xd = col("c_acctbal").cast(D2)
    val n = count(lit(1)).over(w)
    val mu = sum(xd).over(w).cast("double") / n
    val msq = sum((xd * xd).cast("decimal(30,4)")).over(w).cast("double") / n
    val variance = msq - mu * mu
    c.withColumn("bal_z",
        when(variance > 0, (col("c_acctbal") - mu) / sqrt(variance)))
      .select(col("c_custkey"), col("c_nationkey"), col("c_acctbal"), col("bal_z"))
      .orderBy(col("c_custkey"))
  }

  /** §2.3 single-scan conditional-agg pivot — the 00049→00108 momentum
    * pivot (ref prices at rank 1/3/5 per entity, 00108:42-54). */
  def q05MomentumPivot(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    Windows.rankPivot(o, col("o_custkey"),
        Seq(col("o_orderdate"), col("o_orderkey")),
        col("o_totalprice"), Seq(1, 3, 5), "price_rn")
      .orderBy(col("o_custkey"))
  }

  /** §2.3 as-of (point-in-time) join: each click joined to the user's
    * latest purchase at-or-before it (pitFy, basket-valuation.ts:239-252;
    * macro as-of 00033:13-21). Union-sort implementation — one shuffle,
    * no range explosion. */
  def q06AsofJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val clicks = ev.filter(col("event_type") === "click")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"),
        col("event_id").as("asof_event_id"), col("value").as("asof_value"))
    AsOfJoin.backward(clicks, purchases, Seq("user_id"),
        leftTime = "ts", rightTime = "ts",
        payload = Seq("asof_event_id", "asof_value"))
      .select(col("event_id"), col("user_id"), col("asof_event_id"),
        col("asof_value"))
      .orderBy(col("event_id"))
  }

  /** §2.4 custom product aggregate over a running window (numeric_product,
    * 00093:24-37). Factors are scaled to exact integers so the cumulative
    * product is exact in double regardless of combination order. */
  def q07CumTaxProduct(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    // one factor per (order, line) first — the reference's day_factors
    // distinct-on discipline (00093:50-58). Also the exactness guard:
    // (l_orderkey, l_linenumber) is not unique, and 40-deep duplicate
    // chains push the integer-scaled product past 2^53 where combination
    // order starts to matter (surfaced as a 1-ulp divergence at sf0.1).
    val factors = li.groupBy(col("l_orderkey"), col("l_linenumber"))
      .agg(min(col("l_tax")).as("tax"))
    val factorScaled = floor(col("tax") * 100 + lit(0.5)) + lit(100.0)
    val w = Window.partitionBy(col("l_orderkey")).orderBy(col("l_linenumber"))
    val wf = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    factors.withColumn("__f", factorScaled)
      .withColumn("__prod",
        aggregate(collect_list(col("__f")).over(wf), lit(1.0), (acc, x) => acc * x))
      .withColumn("cum_tax_factor",
        col("__prod") / pow(lit(100.0), row_number().over(w)))
      .select(col("l_orderkey"), col("l_linenumber"), col("cum_tax_factor"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))
  }

  /** §1.1 SCD Type 2 interval construction from an event log
    * (equity_master history, 00010:18-53): collapse consecutive equal
    * states into [valid_from, valid_to) with is_current. */
  def q08Scd2Intervals(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val prevType = lag(col("event_type"), 1).over(w)
    val flagged = ev.withColumn("__chg",
      when(prevType.isNull || prevType =!= col("event_type"), 1).otherwise(0))
    val runs = flagged.withColumn("__run",
      sum(col("__chg")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val iv = runs.groupBy(col("user_id"), col("__run"))
      .agg(min(col("event_type")).as("state"),
        min(col("ts")).as("valid_from"))
    val w2 = Window.partitionBy(col("user_id")).orderBy(col("__run"))
    iv.withColumn("valid_to", lead(col("valid_from"), 1).over(w2))
      .withColumn("is_current", col("valid_to").isNull)
      .select(col("user_id"), col("state"), col("valid_from"),
        col("valid_to"), col("is_current"))
      .orderBy(col("user_id"), col("valid_from"))
  }

  /** §2.2 exact dedup: normalize → fingerprint (md5) → keep first per key
    * (the training-pipeline exact-dedup operator; keyed-upsert analog of
    * batch.ts:81-141). */
  def q09DedupExact(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val norm = regexp_replace(lower(trim(col("text"))), "\\s+", " ")
    val fp = md5(norm.cast("binary"))
    Windows.topKPerGroup(docs.withColumn("fp", fp), Seq(col("fp")),
        Seq(col("doc_id").asc), k = 1)
      .select(col("doc_id"), col("fp"))
      .orderBy(col("doc_id"))
  }

  /** Staleness bound for q118: an as-of purchase older than this is
    * treated as no match. */
  val AsofToleranceSec = 86400L

  /** q118 — as-of join WITH TOLERANCE: q06's backward as-of, but a carried
    * purchase older than [[AsofToleranceSec]] is nulled out — the "stale
    * quote is no quote" rule of market-data joins. Same union-sort plan as
    * q06 (the bound is a post-filter on the carried timestamp, not a join
    * condition — no band join appears). */
  def q118AsofTolerance(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val clicks = ev.filter(col("event_type") === "click")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"),
        col("event_id").as("asof_event_id"), col("value").as("asof_value"))
    AsOfJoin.backwardWithin(clicks, purchases, Seq("user_id"),
        leftTime = "ts", rightTime = "ts",
        payload = Seq("asof_event_id", "asof_value"),
        maxAgeSec = AsofToleranceSec)
      .select(col("event_id"), col("user_id"), col("asof_event_id"),
        col("asof_value"))
      .orderBy(col("event_id"))
  }

  val oracleQ118: String =
    s"""WITH tagged AS (
       |  SELECT user_id, ts, event_id,
       |    CASE WHEN event_type = 'purchase' THEN 0 ELSE 1 END AS side,
       |    CASE WHEN event_type = 'purchase' THEN event_id END AS p_eid,
       |    CASE WHEN event_type = 'purchase' THEN value END AS p_val,
       |    CASE WHEN event_type = 'purchase' THEN ts END AS p_ts
       |  FROM events WHERE event_type IN ('click', 'purchase'))
       |SELECT event_id, user_id,
       |  CASE WHEN fresh THEN asof_event_id END AS asof_event_id,
       |  CASE WHEN fresh THEN asof_value END AS asof_value
       |FROM (
       |  SELECT event_id, user_id, side,
       |    last_value(p_eid IGNORE NULLS) OVER w AS asof_event_id,
       |    last_value(p_val IGNORE NULLS) OVER w AS asof_value,
       |    last_value(p_ts IGNORE NULLS) OVER w IS NOT NULL
       |      AND epoch_us(ts) - epoch_us(last_value(p_ts IGNORE NULLS) OVER w)
       |        <= ${AsofToleranceSec * 1000000L} AS fresh
       |  FROM tagged
       |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, side
       |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |) t WHERE side = 1 ORDER BY event_id""".stripMargin
}
