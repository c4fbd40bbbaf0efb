package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Point-in-time theme-basket valuation — the reference's basket engine
  * (`basket-valuation.ts`): PIT financial selection with correction
  * tie-breaks, split-factor conversion to the valuation date's basis,
  * weighted harmonic basket ratios, and chained index levels.
  *
  * Set-oriented re-expression:
  *  - PIT FY actuals (pitFy, :239-252): argmax over
  *    (fiscal_year_end, disclosed_date, disclosed_time) among disclosures
  *    ≤ t — a running `max(struct(...))` over the disclosure stream
  *    (the 00116:136-144 running-argmax trick) carried onto valuation days
  *    with an as-of window.
  *  - Forward EPS (pitForwardEps, :253-267): the last disclosure ≤ t whose
  *    target FY exceeds the PIT latest actual FY — t-dependent validity, so
  *    expressed as a bounded join (days × few disclosures per code) +
  *    top-1. Disclosure counts per entity are small and bounded (quarterly
  *    filings), so the join does not explode at scale.
  *  - mcap/earnings/book/sales/dividend (buildConstituentDay, :475-506):
  *    mcap = raw close × PIT shares ÷ cum split factor over
  *    (disclosed, t]; per-share values × PIT shares are split-invariant.
  *  - harmonic aggregation (harmonicRatio/aggregateBasketDay, :512-556):
  *    Σ(f·mcap)/Σ(f·metric) over rows where the metric leg is present;
  *    null unless BOTH numerator and denominator are > 0.
  */
object Baskets {

  /** Sortable disclosure order key — the reference compares
    * (disclosed_date, disclosed_time) lexicographically. */
  private def ordKey(dateCol: Column, timeCol: Column): Column =
    concat(dateCol.cast("string"), lit("T"), coalesce(timeCol, lit("")))

  /** PIT FY actuals per (code, day): for each valuation day, the FY
    * disclosure with disclosed ≤ day maximizing
    * (fiscal_year_end, disclosed_date, disclosed_time).
    *
    * @param fy   FY disclosures: code, disclosed_date, disclosed_time,
    *             fiscal_year_end, sales, eps, bps, dividend_annual, shares
    * @param days valuation days: code, day
    */
  def pitFy(fy: DataFrame, days: DataFrame): DataFrame = {
    val ranked = fy.select(col("code"),
      ordKey(col("disclosed_date"), col("disclosed_time")).as("__ord"),
      struct(col("fiscal_year_end"), col("disclosed_date"),
        col("disclosed_time"), col("sales"), col("eps"), col("bps"),
        col("dividend_annual"), col("shares")).as("__rec"))
    // running argmax over the disclosure stream (struct compare is
    // field-order lexicographic: fiscal_year_end first, then disclosed)
    val wRun = Window.partitionBy(col("code")).orderBy(col("__ord"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val best = ranked.withColumn("__best", max(col("__rec")).over(wRun))
      .select(col("code"), col("__ord"), col("__best"))
    // as-of carry onto days (union-sort: state rows sort before probe rows
    // at the same key via the side marker)
    val probes = days.select(col("code"),
      concat(col("day").cast("string"), lit("T~")).as("__ord"),
      lit(null).cast(best.schema("__best").dataType).as("__best"),
      col("day"))
    val states = best.withColumn("day", lit(null).cast("date"))
    val wAsof = Window.partitionBy(col("code")).orderBy(col("__ord"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    states.unionByName(probes)
      .withColumn("__pit", last(col("__best"), ignoreNulls = true).over(wAsof))
      .filter(col("day").isNotNull)
      .select(col("code"), col("day"),
        col("__pit.fiscal_year_end").as("fy_end"),
        col("__pit.disclosed_date").as("fy_disclosed"),
        col("__pit.sales").as("sales"), col("__pit.eps").as("eps"),
        col("__pit.bps").as("bps"),
        col("__pit.dividend_annual").as("dividend_annual"),
        col("__pit.shares").as("shares"))
  }

  /** PIT forward EPS per (code, day): last disclosure ≤ day whose target FY
    * is strictly beyond the PIT latest actual FY at that day.
    *
    * @param forward forward disclosures: code, disclosed_date,
    *                disclosed_time, target_fy_end, forecast_eps
    * @param pitDays output of [[pitFy]] (provides fy_end per code/day)
    */
  def pitForward(forward: DataFrame, pitDays: DataFrame): DataFrame = {
    val f = forward.select(col("code").as("f_code"),
      col("disclosed_date").as("f_disclosed"),
      ordKey(col("disclosed_date"), col("disclosed_time")).as("__ford"),
      col("target_fy_end"), col("forecast_eps"))
    val joined = pitDays.join(f,
      col("f_code") === col("code") &&
        col("f_disclosed") <= col("day") &&
        (col("fy_end").isNull || col("target_fy_end") > col("fy_end")),
      "left")
    val wTop = Window.partitionBy(col("code"), col("day"))
      .orderBy(col("__ford").desc_nulls_last)
    joined.withColumn("__rn", row_number().over(wTop))
      .filter(col("__rn") === 1)
      .select(col("code"), col("day"), col("forecast_eps"),
        col("f_disclosed").as("forward_disclosed"))
  }

  /** Cumulative split factor over (fromExclusive, toInclusive] per row —
    * bounded join against the (small) split-event table, exact product. */
  def cumSplitFactor(rows: DataFrame, splits: DataFrame,
                     fromCol: String, toCol: String,
                     outCol: String): DataFrame = {
    // split-side columns renamed so callers may carry their own `factor`
    // (constituent weight factors) without ambiguity
    val s = splits.select(col("code").as("__s_code"),
      col("event_date").as("__s_event_date"), col("factor").as("__s_factor"))
    val j = rows.join(s,
      col("__s_code") === col("code") &&
        col("__s_event_date") > col(fromCol) &&
        col("__s_event_date") <= col(toCol),
      "left")
    val keys = rows.columns.map(col)
    j.groupBy(keys: _*)
      .agg(coalesce(
        graft.operators.ProductAgg.decimalProduct(
          col("__s_factor").cast("decimal(18,10)")),
        lit(java.math.BigDecimal.ONE)).cast("double").as(outCol))
  }

  /** Per-(basket, day) weighted harmonic aggregates
    * (aggregateBasketDay, :529-556). Input rows: basket, day, factor,
    * official_weight, mcap, earnings, forward_earnings, book, sales,
    * dividend_total (metric legs nullable). */
  def aggregateBasketDays(items: DataFrame): DataFrame = {
    val D = "decimal(30,6)"
    def harmonic(metric: Column, name: String): Seq[Column] = Seq(
      sum(when(metric.isNotNull,
        (col("factor") * col("mcap")).cast(D))).cast("double").as(s"__n_$name"),
      sum(when(metric.isNotNull,
        (col("factor") * metric).cast(D))).cast("double").as(s"__d_$name"))
    val aggs =
      harmonic(col("earnings"), "per") ++
      harmonic(col("forward_earnings"), "perf") ++
      harmonic(col("book"), "pbr") ++
      harmonic(col("sales"), "psr") ++
      harmonic(col("dividend_total"), "div") :+
      sum((col("factor") * col("mcap")).cast(D)).cast("double").as("__fm") :+
      sum(col("official_weight").cast("decimal(18,6)")).cast("double")
        .as("coverage_pct")
    val g = items.groupBy(col("basket"), col("day"))
      .agg(aggs.head, aggs.tail: _*)
    def ratio(name: String): Column =
      when(col(s"__n_$name") > 0 && col(s"__d_$name") > 0,
        col(s"__n_$name") / col(s"__d_$name"))
    g.select(col("basket"), col("day"),
      ratio("per").as("weighted_per"),
      ratio("perf").as("weighted_per_forward"),
      ratio("pbr").as("weighted_pbr"),
      ratio("psr").as("weighted_psr"),
      // guard is on the mcap leg (divDen in the reference, :545-556): zero
      // total dividends with positive mcap is a real 0.0% yield, not null
      when(col("__n_div") > 0, col("__d_div") / col("__n_div") * 100)
        .as("weighted_div_yield"),
      col("coverage_pct"))
  }

  /** Water-filling weight caps per basket (waterFillCap,
    * basket-valuation.ts:270-318 + resolveConstituentWeights :404-416):
    * cap each constituent's mcap-share at its limit and redistribute the
    * excess proportionally among the uncapped, iterating to the fixed
    * point. The reference's per-round violation loop is O(n²); this is the
    * closed-form of its fixed point (the redistribution multiplier rises
    * monotonically each round, so the final capped set is exactly the
    * prefix of constituents sorted by cap/share below the threshold λ):
    * sort by cap/raw within basket, take cumulative (cap, raw) sums, and
    * pick the smallest prefix k whose λ_k = (1−Σcap_k)/(share beyond k)
    * separates the two sides. All selection comparisons are cross-
    * multiplied — with integer raw weights and dyadic cap limits they are
    * EXACT in double arithmetic, so the chosen prefix is reproducible
    * bit-for-bit in any engine and at any partitioning. If no prefix is
    * valid (everything capped), falls back to cap-proportional
    * renormalization exactly like the reference (:312-317).
    *
    * @param anchors basket, code, raw (positive integer-valued share
    *                weight, e.g. floored mcap), cap (dyadic limit in (0,1])
    * @return basket, code, weight (Σ=1 per basket), weight_factor
    *         (= weight/share), official_weight (= weight×100)
    */
  def waterfillWeights(anchors: DataFrame): DataFrame = {
    val wB = Window.partitionBy(col("basket"))
    val wSort = Window.partitionBy(col("basket"))
      .orderBy(col("cap") / col("raw"), col("code"))
    val wCum = wSort.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ranked = anchors
      .withColumn("__t", sum(col("raw")).over(wB))
      .withColumn("__n", count(lit(1)).over(wB))
      .withColumn("__k", row_number().over(wSort))
      .withColumn("__cumcap", sum(col("cap")).over(wCum))
      .withColumn("__cumraw", sum(col("raw")).over(wCum))
      .withColumn("__nraw", lead(col("raw"), 1).over(wSort))
      .withColumn("__ncap", lead(col("cap"), 1).over(wSort))
    // candidate prefixes: k = 0 (no caps bind; encoded on the k=1 row) and
    // each k < n whose λ_k sits between ratio_k and ratio_{k+1}; the
    // comparisons are cross-multiplied (exact for int raw × dyadic cap)
    val k0 = ranked.filter(col("__k") === 1 &&
        col("raw") <= col("cap") * col("__t"))
      .select(col("basket"), lit(0).as("ks"),
        lit(0.0).as("capK"), lit(0.0).as("rawK"))
    val kPos = ranked.filter(col("__k") < col("__n") &&
        (lit(1.0) - col("__cumcap")) > 0 &&
        col("cap") * (col("__t") - col("__cumraw")) <=
          (lit(1.0) - col("__cumcap")) * col("raw") &&
        (lit(1.0) - col("__cumcap")) * col("__nraw") <=
          col("__ncap") * (col("__t") - col("__cumraw")))
      .select(col("basket"), col("__k").as("ks"),
        col("__cumcap").as("capK"), col("__cumraw").as("rawK"))
    val kStar = k0.unionByName(kPos)
      .groupBy(col("basket"))
      .agg(min(struct(col("ks"), col("capK"), col("rawK"))).as("__m"))
      .select(col("basket"), col("__m.ks").as("ks"),
        col("__m.capK").as("capK"), col("__m.rawK").as("rawK"))
    val joined = ranked.join(broadcast(kStar), Seq("basket"), "left")
    val capSum = sum(col("cap")).over(wB)
    val w = when(col("ks").isNull,
        // all capped → cap-proportional renormalization (:312-317)
        when(abs(capSum - 1.0) > 1e-9, col("cap") / capSum)
          .otherwise(col("cap")))
      .when(col("__k") <= col("ks"), col("cap"))
      .otherwise((lit(1.0) - col("capK")) * col("raw") / (col("__t") - col("rawK")))
    joined.select(col("basket"), col("code"), w.as("weight"),
      (w * col("__t") / col("raw")).as("weight_factor"),
      (w * lit(100.0)).as("official_weight"))
  }

  /** Chained index levels per basket (chainIndexSeries, :568-616):
    * r(t) = Σ w_i(t-1)·(adj_i(t)/adj_i(t-1)) renormalized over codes with
    * both closes; level(anchor) = anchorLevel, level chains forward by ×r
    * and backward by ÷r, truncating at the first gap in each direction.
    *
    * @param weights  basket, day, code, weight (w_i(t) — typically
    *                 f·mcap/Σ from [[aggregateBasketDays]] inputs)
    * @param adjClose code, day, adj_close
    */
  def chainIndex(weights: DataFrame, adjClose: DataFrame,
                 anchorDay: java.sql.Date, anchorLevel: Double): DataFrame = {
    val wNext = Window.partitionBy(col("basket"), col("code"))
      .orderBy(col("day"))
    val px = adjClose.select(col("code"), col("day"), col("adj_close"))
    // pair each weighted holding with the next day's close
    val held = weights.join(px, Seq("code", "day"))
      .withColumn("next_day", lead(col("day"), 1).over(wNext))
      .withColumn("next_close", lead(col("adj_close"), 1).over(wNext))
    val rets = held
      .filter(col("next_day").isNotNull && col("adj_close") > 0 &&
        col("next_close").isNotNull)
      .groupBy(col("basket"), col("next_day").as("day"))
      .agg((sum(col("weight") * (col("next_close") / col("adj_close"))) /
        sum(col("weight"))).as("r"))
    // chain from the anchor: level(d) = anchor × Π r(s) for s in
    // (anchor, d] going forward, and anchor ÷ Π r(s) for s in (d, anchor]
    // going backward; a missing r truncates that direction (the first gap
    // poisons all farther days via a running null-counter). Double-precision
    // exp(sum(log)) is acceptable for chaining (SURVEY §2.5 — unlike split
    // factors, levels are display series, and gaps dominate error anyway).
    val allDays = weights.select(col("basket"), col("day")).distinct()
    val withR = allDays.join(rets, Seq("basket", "day"), "left")

    val wFwd = Window.partitionBy(col("basket")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fwd = withR.filter(col("day") > lit(anchorDay))
      .withColumn("__miss", sum(when(col("r").isNull, 1).otherwise(0)).over(wFwd))
      .withColumn("level",
        when(col("__miss") === 0,
          lit(anchorLevel) * exp(sum(log(col("r"))).over(wFwd))))

    val wBwd = Window.partitionBy(col("basket")).orderBy(col("day").desc)
      .rowsBetween(Window.unboundedPreceding, -1)

    // backward: for day d < anchor, divide out r over (d, anchor]; those r
    // values live on rows d' with d < d' <= anchor, which in desc order are
    // exactly the frame UNBOUNDED PRECEDING..1 PRECEDING
    val bwdReal = withR.filter(col("day") <= lit(anchorDay))
      .withColumn("__cnt", count(lit(1)).over(wBwd))
      .withColumn("__have", count(col("r")).over(wBwd))
      .withColumn("level",
        when(col("day") === lit(anchorDay), lit(anchorLevel))
          .when(col("__cnt") === col("__have"),
            lit(anchorLevel) / exp(sum(log(col("r"))).over(wBwd))))

    bwdReal.select(col("basket"), col("day"), col("level"))
      .unionByName(fwd.select(col("basket"), col("day"), col("level")))
      .orderBy(col("basket"), col("day"))
  }
}
