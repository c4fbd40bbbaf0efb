package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.analytics.Technical
import graft.analytics.Technical.Bar

/** Golden-vector contract (FIXTURES.md §1): 220 synthetic OHLCV bars →
  * one expected TechnicalSnapshot, asserted field-for-field. The fixture is
  * the shared cross-repo contract fixture of the reference
  * (src/tests/analytics/technical.test.ts:156-157). */
class TechnicalSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private lazy val (bars, expected) = {
    import spark.implicits._
    val raw = scala.io.Source.fromInputStream(
      getClass.getResourceAsStream("/golden-vectors.json"), "UTF-8").mkString
    val df = spark.read.option("multiLine", "true").json(Seq(raw).toDS())
    val row = df.select(col("input"), col("expected.*")).collect()(0)
    def num(b: org.apache.spark.sql.Row, f: String): Double =
      b.getAs[Any](f) match {
        case d: Double => d
        case l: Long => l.toDouble
        case i: Int => i.toDouble
      }
    val input = row.getSeq[org.apache.spark.sql.Row](0).map { b =>
      Bar(num(b, "open"), num(b, "high"), num(b, "low"), num(b, "close"),
        num(b, "volume"))
    }.toArray
    val exp = df.select("expected.*").collect()(0)
    (input, exp)
  }

  private def expD(name: String): Option[Double] =
    Option(expected.getAs[Any](name)).map {
      case d: Double => d
      case l: Long => l.toDouble
    }

  test("golden vectors: 220-bar snapshot matches field-for-field") {
    val s = Technical.snapshot(bars).get
    assert(s.close == expD("close"), "close")
    assert(s.sma25 == expD("sma_25"), "sma_25")
    assert(s.sma75 == expD("sma_75"), "sma_75")
    assert(s.sma200 == expD("sma_200"), "sma_200")
    assert(s.dev25 == expD("dev_25"), "dev_25")
    assert(s.dev75 == expD("dev_75"), "dev_75")
    assert(s.dev200 == expD("dev_200"), "dev_200")
    assert(s.aboveSma200 == Option(expected.getAs[Boolean]("above_sma200")),
      "above_sma200")
    assert(s.cross2575 == Option(expected.getAs[String]("cross_25_75")),
      "cross_25_75")
    assert(s.cross2575Age.map(_.toLong) ==
      Option(expected.getAs[Long]("cross_25_75_age")), "cross_25_75_age")
    assert(s.rsi14 == expD("rsi_14"), "rsi_14")
    assert(s.macd == expD("macd"), "macd")
    assert(s.macdSignal == expD("macd_signal"), "macd_signal")
    assert(s.macdHist == expD("macd_hist"), "macd_hist")
    assert(s.stochK == expD("stoch_k"), "stoch_k")
    assert(s.stochD == expD("stoch_d"), "stoch_d")
    assert(s.bbPercentB == expD("bb_percent_b"), "bb_percent_b")
    assert(s.bbBandwidth == expD("bb_bandwidth"), "bb_bandwidth")
    assert(s.atr14 == expD("atr_14"), "atr_14")
    assert(s.atrPct == expD("atr_pct"), "atr_pct")
    assert(s.volRatio20 == expD("vol_ratio_20"), "vol_ratio_20")
    assert(s.ichimokuState == Option(expected.getAs[String]("ichimoku_state")),
      "ichimoku_state")
  }

  test("snapshot on short series yields nulls for long-window fields") {
    val s = Technical.snapshot(bars.take(10)).get
    assert(s.sma25.isEmpty && s.sma200.isEmpty && s.rsi14.isEmpty &&
      s.ichimokuState.isEmpty)
    assert(s.close.isDefined)
  }

  test("distributed snapshot job returns one row per key") {
    val df = graft.analytics.TechnicalJob.fromEvents(
      spark, "/root/testdata/sf0.001")
    val nUsers = Tables.events(spark, "/root/testdata/sf0.001")
      .select("user_id").distinct().count()
    assert(df.count() == nUsers)
    assert(df.filter(col("rsi_14").isNotNull).count() > 0)
  }

  test("snapshots breaks duplicate-ord ties by arrival order (later wins)") {
    import spark.implicits._
    import graft.analytics.TechnicalJob
    // single input partition → stable arrival order; lookback 1 forces the
    // boundary eviction to pick between the two ord=1 bars
    val bars = Seq(
      TechnicalJob.KeyedBar(1L, 1L, 10, 10, 10, 10.0, 1),
      TechnicalJob.KeyedBar(1L, 1L, 20, 20, 20, 20.0, 1)
    ).toDS().coalesce(1)
    val snap = TechnicalJob.snapshots(bars, lookback = 1).collect()(0)
    assert(snap.close.contains(20.0)) // later-seen duplicate survives
  }

  test("obv accumulates signed volume") {
    val o = Technical.obv(Array(1.0, 2.0, 1.5, 1.5, 3.0),
      Array(10, 20, 30, 40, 50))
    assert(o.toSeq == Seq(0.0, 20.0, -10.0, -10.0, 40.0))
  }
}
