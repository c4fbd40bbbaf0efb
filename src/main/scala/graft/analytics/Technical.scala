package graft.analytics

/** Technical-indicator kernels over an ascending OHLCV series.
  *
  * Clean-room Scala implementation of the reference's indicator contract
  * (`src/lib/analytics/technical.ts:75-410`; parameters documented at
  * `technical.ts:12-19`): SMA, EMA (SMA-seeded), RSI/ATR (Wilder), MACD
  * (12/26/9, signal EMA over the defined MACD slice), Bollinger (population
  * σ), slow stochastic (14,3,3), OBV, Ichimoku (9/26/52, displacement 26),
  * and SMA25×SMA75 cross detection with age. Numeric conventions follow the
  * reference exactly — IEEE-754 double accumulation in series order, JS
  * `Math.round` via floor(x·10^d+0.5)/10^d — and are pinned by the shared
  * golden-vector fixture (FIXTURES.md §1).
  *
  * These are *recursive* kernels (EMA/RSI/ATR carry state bar-to-bar), which
  * no window frame can express (SURVEY §2.5); the distributed driver is
  * [[TechnicalJob]]'s per-key `flatMapGroups` with a bounded lookback —
  * state is O(lookback) per entity, keys are high-cardinality, so the plan
  * is one shuffle and embarrassingly parallel at any scale.
  */
object Technical {

  final case class Bar(open: Double, high: Double, low: Double,
                       close: Double, volume: Double)

  final case class Snapshot(
      close: Option[Double], sma25: Option[Double], sma75: Option[Double],
      sma200: Option[Double], dev25: Option[Double], dev75: Option[Double],
      dev200: Option[Double], aboveSma200: Option[Boolean],
      cross2575: Option[String], cross2575Age: Option[Int],
      rsi14: Option[Double], macd: Option[Double], macdSignal: Option[Double],
      macdHist: Option[Double], stochK: Option[Double], stochD: Option[Double],
      bbPercentB: Option[Double], bbBandwidth: Option[Double],
      atr14: Option[Double], atrPct: Option[Double],
      volRatio20: Option[Double], ichimokuState: Option[String])

  /** JS Math.round(n·10^d)/10^d (technical.ts:64-68). */
  def jsRound(n: Double, d: Int): Option[Double] = {
    if (n.isNaN || n.isInfinite) return None
    val f = math.pow(10, d)
    Some(math.floor(n * f + 0.5) / f)
  }
  private def jsRoundOpt(n: Option[Double], d: Int): Option[Double] =
    n.flatMap(jsRound(_, d))

  type Series = Array[Option[Double]]
  private def empty(n: Int): Series = Array.fill[Option[Double]](n)(None)

  /** Simple moving average with a running add/subtract accumulator —
    * the same accumulation order as the reference, so doubles agree
    * bit-for-bit (technical.ts:75-87). */
  def sma(values: Array[Double], period: Int): Series = {
    val out = empty(values.length)
    if (period <= 0) return out
    var sum = 0.0
    var i = 0
    while (i < values.length) {
      sum += values(i)
      if (i >= period) sum -= values(i - period)
      if (i >= period - 1) out(i) = Some(sum / period)
      i += 1
    }
    out
  }

  /** SMA over a nullable series; a window containing any None yields None
    * (technical.ts:90-103). */
  def smaNullable(values: Series, period: Int): Series = {
    val out = empty(values.length)
    if (period <= 0) return out
    var i = period - 1
    while (i < values.length) {
      var sum = 0.0
      var ok = true
      var j = i - period + 1
      while (ok && j <= i) {
        values(j) match {
          case Some(v) => sum += v
          case None => ok = false
        }
        j += 1
      }
      if (ok) out(i) = Some(sum / period)
      i += 1
    }
    out
  }

  /** Standard EMA seeded with the SMA of the first `period` values
    * (technical.ts:106-121). */
  def ema(values: Array[Double], period: Int): Series = {
    val out = empty(values.length)
    if (period <= 0 || values.length < period) return out
    val k = 2.0 / (period + 1)
    var seed = 0.0
    var i = 0
    while (i < period) { seed += values(i); i += 1 }
    seed /= period
    out(period - 1) = Some(seed)
    var prev = seed
    i = period
    while (i < values.length) {
      prev = values(i) * k + prev * (1 - k)
      out(i) = Some(prev)
      i += 1
    }
    out
  }

  private def rsiFrom(avgGain: Double, avgLoss: Double): Double =
    if (avgLoss == 0) { if (avgGain == 0) 50 else 100 }
    else if (avgGain == 0) 0
    else { val rs = avgGain / avgLoss; 100 - 100 / (1 + rs) }

  /** RSI with Wilder smoothing (technical.ts:130-152). */
  def rsi(closes: Array[Double], period: Int = 14): Series = {
    val out = empty(closes.length)
    if (closes.length <= period) return out
    var gainSum = 0.0
    var lossSum = 0.0
    var i = 1
    while (i <= period) {
      val ch = closes(i) - closes(i - 1)
      if (ch >= 0) gainSum += ch else lossSum -= ch
      i += 1
    }
    var avgGain = gainSum / period
    var avgLoss = lossSum / period
    out(period) = Some(rsiFrom(avgGain, avgLoss))
    i = period + 1
    while (i < closes.length) {
      val ch = closes(i) - closes(i - 1)
      val gain = if (ch > 0) ch else 0.0
      val loss = if (ch < 0) -ch else 0.0
      avgGain = (avgGain * (period - 1) + gain) / period
      avgLoss = (avgLoss * (period - 1) + loss) / period
      out(i) = Some(rsiFrom(avgGain, avgLoss))
      i += 1
    }
    out
  }

  final case class Macd(macd: Series, signal: Series, hist: Series)

  /** MACD = EMA(fast) − EMA(slow); signal = EMA over the *defined* slice of
    * the MACD line; hist = MACD − signal (technical.ts:160-178). */
  def macd(closes: Array[Double], fast: Int = 12, slow: Int = 26,
           signalPeriod: Int = 9): Macd = {
    val n = closes.length
    val ef = ema(closes, fast)
    val es = ema(closes, slow)
    val line = empty(n)
    var i = 0
    while (i < n) {
      (ef(i), es(i)) match {
        case (Some(a), Some(b)) => line(i) = Some(a - b)
        case _ =>
      }
      i += 1
    }
    val firstIdx = line.indexWhere(_.isDefined)
    val signal = empty(n)
    if (firstIdx >= 0) {
      val defined = line.drop(firstIdx).map(_.get)
      val sig = ema(defined, signalPeriod)
      var j = 0
      while (j < sig.length) { signal(firstIdx + j) = sig(j); j += 1 }
    }
    val hist = empty(n)
    i = 0
    while (i < n) {
      (line(i), signal(i)) match {
        case (Some(a), Some(b)) => hist(i) = Some(a - b)
        case _ =>
      }
      i += 1
    }
    Macd(line, signal, hist)
  }

  final case class Bollinger(mid: Series, upper: Series, lower: Series,
                             percentB: Series, bandwidth: Series)

  /** Bollinger bands with population σ; %B null when the band is flat,
    * bandwidth null when the mid is 0 (technical.ts:188-209). */
  def bollinger(closes: Array[Double], period: Int = 20,
                mult: Double = 2): Bollinger = {
    val n = closes.length
    val mid = sma(closes, period)
    val upper = empty(n); val lower = empty(n)
    val percentB = empty(n); val bandwidth = empty(n)
    var i = period - 1
    while (i < n) {
      val m = mid(i).get
      var sq = 0.0
      var j = i - period + 1
      while (j <= i) {
        val d = closes(j) - m
        sq += d * d
        j += 1
      }
      val sd = math.sqrt(sq / period)
      val u = m + mult * sd
      val l = m - mult * sd
      upper(i) = Some(u)
      lower(i) = Some(l)
      if (m != 0) bandwidth(i) = Some((u - l) / m)
      if (u != l) percentB(i) = Some((closes(i) - l) / (u - l))
      i += 1
    }
    Bollinger(mid, upper, lower, percentB, bandwidth)
  }

  final case class Stochastic(k: Series, d: Series)

  /** Slow stochastic: raw %K over (kPeriod) highs/lows, smoothed by
    * SMA(smooth); %D = SMA(dPeriod) of %K (technical.ts:216-240). */
  def stochastic(highs: Array[Double], lows: Array[Double],
                 closes: Array[Double], kPeriod: Int = 14, smooth: Int = 3,
                 dPeriod: Int = 3): Stochastic = {
    val n = closes.length
    val rawK = empty(n)
    var i = kPeriod - 1
    while (i < n) {
      var hh = Double.NegativeInfinity
      var ll = Double.PositiveInfinity
      var j = i - kPeriod + 1
      while (j <= i) {
        if (highs(j) > hh) hh = highs(j)
        if (lows(j) < ll) ll = lows(j)
        j += 1
      }
      if (hh != ll) rawK(i) = Some((closes(i) - ll) / (hh - ll) * 100)
      i += 1
    }
    val k = smaNullable(rawK, smooth)
    Stochastic(k, smaNullable(k, dPeriod))
  }

  /** ATR with Wilder smoothing; seed = mean of TR[1..period] placed at
    * index `period` (technical.ts:245-268). */
  def atr(highs: Array[Double], lows: Array[Double], closes: Array[Double],
          period: Int = 14): Series = {
    val n = closes.length
    val out = empty(n)
    if (n <= period) return out
    val tr = new Array[Double](n)
    tr(0) = highs(0) - lows(0)
    var i = 1
    while (i < n) {
      tr(i) = math.max(highs(i) - lows(i),
        math.max(math.abs(highs(i) - closes(i - 1)),
          math.abs(lows(i) - closes(i - 1))))
      i += 1
    }
    var sum = 0.0
    i = 1
    while (i <= period) { sum += tr(i); i += 1 }
    var prev = sum / period
    out(period) = Some(prev)
    i = period + 1
    while (i < n) {
      prev = (prev * (period - 1) + tr(i)) / period
      out(i) = Some(prev)
      i += 1
    }
    out
  }

  /** On-balance volume (technical.ts:271-279). */
  def obv(closes: Array[Double], volumes: Array[Double]): Array[Double] = {
    val out = new Array[Double](closes.length)
    var i = 1
    while (i < closes.length) {
      val dir = if (closes(i) > closes(i - 1)) 1
      else if (closes(i) < closes(i - 1)) -1 else 0
      out(i) = out(i - 1) + dir * volumes(i)
      i += 1
    }
    out
  }

  private def midline(highs: Array[Double], lows: Array[Double],
                      period: Int): Series = {
    val out = empty(highs.length)
    var i = period - 1
    while (i < highs.length) {
      var hh = Double.NegativeInfinity
      var ll = Double.PositiveInfinity
      var j = i - period + 1
      while (j <= i) {
        if (highs(j) > hh) hh = highs(j)
        if (lows(j) < ll) ll = lows(j)
        j += 1
      }
      out(i) = Some((hh + ll) / 2)
      i += 1
    }
    out
  }

  /** Ichimoku cloud position of the latest close: today's cloud is the
    * span computed `displacement` bars back (technical.ts:301-325). */
  def ichimokuState(highs: Array[Double], lows: Array[Double],
                    closes: Array[Double],
                    displacement: Int = 26): Option[String] = {
    val n = closes.length
    val idx = n - 1 - displacement
    if (idx < 0) return None
    val tenkan = midline(highs, lows, 9)
    val kijun = midline(highs, lows, 26)
    val senkouA = (tenkan(idx), kijun(idx)) match {
      case (Some(t), Some(kj)) => Some((t + kj) / 2)
      case _ => None
    }
    val senkouB = midline(highs, lows, 52)(idx)
    (senkouA, senkouB) match {
      case (Some(a), Some(b)) =>
        val top = math.max(a, b)
        val bot = math.min(a, b)
        val c = closes(n - 1)
        Some(if (c > top) "above" else if (c < bot) "below" else "inside")
      case _ => None
    }
  }

  /** Most recent short×long cross and its age in bars (0 = today)
    * (technical.ts:334-353). */
  def detectCross(short: Series, long: Series): Option[(String, Int)] = {
    val n = short.length
    var lastIdx = -1
    var crossType: String = null
    var prevSign = 0
    var i = 0
    while (i < n) {
      (short(i), long(i)) match {
        case (Some(sv), Some(lv)) =>
          val diff = sv - lv
          val sign = if (diff > 0) 1 else if (diff < 0) -1 else 0
          if (sign != 0 && prevSign != 0 && sign != prevSign) {
            lastIdx = i
            crossType = if (sign > 0) "golden" else "dead"
          }
          if (sign != 0) prevSign = sign
        case _ =>
      }
      i += 1
    }
    if (lastIdx < 0 || crossType == null) None else Some((crossType, n - 1 - lastIdx))
  }

  /** Latest-bar snapshot with the reference's per-field rounding digits
    * (technical.ts:361-410). */
  def snapshot(bars: Array[Bar]): Option[Snapshot] = {
    if (bars.isEmpty) return None
    val highs = bars.map(_.high)
    val lows = bars.map(_.low)
    val closes = bars.map(_.close)
    val vols = bars.map(_.volume)
    val n = closes.length
    val i = n - 1
    val close = closes(i)

    val s25 = sma(closes, 25)(i)
    val s75 = sma(closes, 75)(i)
    val s200 = sma(closes, 200)(i)
    def dev(m: Option[Double]): Option[Double] = m match {
      case Some(mv) if mv != 0 => jsRound((close - mv) / mv * 100, 2)
      case _ => None
    }

    val r = rsi(closes, 14)(i)
    val m = macd(closes, 12, 26, 9)
    val bb = bollinger(closes, 20, 2)
    val st = stochastic(highs, lows, closes, 14, 3, 3)
    val a14 = atr(highs, lows, closes, 14)(i)
    val cross = detectCross(sma(closes, 25), sma(closes, 75))
    val avgVol20 = sma(vols, 20)(i)

    Some(Snapshot(
      close = jsRound(close, 2),
      sma25 = jsRoundOpt(s25, 4), sma75 = jsRoundOpt(s75, 4),
      sma200 = jsRoundOpt(s200, 4),
      dev25 = dev(s25), dev75 = dev(s75), dev200 = dev(s200),
      aboveSma200 = s200.map(close > _),
      cross2575 = cross.map(_._1), cross2575Age = cross.map(_._2),
      rsi14 = jsRoundOpt(r, 2),
      macd = jsRoundOpt(m.macd(i), 4), macdSignal = jsRoundOpt(m.signal(i), 4),
      macdHist = jsRoundOpt(m.hist(i), 4),
      stochK = jsRoundOpt(st.k(i), 2), stochD = jsRoundOpt(st.d(i), 2),
      bbPercentB = jsRoundOpt(bb.percentB(i), 4),
      bbBandwidth = jsRoundOpt(bb.bandwidth(i), 4),
      atr14 = jsRoundOpt(a14, 4),
      atrPct = a14.flatMap(a => if (close != 0) jsRound(a / close * 100, 2) else None),
      volRatio20 = avgVol20.flatMap(av =>
        if (av != 0) jsRound(vols(i) / av, 3) else None),
      ichimokuState = ichimokuState(highs, lows, closes)))
  }
}
