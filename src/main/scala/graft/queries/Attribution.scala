package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Markov-chain attribution (removal effect; Anderl et al. 2016, the
  * standard data-driven alternative to last-touch): user journeys become
  * a first-order Markov chain over channels with absorbing CONV/DROP
  * states, and each channel's credit is how much the chain's conversion
  * probability falls when that channel is removed. Completes the
  * event-analytics family (q102 sessions, q103 funnel, q104 retention)
  * with the attribution member.
  */
object Attribution {

  /** Absorption-probability iterations — enough to converge the chain
    * far past the 2^-40 quantum on this state space; fixed so the
    * oracle unrolls. */
  val AttrIters = 24

  /** Value scale: probabilities are carried as floor-divided BIGINTs at
    * 2^40 (CONV ≡ 2^40) — every step is Σ c(i,j)·v(j) div n(i), exact
    * integer arithmetic in both engines, no floating point anywhere. */
  val AttrScale = 1L << 40

  /** q210 — removal-effect attribution: per channel, the chain's
    * absorption probability at START (scaled 2^40) with the full graph
    * vs with that channel removed (all its mass dropped).
    *
    * Journey semantics (mirrored exactly in the oracle): q102's gap
    * sessionization; each session truncates at its FIRST purchase
    * (inclusive — the purchase maps to CONV); transitions are
    * START → first event, consecutive events, and last → DROP for
    * non-converting sessions. Ties order by (ts, event_id).
    *
    * Scale shape: the DATA term is sessionize + transition counting —
    * two windows and one map-side-combined count over the events fact,
    * exactly how a billion-event journey extraction distributes. The
    * chain itself is channels²-bounded METADATA (the q184
    * driver-weights discipline): collected once (≤ ~30 rows), solved
    * on the driver with exact integer arithmetic, and re-emitted as a
    * channels-row result. */
  def q210MarkovAttribution(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val gapUs = AnalyticsQueries.SessionGapSec * 1000000L
    val wUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val flagged = Tables.events(s, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(wUser))
      .withColumn("new_sess",
        when(col("prev_us").isNull ||
          unix_micros(col("ts")) - col("prev_us") > gapUs, 1L).otherwise(0L))
      .withColumn("session_idx", sum(col("new_sess"))
        .over(wUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val wSess = Window.partitionBy(col("user_id"), col("session_idx"))
      .orderBy(col("ts"), col("event_id"))
    val wSessAll = Window.partitionBy(col("user_id"), col("session_idx"))
    val kept = flagged
      .withColumn("rn", row_number().over(wSess))
      .withColumn("pidx", min(when(col("event_type") === "purchase",
        col("rn"))).over(wSessAll))
      .filter(col("pidx").isNull || col("rn") <= col("pidx"))
      .withColumn("state", when(col("event_type") === "purchase",
        lit("CONV")).otherwise(col("event_type")))
      .withColumn("maxrn", max(col("rn")).over(wSessAll))
    val steps = kept
      .withColumn("src", coalesce(lag(col("state"), 1).over(wSess),
        lit("START")))
      .select(col("src"), col("state").as("dst"))
    val drops = kept
      .filter(col("pidx").isNull && col("rn") === col("maxrn"))
      .select(col("state").as("src"), lit("DROP").as("dst"))
    val counts = steps.union(drops)
      .groupBy(col("src"), col("dst")).agg(count(lit(1)).as("c"))
      .collect() // bounded: (channels + START)² + absorbers
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val channels = chainChannels(counts)
    val base = solveChain(counts, None)
    val rows = channels.map { ch =>
      val rem = solveChain(counts, Some(ch))
      (ch, base, rem, base - rem)
    }
    rows.toDF("channel", "conv_base", "conv_removed", "removal_effect")
      .orderBy(col("channel"))
  }

  private[graft] def chainChannels(
      counts: Map[(String, String), Long]): Seq[String] =
    counts.keySet.map(_._1).filter(_ != "START").toSeq.sorted

  /** Exact-integer absorption solve over the bounded chain: [[AttrIters]]
    * rounds of v(i) ← Σ c(i,j)·v(j) div n(i), v(CONV) ≡ [[AttrScale]],
    * v(DROP) ≡ 0, removed channel clamped to 0. */
  private[graft] def solveChain(counts: Map[(String, String), Long],
                                removed: Option[String]): Long = {
    val outDeg: Map[String, Long] =
      counts.groupBy(_._1._1).map { case (i, m) => i -> m.values.sum }
    val channels = chainChannels(counts)
    val transient = ("START" +: channels).filterNot(removed.contains)
    var v: Map[String, Long] = transient.map(_ -> 0L).toMap
    var t = 0
    while (t < AttrIters) {
      v = transient.map { i =>
        val num = counts.collect {
          case ((`i`, j), c) =>
            val vj =
              if (j == "CONV") AttrScale
              else if (j == "DROP" || removed.contains(j)) 0L
              else v.getOrElse(j, 0L)
            c * vj
        }.sum
        i -> num / outDeg.getOrElse(i,
          throw new IllegalStateException(
            s"solveChain: state '$i' has no outgoing transitions — " +
              "degenerate/empty journey input"))
      }.toMap
      t += 1
    }
    v("START")
  }

  lazy val oracleQ210: String = {
    val iters = (1 to AttrIters).map { t =>
      val prev = if (t == 1) "v0" else s"v${t - 1}"
      s"""v$t AS MATERIALIZED (
         |  SELECT ts.variant, ts.i,
         |    CAST(SUM(c.c * CASE
         |      WHEN c.dst = 'CONV' THEN $AttrScale
         |      WHEN c.dst = 'DROP' OR c.dst = ts.variant THEN 0
         |      ELSE coalesce(pv.v, 0) END) // od.n AS BIGINT) AS v
         |  FROM tstates ts
         |  JOIN cnts c ON c.src = ts.i
         |  JOIN outdeg od ON od.src = ts.i
         |  LEFT JOIN $prev pv ON pv.variant = ts.variant AND pv.i = c.dst
         |  GROUP BY ts.variant, ts.i, od.n)""".stripMargin
    }.mkString(",\n")
    s"""WITH f AS (
       |  SELECT user_id, ts, event_id, event_type,
       |    CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
       |         OR epoch_us(ts) - lag(epoch_us(ts)) OVER w
       |            > ${AnalyticsQueries.SessionGapSec * 1000000L}
       |      THEN 1 ELSE 0 END AS new_sess
       |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
       |), r AS (
       |  SELECT *, SUM(new_sess) OVER (
       |    PARTITION BY user_id ORDER BY ts, event_id
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_idx
       |  FROM f
       |), rr AS (
       |  SELECT *, row_number() OVER (PARTITION BY user_id, session_idx
       |      ORDER BY ts, event_id) AS rn
       |  FROM r
       |), px AS (
       |  SELECT *, MIN(CASE WHEN event_type = 'purchase' THEN rn END)
       |    OVER (PARTITION BY user_id, session_idx) AS pidx
       |  FROM rr
       |), kept AS MATERIALIZED (
       |  SELECT user_id, session_idx, rn, pidx,
       |    CASE WHEN event_type = 'purchase' THEN 'CONV'
       |         ELSE event_type END AS state,
       |    MAX(rn) OVER (PARTITION BY user_id, session_idx) AS maxrn
       |  FROM px WHERE pidx IS NULL OR rn <= pidx
       |), edges AS (
       |  SELECT coalesce(lag(state) OVER (PARTITION BY user_id, session_idx
       |      ORDER BY rn), 'START') AS src, state AS dst
       |  FROM kept
       |  UNION ALL
       |  SELECT state, 'DROP' FROM kept WHERE pidx IS NULL AND rn = maxrn
       |), cnts AS MATERIALIZED (
       |  SELECT src, dst, CAST(count(*) AS BIGINT) AS c
       |  FROM edges GROUP BY src, dst
       |), outdeg AS MATERIALIZED (
       |  SELECT src, CAST(SUM(c) AS BIGINT) AS n FROM cnts GROUP BY src
       |), chans AS (
       |  SELECT DISTINCT src AS ch FROM cnts WHERE src <> 'START'
       |), variants AS (
       |  SELECT 'base' AS variant
       |  UNION ALL SELECT ch FROM chans
       |), tstates AS MATERIALIZED (
       |  SELECT v.variant, s.i FROM variants v, (
       |    SELECT 'START' AS i
       |    UNION ALL SELECT ch FROM chans) s
       |  WHERE s.i <> v.variant
       |), v0 AS (
       |  SELECT variant, i, CAST(0 AS BIGINT) AS v FROM tstates
       |),
       |$iters
       |SELECT c.ch AS channel, b.v AS conv_base, x.v AS conv_removed,
       |  b.v - x.v AS removal_effect
       |FROM chans c
       |JOIN v$AttrIters b ON b.variant = 'base' AND b.i = 'START'
       |JOIN v$AttrIters x ON x.variant = c.ch AND x.i = 'START'
       |ORDER BY channel""".stripMargin
  }
}
