package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, MapType, StringType}

import graft.Tables
import graft.functions.jsRound

/** q200: config-driven composite scoring — the reference's `jsonb`
  * score-definition registry re-expressed as Spark JSON/Map machinery
  * (`00115_create_basket_score_daily.sql:49-56,79-82`: an `axis_config`
  * jsonb document defines axes with weights and an `in_history` flag;
  * per-row `axes` jsonb maps short keys to nullable scores; the engine
  * renormalizes the weights over the axes actually present and labels
  * the composite via a `label_thresholds` jsonb map).
  *
  * Spark mapping — the whole scoring engine is COLUMN EXPRESSIONS:
  * - the config document is ONE literal string parsed per row by
  *   `from_json` into `array<struct<key,sk,weight,in_history>>` (the
  *   registry is version-keyed and tiny — a broadcast in spirit; as a
  *   literal it constant-folds, costing nothing per row);
  * - per-row axis scores round-trip `to_json`/`from_json` as
  *   `map<string,double>` (proving the jsonb column mapping the VERDICT
  *   flagged — Spark's shortest-roundtrip double printing makes the trip
  *   bit-exact);
  * - renormalization is a higher-order `filter` + ascending-order
  *   `aggregate` fold over the config array — map-side, codegen'd, no
  *   join and no extra shuffle: the only exchange in the plan is the
  *   one keyed aggregation building the per-(basket, month) stats.
  *
  * FP parity: axis scores are exact count ratios quantized to the 1e-6
  * grid (jsRound after the division), weights are integers, and the
  * weighted sum folds in fixed config order — the oracle replays the
  * identical left-associated sum, so the composite is bit-identical.
  * The `b` axis is declared `in_history=false` (the reference's
  * PIT-unreconstructable bottomup axis) and must be skipped; the `n`
  * axis goes null under a minimum-support guard, exercising the
  * renormalization path (weight 70 vs 75).
  */
object ConfigScore {

  /** Axis registry document — the analog of `axis_config` jsonb. Order
    * matters: the composite folds in array order. */
  val AxisConfigJson: String =
    """[{"key":"valuation","sk":"v","weight":35,"in_history":true},
      |{"key":"bottomup","sk":"b","weight":25,"in_history":false},
      |{"key":"relative","sk":"r","weight":20,"in_history":true},
      |{"key":"creditflow","sk":"c","weight":15,"in_history":true},
      |{"key":"nav","sk":"n","weight":5,"in_history":true}]""".stripMargin

  /** Label thresholds — the analog of `label_thresholds` jsonb. */
  val ThresholdsJson: String = """{"undervalued":65.0,"overvalued":35.0}"""

  /** Orders below this per (segment, month) null the `n` axis — the
    * reference's data-insufficiency rule. */
  val MinSupport = 20L

  def q200ConfigScore(s: SparkSession, dir: String): DataFrame = {
    val stats = Tables.orders(s, dir)
      .join(Tables.customer(s, dir).select(col("c_custkey"), col("c_mktsegment")),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment").as("basket"),
        date_format(col("o_orderdate"), "yyyy-MM").as("month"))
      .agg(count(lit(1)).as("n_orders"),
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
          .otherwise(0L)).as("n_urgent"),
        sum(when(col("o_totalprice").cast("decimal(12,2)") > 150000, 1L)
          .otherwise(0L)).as("n_big"),
        sum(when(col("o_orderstatus") === "O", 1L).otherwise(0L)).as("n_open"),
        sum(when(dayofmonth(col("o_orderdate")) <= 15, 1L).otherwise(0L))
          .as("n_early"))
    def share(n: String) =
      jsRound(lit(100.0) * col(n).cast("double") / col("n_orders").cast("double"), 6)
    // jsonb round trip: REAL to_json -> from_json of the nullable map,
    // exactly the column shape the reference stores
    val axesJson = stats
      .withColumn("axes_json", to_json(map(
        lit("v"), share("n_urgent"),
        lit("r"), share("n_big"),
        lit("b"), lit(null).cast("double"),
        lit("c"), share("n_open"),
        lit("n"), when(col("n_orders") >= MinSupport, share("n_early")))))
      .withColumn("axes", from_json(col("axes_json"), MapType(StringType, DoubleType)))
    val cfg = from_json(lit(AxisConfigJson),
      org.apache.spark.sql.types.DataType.fromDDL(
        "array<struct<key:string,sk:string,weight:int,in_history:boolean>>"))
    val th = from_json(lit(ThresholdsJson), MapType(StringType, DoubleType))
    val active = filter(cfg, a =>
      a.getField("in_history") && element_at(col("axes"), a.getField("sk")).isNotNull)
    val wTot = aggregate(active, lit(0),
      (acc, a) => acc + a.getField("weight"))
    val wSum = aggregate(active, lit(0.0).cast("double"), (acc, a) =>
      acc + a.getField("weight").cast("double")
        * element_at(col("axes"), a.getField("sk")))
    axesJson
      .withColumn("weight_used", wTot)
      .withColumn("composite",
        when(wTot > 0, jsRound(wSum / wTot.cast("double"), 1)))
      .withColumn("label",
        when(col("composite").isNull, "insufficient")
          .when(col("composite") >= element_at(th, "undervalued"), "undervalued")
          .when(col("composite") <= element_at(th, "overvalued"), "overvalued")
          .otherwise("neutral"))
      .select(col("basket"), col("month"), col("n_orders"),
        element_at(col("axes"), "v").as("v_axis"),
        col("weight_used"), col("composite"), col("label"))
      .orderBy(col("basket"), col("month"))
  }

  /** Direct arithmetic replay — the JSON round trip and the config-array
    * fold must be observationally identical to computing the renormalized
    * composite straight from the aggregates, in the same fold order
    * (v, r, c, n — `b` excluded by in_history, `n` by the support
    * guard). */
  val oracleQ200: String =
    s"""WITH st AS (
       |  SELECT c_mktsegment AS basket,
       |    strftime(o_orderdate, '%Y-%m') AS month,
       |    CAST(count(*) AS BIGINT) AS n_orders,
       |    CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
       |      THEN 1 ELSE 0 END) AS BIGINT) AS n_urgent,
       |    CAST(SUM(CASE WHEN CAST(o_totalprice AS DECIMAL(12,2)) > 150000
       |      THEN 1 ELSE 0 END) AS BIGINT) AS n_big,
       |    CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END)
       |      AS BIGINT) AS n_open,
       |    CAST(SUM(CASE WHEN day(o_orderdate) <= 15 THEN 1 ELSE 0 END)
       |      AS BIGINT) AS n_early
       |  FROM orders JOIN customer ON o_custkey = c_custkey
       |  GROUP BY 1, 2
       |), ax AS (
       |  SELECT basket, month, n_orders,
       |    floor(100.0 * n_urgent / n_orders * 1e6 + 0.5) / 1e6 AS v,
       |    floor(100.0 * n_big / n_orders * 1e6 + 0.5) / 1e6 AS r,
       |    floor(100.0 * n_open / n_orders * 1e6 + 0.5) / 1e6 AS c,
       |    CASE WHEN n_orders >= $MinSupport
       |      THEN floor(100.0 * n_early / n_orders * 1e6 + 0.5) / 1e6
       |    END AS n
       |  FROM st
       |), sc AS (
       |  SELECT basket, month, n_orders, v,
       |    70 + CASE WHEN n IS NULL THEN 0 ELSE 5 END AS weight_used,
       |    floor((35*v + 20*r + 15*c + coalesce(5*n, 0))
       |      / (70 + CASE WHEN n IS NULL THEN 0 ELSE 5 END) * 10 + 0.5) / 10
       |      AS composite
       |  FROM ax
       |)
       |SELECT basket, month, n_orders, v AS v_axis,
       |  CAST(weight_used AS INT) AS weight_used, composite,
       |  CASE WHEN composite IS NULL THEN 'insufficient'
       |       WHEN composite >= 65.0 THEN 'undervalued'
       |       WHEN composite <= 35.0 THEN 'overvalued'
       |       ELSE 'neutral' END AS label
       |FROM sc
       |ORDER BY basket, month""".stripMargin
}
