package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** The assembled bottom-up trailing-PER-bands program — the reference's
  * flagship single-call analytics RPC
  * (00116_create_bottomup_per_bands_rpc.sql:84-236), every documented
  * semantic preserved end-to-end:
  *
  *   1. price = coalesce(adj_close, close), rows kept only when that value
  *      is > 0 (an adj_close of 0 drops the row even if close is positive —
  *      the coalesce evaluation order is load-bearing, :13-16)
  *   2. FY actuals fold to the latest disclosure per (code, fiscal_year_end)
  *      ordered (disclosed_date DESC, disclosure_id ASC), and only THEN
  *      filter eps > 0 — a loss year is missing, never replaced by an older
  *      profitable disclosure (:17-23). eps IS NOT NULL is applied *before*
  *      the fold (it is part of the row-fetch condition, :20-22)
  *   3. trailing EPS per price row = "largest fiscal year disclosed so far":
  *      dense_rank FY ordinal + running max of struct(rank, eps) with the
  *      default RANGE frame so same-day disclosure peers are included
  *      (ROWS would split them, :136-139), then lead() → [eff_from, eff_to)
  *      validity spans (:146-153)
  *   4. fewer than 5 PER samples → the whole band block is NULL (:206-218)
  *   5. current_price = last adopted price row, returned even when no band
  *      can be computed (:25-27)
  *   6. forward_eps = head row by (fye DESC, disclosed_date DESC,
  *      disclosure_id ASC) — before the fold, before the eps>0 filter (:28-30)
  *
  * Scale shape: everything is windows/joins keyed on the entity code — no
  * self-join for the as-of (the reference rejects it for the same O(n²)
  * reason, :56-58); the per-code sorted sample array is bounded by the
  * price-history window, so collect_list is per-group-bounded, not
  * whole-column. Rounding is floor(x·100+0.5)/100 (JS Math.round parity,
  * :33-36) in IEEE doubles on both engines.
  *
  * Testdata mapping: orders = disclosures (custkey=code, order year=FY,
  * orderdate=disclosed_date, orderkey=disclosure_id, eps=totalprice−150000
  * with 'P'-status rows as NULL-eps, forecast=totalprice/10); lineitem
  * joined through orders = price series (shipdate=trade_date, adj_close
  * NULL for 'R' rows / 0 for 'A' rows, else extprice·(1−discount)).
  */
object PerBands {

  private val Cutoff = "1995-06-01"

  def q43PerBands(s: SparkSession, dir: String): DataFrame = {
    val orders = Tables.orders(s, dir)
    val li = Tables.lineitem(s, dir)
    val cust = Tables.customer(s, dir)

    val fy = orders.select(
        col("o_custkey").as("code"),
        year(to_date(col("o_orderdate"))).cast("string").as("fye"),
        to_date(col("o_orderdate")).as("disclosed_date"),
        col("o_orderkey").as("disclosure_id"),
        when(col("o_orderstatus") =!= "P", col("o_totalprice") - 150000.0).as("eps"),
        (col("o_totalprice") / 10.0).as("next_forecast_eps"))
      .filter(col("eps").isNotNull) // PostgREST-side fetch condition (:20-22)
    val wFye = Window.partitionBy(col("code"), col("fye"))
      .orderBy(col("disclosed_date").desc, col("disclosure_id").asc)
    val wCode = Window.partitionBy(col("code"))
      .orderBy(col("fye").desc, col("disclosed_date").desc, col("disclosure_id").asc)
    val numbered = fy
      .withColumn("rn_fye", row_number().over(wFye))
      .withColumn("rn_code", row_number().over(wCode))
    val fwd = numbered.filter(col("rn_code") === 1)
      .select(col("code").as("f_code"), col("next_forecast_eps").as("forward_eps"))
    // fold first, THEN eps > 0 (:17-23)
    val actuals = numbered.filter(col("rn_fye") === 1 && col("eps") > 0 &&
      col("fye").isNotNull && col("disclosed_date").isNotNull)

    val ranked = actuals.withColumn("fye_rank",
      dense_rank().over(Window.partitionBy(col("code")).orderBy(col("fye"))).cast("double"))
    // default RANGE frame: same-day disclosure peers share the running max
    val wRange = Window.partitionBy(col("code")).orderBy(col("disclosed_date"))
      .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    val runmax = ranked
      .withColumn("best", max(struct(col("fye_rank"), col("eps"))).over(wRange))
      .select(col("code").as("e_code"), col("disclosed_date").as("eff_from"),
        col("best.eps").as("t_eps"))
      .distinct()
    val effSpan = runmax.withColumn("eff_to",
      lead(col("eff_from"), 1).over(Window.partitionBy(col("e_code")).orderBy(col("eff_from"))))

    val adj = when(col("l_returnflag") === "R", lit(null).cast("double"))
      .when(col("l_returnflag") === "A", lit(0.0))
      .otherwise(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
    val px = li
      .join(orders.select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").as("code"), to_date(col("l_shipdate")).as("trade_date"),
        coalesce(adj, col("l_extendedprice")).as("price"),
        col("l_orderkey"), col("l_linenumber"))
      .filter(col("trade_date") >= lit(Cutoff).cast("date") && col("price") > 0)

    // price DESC as the final key: the synthetic lineitem has duplicate
    // (orderkey, linenumber) rows, so without it the ordering is not total
    // and the two engines may pick different rows (3/15k at sf0.1)
    val wCur = Window.partitionBy(col("code"))
      .orderBy(col("trade_date").desc, col("l_orderkey").desc,
        col("l_linenumber").desc, col("price").desc)
    val cur = px.withColumn("rn", row_number().over(wCur))
      .filter(col("rn") === 1)
      .select(col("code").as("c_code"), col("price").as("current_price"))

    val perRows = px.join(effSpan,
        col("code") === col("e_code") && col("trade_date") >= col("eff_from") &&
          (col("eff_to").isNull || col("trade_date") < col("eff_to")))
      .select(col("code"), col("trade_date"), (col("price") / col("t_eps")).as("per"))

    val bands = perRows.groupBy(col("code")).agg(
        count(lit(1)).as("n"),
        min(col("trade_date")).as("sample_from"),
        sort_array(collect_list(col("per"))).as("sorted"))
      .filter(col("n") >= 5)
    val med = when(col("n") % 2 === 1,
        element_at(col("sorted"), ((col("n") + 1) / 2).cast("int")))
      .otherwise((element_at(col("sorted"), (col("n") / 2).cast("int")) +
        element_at(col("sorted"), (col("n") / 2 + 1).cast("int"))) / 2.0)
    val stats = bands.select(
      col("code").as("s_code"), col("n"), col("sample_from"),
      (floor(element_at(col("sorted"), 1) * 100.0 + 0.5) / 100.0).as("per_min"),
      (floor(med * 100.0 + 0.5) / 100.0).as("per_median"),
      (floor(element_at(col("sorted"), col("n").cast("int")) * 100.0 + 0.5) / 100.0).as("per_max"))

    cust.select(col("c_custkey").as("code"))
      .join(stats, col("code") === col("s_code"), "left")
      .join(cur, col("code") === col("c_code"), "left")
      .join(fwd, col("code") === col("f_code"), "left")
      .select(col("code"), col("per_min"), col("per_median"), col("per_max"),
        col("n").cast("int").as("per_count"), col("sample_from"),
        col("current_price"), col("forward_eps"))
      .orderBy(col("code"))
  }

  val oracleQ43: String =
    s"""WITH fy AS (
      |  SELECT * FROM (
      |    SELECT o_custkey AS code,
      |      CAST(year(CAST(o_orderdate AS DATE)) AS VARCHAR) AS fye,
      |      CAST(o_orderdate AS DATE) AS disclosed_date,
      |      o_orderkey AS disclosure_id,
      |      CASE WHEN o_orderstatus != 'P' THEN o_totalprice - 150000.0 END AS eps,
      |      o_totalprice / 10.0 AS next_forecast_eps
      |    FROM orders) t
      |  WHERE eps IS NOT NULL
      |), numbered AS (
      |  SELECT *,
      |    row_number() OVER (PARTITION BY code, fye
      |      ORDER BY disclosed_date DESC, disclosure_id ASC) AS rn_fye,
      |    row_number() OVER (PARTITION BY code
      |      ORDER BY fye DESC, disclosed_date DESC, disclosure_id ASC) AS rn_code
      |  FROM fy
      |), fwd AS (
      |  SELECT code, next_forecast_eps FROM numbered WHERE rn_code = 1
      |), actuals AS (
      |  SELECT code, fye, disclosed_date, eps FROM numbered
      |  WHERE rn_fye = 1 AND eps > 0 AND fye IS NOT NULL AND disclosed_date IS NOT NULL
      |), ranked AS (
      |  SELECT code, disclosed_date, eps,
      |    CAST(dense_rank() OVER (PARTITION BY code ORDER BY fye) AS DOUBLE) AS fye_rank
      |  FROM actuals
      |), runmax AS (
      |  SELECT DISTINCT code, disclosed_date AS eff_from,
      |    max([fye_rank, eps]) OVER (PARTITION BY code ORDER BY disclosed_date) AS best
      |  FROM ranked
      |), eff_span AS (
      |  SELECT code, eff_from, best[2] AS t_eps,
      |    lead(eff_from) OVER (PARTITION BY code ORDER BY eff_from) AS eff_to
      |  FROM runmax
      |), px AS (
      |  SELECT * FROM (
      |    SELECT o.o_custkey AS code, CAST(l.l_shipdate AS DATE) AS trade_date,
      |      COALESCE(CASE WHEN l.l_returnflag = 'R' THEN NULL
      |                    WHEN l.l_returnflag = 'A' THEN 0.0
      |                    ELSE l.l_extendedprice * (1.0 - l.l_discount) END,
      |               l.l_extendedprice) AS price,
      |      l.l_orderkey, l.l_linenumber
      |    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey) t
      |  WHERE trade_date >= DATE '$Cutoff' AND price > 0
      |), cur AS (
      |  SELECT code, price AS current_price FROM (
      |    SELECT code, price, row_number() OVER (PARTITION BY code
      |      ORDER BY trade_date DESC, l_orderkey DESC, l_linenumber DESC, price DESC) AS rn
      |    FROM px) t WHERE rn = 1
      |), per_rows AS (
      |  SELECT px.code, px.trade_date, px.price / e.t_eps AS per
      |  FROM px JOIN eff_span e
      |    ON e.code = px.code AND px.trade_date >= e.eff_from
      |   AND (e.eff_to IS NULL OR px.trade_date < e.eff_to)
      |), bands AS (
      |  SELECT code, CAST(count(*) AS BIGINT) AS n, min(trade_date) AS sample_from,
      |    array_agg(per ORDER BY per) AS sorted
      |  FROM per_rows GROUP BY code
      |  HAVING count(*) >= 5
      |), stats AS (
      |  SELECT code, n, sample_from,
      |    floor(sorted[1] * 100.0 + 0.5) / 100.0 AS per_min,
      |    floor((CASE WHEN n % 2 = 1 THEN sorted[(n + 1) // 2]
      |                ELSE (sorted[n // 2] + sorted[n // 2 + 1]) / 2.0
      |           END) * 100.0 + 0.5) / 100.0 AS per_median,
      |    floor(sorted[n] * 100.0 + 0.5) / 100.0 AS per_max
      |  FROM bands
      |)
      |SELECT c.c_custkey AS code, s.per_min, s.per_median, s.per_max,
      |  CAST(s.n AS INT) AS per_count, s.sample_from,
      |  cur.current_price, fwd.next_forecast_eps AS forward_eps
      |FROM customer c
      |LEFT JOIN stats s ON s.code = c.c_custkey
      |LEFT JOIN cur ON cur.code = c.c_custkey
      |LEFT JOIN fwd ON fwd.code = c.c_custkey
      |ORDER BY code""".stripMargin
}
