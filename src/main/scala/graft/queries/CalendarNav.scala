package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.BusinessDay

/** q60 — business-day navigation against a dense trading calendar
  * (business-day.ts:19-216 over trading_calendar, 00003:5-15), oracle-
  * gated: a generated 5-year dense calendar (weekends + New-Year holidays
  * non-business), probed at every distinct order date with next-business-
  * day, +3-day and −2-day shifts. Dates past the calendar's span resolve
  * to null (the off-calendar contract); [[BusinessDay.validateDense]]
  * runs as part of the query, exercising the dense-calendar guard. */
object CalendarNav {

  private val CalStart = java.sql.Date.valueOf("1995-01-01")
  private val CalEnd = java.sql.Date.valueOf("1999-12-31")

  def q60BusinessDayNav(s: SparkSession, dir: String): DataFrame = {
    val cal = s.range(1)
      .select(explode(sequence(lit(CalStart), lit(CalEnd)))
        .as("calendar_date"))
      .withColumn("is_business_day",
        !dayofweek(col("calendar_date")).isin(1, 7) &&
          !(month(col("calendar_date")) === 1 &&
            dayofmonth(col("calendar_date")) <= 3))
    BusinessDay.validateDense(cal)
    val probes = Tables.orders(s, dir)
      .select(to_date(col("o_orderdate")).as("d")).distinct()
    val n1 = BusinessDay.next(probes, "d", cal)
    val p3 = BusinessDay.addBusinessDays(n1, "d", cal, 3)
      .withColumnRenamed("shifted_day", "plus3_day")
    BusinessDay.addBusinessDays(p3, "d", cal, -2)
      .withColumnRenamed("shifted_day", "minus2_day")
      .orderBy(col("d"))
  }

  val oracleQ60: String =
    """WITH cal AS (
      |  SELECT CAST(gs AS DATE) AS cd,
      |    (dayofweek(gs) NOT IN (0, 6))
      |      AND NOT (month(gs) = 1 AND day(gs) <= 3) AS bd
      |  FROM generate_series(DATE '1995-01-01', DATE '1999-12-31',
      |                       INTERVAL 1 DAY) t(gs)
      |), idx AS (
      |  SELECT cd, ROW_NUMBER() OVER (ORDER BY cd) AS bi FROM cal WHERE bd
      |), spine AS (
      |  SELECT cd, SUM(CASE WHEN bd THEN 1 ELSE 0 END)
      |    OVER (ORDER BY cd ROWS UNBOUNDED PRECEDING) AS si
      |  FROM cal
      |), probes AS (
      |  SELECT DISTINCT CAST(o_orderdate AS DATE) AS d FROM orders
      |)
      |SELECT p.d,
      |  nb.cd AS next_business_day,
      |  p3.cd AS plus3_day,
      |  m2.cd AS minus2_day
      |FROM probes p
      |LEFT JOIN spine s ON s.cd = p.d
      |LEFT JOIN idx nb ON nb.bi = s.si + 1
      |LEFT JOIN idx p3 ON p3.bi = (CASE WHEN s.si > 0 THEN s.si END) + 3
      |LEFT JOIN idx m2 ON m2.bi = (CASE WHEN s.si > 0 THEN s.si END) - 2
      |ORDER BY p.d""".stripMargin
}
