package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Japanese era (元号) date handling — the MOF JGB CSV scan parses 令和/平成/
  * 昭和 era dates into ISO (`src/lib/mof/client.ts:45-95`). Implemented as
  * pure Catalyst expressions (regexp + make_date), not a UDF, so it is
  * codegen'd and oracle-checkable.
  */
object EraDate {

  /** Era name → Gregorian year offset (era year 1 = offset + 1). */
  val eraOffsets: Seq[(String, Int)] = Seq(
    "令和" -> 2018, "平成" -> 1988, "昭和" -> 1925, "大正" -> 1911,
    "明治" -> 1867)

  /** Parse "令和6.3.15" / "平成31.4.1" style era dates to DateType; null for
    * unknown eras or malformed input. */
  def parseEraDate(s: Column): Column = {
    val era = regexp_extract(s, "^(令和|平成|昭和|大正|明治)", 1)
    val y = regexp_extract(s, "^(?:令和|平成|昭和|大正|明治)(\\d+)\\.", 1)
    val m = regexp_extract(s, "\\.(\\d+)\\.", 1)
    val d = regexp_extract(s, "\\.(\\d+)$", 1)
    val offset = eraOffsets.foldLeft(lit(null).cast("int")) { case (acc, (name, off)) =>
      when(era === name, lit(off)).otherwise(acc)
    }
    when(offset.isNotNull && y =!= "" && m =!= "" && d =!= "",
      make_date(offset + y.cast("int"), m.cast("int"), d.cast("int")))
  }

  /** Format a date as an era-date string (inverse of [[parseEraDate]];
    * eras ordered newest-first, boundary at the era's first Jan 1 —
    * calendar-exact era boundaries are the caller's concern, matching the
    * reference's year-granularity handling). */
  def formatEraDate(dt: Column): Column = {
    val yr = year(dt)
    val pick = eraOffsets.foldRight(lit(null).cast("string")) {
      case ((name, off), acc) =>
        when(yr > off, concat(lit(name), (yr - off).cast("string"),
          lit("."), month(dt).cast("string"),
          lit("."), dayofmonth(dt).cast("string"))).otherwise(acc)
    }
    pick
  }
}
