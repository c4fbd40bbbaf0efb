package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** The fins-summary cleanse discipline (fins-summary.ts:77-163): a wide
  * (~50-column) explicit field-by-field mapping where every numeric-as-text
  * field goes through the same normalization — empty string → null, else
  * cast to a number — with nulls preserved, never defaulted to 0.
  *
  * [[emptyToNullNumeric]] is the reusable operator: one `select` with a
  * per-column codegen'd expression (`nullif(trim(c),'') :: double`) — a
  * single narrow map stage, no shuffle, no UDF, column-pruned at the scan.
  *
  * q46 demonstrates it over a 50-column numeric-as-text surface derived
  * deterministically from `part` (some cells blanked, some null, mirroring
  * real fins payloads where either appears); the DuckDB oracle is generated
  * from the same column constants so the two sides cannot drift.
  */
object Cleanse {

  /** ""(after trim) → null, else cast to double; non-listed columns pass
    * through untouched. The whole map is one codegen'd projection. */
  def emptyToNullNumeric(df: DataFrame, cols: Seq[String]): DataFrame = {
    val cleaned = df.columns.map { c =>
      if (cols.contains(c)) nullif(trim(col(c)), lit("")).cast("double").as(c)
      else col(c)
    }
    df.select(cleaned.toIndexedSeq: _*)
  }

  private val NumCols = 50

  /** The derived wide raw frame: 50 numeric-as-text columns from `part`,
    * with cell (p_partkey + i) % 7 == 0 blanked ("  " — also exercises the
    * trim), % 11 == 3 null, else the formatted integer floor(retail) + i. */
  private def rawWide(s: SparkSession, dir: String): DataFrame = {
    val p = Tables.part(s, dir)
    val cols: Seq[Column] = (0 until NumCols).map { i =>
      val sel = (col("p_partkey") + i) % 7
      val sel11 = (col("p_partkey") + i) % 11
      when(sel === 0, lit("  "))
        .when(sel11 === 3, lit(null).cast("string"))
        .otherwise((floor(col("p_retailprice")) + i).cast("long").cast("string"))
        .as(f"f$i%02d")
    }
    p.select(col("p_partkey") +: cols: _*)
  }

  def q46FinsCleanse(s: SparkSession, dir: String): DataFrame = {
    val names = (0 until NumCols).map(i => f"f$i%02d")
    emptyToNullNumeric(rawWide(s, dir), names)
      .orderBy(col("p_partkey"))
  }

  val oracleQ46: String = {
    val exprs = (0 until NumCols).map { i =>
      val name = f"f$i%02d"
      s"""CAST(nullif(trim(CASE WHEN (p_partkey + $i) % 7 = 0 THEN '  '
         |    WHEN (p_partkey + $i) % 11 = 3 THEN NULL
         |    ELSE CAST(CAST(floor(p_retailprice) + $i AS BIGINT) AS VARCHAR) END), '') AS DOUBLE) AS $name"""
        .stripMargin
    }.mkString(",\n  ")
    s"""SELECT p_partkey,
       |  $exprs
       |FROM part
       |ORDER BY p_partkey""".stripMargin
  }
}
