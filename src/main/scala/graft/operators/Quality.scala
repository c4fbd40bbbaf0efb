package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality validation (the Deequ-shaped contract check
  * every ingestion pipeline runs before publishing): a rule set is a list
  * of (name, validity predicate); the report is one row per rule with
  * exact violation counts and rates.
  *
  * Scale shape: ALL rules evaluate in ONE scan — each rule becomes a
  * conditional-count aggregate in a single global aggregation (map-side
  * partials do the counting; one tiny merged row crosses the wire), and
  * the per-rule rows are unpivoted from that single row driver-side-free
  * via stack. N rules never cost N scans. Null predicate results count as
  * violations (a rule that cannot evaluate is a failed rule, not a pass).
  */
object Quality {

  /** One row per rule: rule, n_rows, n_violations, violation_rate. */
  def validate(df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty)
    val aggs = count(lit(1)).as("__n") +:
      rules.zipWithIndex.map { case ((_, pred), i) =>
        sum(when(coalesce(pred, lit(false)), 0L).otherwise(1L)).as(s"__v$i")
      }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = rules.zipWithIndex
      .map { case ((name, _), i) => s"'${name.replace("'", "''")}', __v$i" }
      .mkString(", ")
    one.select(
        expr(s"stack(${rules.size}, $stackArgs) as (rule, n_violations)"),
        col("__n").as("n_rows"))
      .select(col("rule"), col("n_rows"),
        coalesce(col("n_violations"), lit(0L)).as("n_violations"),
        (coalesce(col("n_violations"), lit(0L)).cast("double")
          / col("n_rows").cast("double")).as("violation_rate"))
  }
}
