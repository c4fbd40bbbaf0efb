package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** SCD Type 2 dimension maintenance — the equity_master history model
  * (`00010_equity_master_scd_type2.sql:18-53`; sync logic
  * `src/lib/jquants/endpoints/equity-master.ts:438-607`): rows carry
  * `[valid_from, valid_to)` plus `is_current`, and a daily full snapshot is
  * merged by diffing against the current set.
  *
  * Spark-first: the merge is a full-outer diff of two snapshots + a union
  * rewrite (no MERGE INTO needed). The invariant preserved from the
  * reference (`equity-master.ts:564-575`): close-then-insert, and at most
  * one `is_current` row per key, even under re-runs (the merge is
  * idempotent — re-merging the same snapshot changes nothing).
  */
object Scd2 {

  /** Merge a new full snapshot into SCD2 history.
    *
    * @param history  existing SCD2 rows: key ++ attrs ++ (valid_from,
    *                 valid_to, is_current)
    * @param snapshot today's full snapshot: key ++ attrs
    * @param keyCols  natural-key columns
    * @param attrCols tracked attribute columns
    * @param asOf     effective date of the snapshot
    */
  def merge(history: DataFrame, snapshot: DataFrame, keyCols: Seq[String],
            attrCols: Seq[String], asOf: java.sql.Date): DataFrame = {
    val current = history.filter(col("is_current"))
    val closed = history.filter(!col("is_current"))

    // rename every snapshot column before joining so the merge stays
    // unambiguous even when the snapshot shares lineage with the history
    // (e.g. re-merging the output of a previous merge)
    val scols = keyCols ++ attrCols
    val snap = snapshot.select(scols.map(c => col(c).as(s"__s_$c")): _*)
    val attrsEqual = attrCols
      .map(a => col(a) <=> col(s"__s_$a"))
      .reduce(_ && _)
    val joinCond = keyCols.map(k => col(k) === col(s"__s_$k")).reduce(_ && _)
    val j = current.join(snap, joinCond, "full_outer")

    val histCols = current.columns.map(col)
    val snapAsHist = scols.map(c => col(s"__s_$c").as(c))
    val inBoth = col(keyCols.head).isNotNull && col(s"__s_${keyCols.head}").isNotNull

    // unchanged: attrs equal → keep current row as-is
    val unchanged = j.filter(inBoth && attrsEqual).select(histCols: _*)

    // changed: close old row at asOf, open new row
    val changedOld = j.filter(inBoth && !attrsEqual)
      .select(histCols: _*)
      .withColumn("valid_to", lit(asOf))
      .withColumn("is_current", lit(false))
    val changedNew = j.filter(inBoth && !attrsEqual)
      .select(snapAsHist: _*)
      .withColumn("valid_from", lit(asOf))
      .withColumn("valid_to", lit(null).cast("date"))
      .withColumn("is_current", lit(true))

    // new listing: in snapshot only
    val added = j.filter(col(keyCols.head).isNull)
      .select(snapAsHist: _*)
      .withColumn("valid_from", lit(asOf))
      .withColumn("valid_to", lit(null).cast("date"))
      .withColumn("is_current", lit(true))

    // delisted: in current only → close (anti-join detect,
    // equity-master.ts:523-530)
    val delisted = j.filter(col(s"__s_${keyCols.head}").isNull &&
        col(keyCols.head).isNotNull)
      .select(histCols: _*)
      .withColumn("valid_to", lit(asOf))
      .withColumn("is_current", lit(false))

    closed
      .unionByName(unchanged)
      .unionByName(changedOld)
      .unionByName(changedNew)
      .unionByName(added)
      .unionByName(delisted)
  }

  /** Point-in-time lookup: the dimension row valid at `at` per key —
    * `valid_from <= at < coalesce(valid_to, ∞)`. */
  def asOfLookup(history: DataFrame, at: Column): DataFrame =
    history.filter(col("valid_from") <= at &&
      (col("valid_to").isNull || at < col("valid_to")))
}
