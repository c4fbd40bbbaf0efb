package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Bucketed (hash-clustered) table layout — the storage-side answer to
  * repeated big×big joins at 100 TB. The reference re-joins
  * fundamentals×bars×technicals on the same entity key nightly
  * (00051_create_stock_screen_view.sql, 00108_refresh_stock_metrics);
  * at cluster scale each of those joins is a full shuffle of both sides
  * UNLESS the tables are written pre-clustered on the join key. Writing
  * both sides `bucketBy(n, key)` once makes every subsequent equi-join /
  * groupBy on that key shuffle-free: the scan itself reports
  * HashPartitioning(key, n) and Catalyst drops the Exchange on both sides
  * (and the post-join aggregation). This is Spark's native equivalent of
  * the co-located join; the write cost is one shuffle, amortized across
  * every downstream read.
  */
object Bucketed {

  /** Write `df` as a bucketed external table at `path`.
    *
    * The `repartition(nBuckets, key)` aligns write tasks with bucket ids
    * (repartition's HashPartitioning is the same murmur3 expression
    * bucketing uses), so each bucket gets exactly ONE file — without it
    * every write task emits a file per bucket (tasks×buckets small files,
    * an HDFS/S3 metadata bomb at scale) and per-file sort order cannot
    * serve the bucket-sorted read. */
  def writeBucketed(df: DataFrame, table: String, path: String,
                    bucketCol: String, nBuckets: Int): Unit =
    df.repartition(nBuckets, col(bucketCol))
      .write.mode(SaveMode.Overwrite)
      .option("path", path)
      .bucketBy(nBuckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table)

  /** APPEND a new file group to an existing bucketed table — the
    * generational-state write path: each append lands one more file per
    * bucket (Spark reads every file of a bucket into the same task, so
    * the scan still reports HashPartitioning and joins/groupBys on the
    * key stay Exchange-free), and the write cost is the APPENDED rows,
    * never the standing table. The bucketing spec must match the
    * table's; Spark rejects a mismatch loudly. */
  def appendBucketed(df: DataFrame, table: String,
                     bucketCol: String, nBuckets: Int): Unit =
    df.repartition(nBuckets, col(bucketCol))
      .write.mode(SaveMode.Append)
      .bucketBy(nBuckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table)

  /** Co-located equi-join of two tables bucketed on their join keys:
    * forced to sort-merge (`hint("merge")` — a broadcast pick would hide
    * the point at test scale) so the plan demonstrates the zero-Exchange
    * join the layout buys. */
  def colocatedJoin(s: SparkSession, leftTable: String, rightTable: String,
                    leftKey: String, rightKey: String): DataFrame =
    s.table(leftTable)
      .join(s.table(rightTable).hint("merge"),
        col(leftKey) === col(rightKey))
}
