package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) multi-dimensional layout clustering — the data-layout
  * primitive behind multi-column data skipping (Delta OPTIMIZE ZORDER BY,
  * Hudi/Iceberg z-ordering): interleave the bits of several bounded integer
  * dimension keys so that range-partitioning by the single interleaved key
  * co-locates rows that are close in EVERY dimension, giving each output
  * file a small min/max rectangle that scan-time zone-map pruning can skip.
  *
  * Everything here is exact integer bit arithmetic expressed as Catalyst
  * column expressions (shift/and/or — whole-stage-codegen'd), so the same
  * unrolled expression replays bit-identically in an oracle SQL engine.
  *
  * At 100 TB the shape is: one map-side projection computing the z-key,
  * one `repartitionByRange` on it (a sampled range exchange — the same
  * machinery as a global sort, no single reducer), then a partitioned
  * write. Nothing quadratic, nothing driver-side.
  */
object ZOrder {

  /** Bits per dimension: two 16-bit dims → a 32-bit z-key. */
  val Bits = 16

  /** Interleave the low [[Bits]] bits of two non-negative integer columns:
    * bit k of `a` lands at position 2k, bit k of `b` at 2k+1. */
  def interleave2(a: Column, b: Column): Column =
    (0 until Bits).map { k =>
      shiftleft(shiftright(a, k).bitwiseAND(lit(1L)), 2 * k)
        .bitwiseOR(shiftleft(shiftright(b, k).bitwiseAND(lit(1L)), 2 * k + 1))
    }.reduce(_.bitwiseOR(_))

  /** The identical expression as oracle SQL text (for gate replay): the
    * generated string has exactly the same operator structure. */
  def interleave2Sql(a: String, b: String): String =
    (0 until Bits).map { k =>
      s"(((($a >> $k) & 1) << ${2 * k}) | ((($b >> $k) & 1) << ${2 * k + 1}))"
    }.mkString("(", " | ", ")")

  /** Cluster `df` by the z-order of two prepared dimension-key columns:
    * range-partition into `numFiles` groups on the interleaved key (each
    * output partition = one would-be file with a tight 2-D bounding box).
    */
  def cluster(df: DataFrame, dimA: Column, dimB: Column,
              numFiles: Int): DataFrame =
    df.withColumn("__zkey", interleave2(dimA, dimB))
      .repartitionByRange(numFiles, col("__zkey"))
      .sortWithinPartitions(col("__zkey"))
}
