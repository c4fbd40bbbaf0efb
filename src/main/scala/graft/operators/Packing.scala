package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for LLM pretraining batches: concatenate documents per
  * stratum in a canonical order and chunk the token stream into
  * fixed-length sequences — each document gets the pack (sequence) id and
  * offset where its first token lands.
  *
  * The core is a STRATIFIED DISTRIBUTED PREFIX SUM. The naive
  * `sum().over(Window.partitionBy(stratum).orderBy(id))` funnels every
  * stratum through ONE task — with a handful of languages over 100 TB
  * that is a single-reducer bottleneck (exactly the WindowExec
  * "moving all data to a single partition" trap). Instead the classic
  * two-phase scan: order-preserving buckets (`id div bucketWidth`) give
  * parallel local prefix sums; per-bucket totals (a few thousand rows)
  * take the only stratum-wide window; bucket offsets broadcast back.
  * Identical results to the single-window form — integer sums reassociate
  * exactly — at full cluster parallelism.
  */
object Packing {

  /** @param docs        input; one row per document
    * @param idCol       canonical order within a stratum (and bucket key)
    * @param stratCol    packing stratum (e.g. language) — streams never mix
    * @param tokensCol   per-document token count (non-negative integral)
    * @param seqLen      tokens per packed sequence
    * @param bucketWidth id-range width per prefix-sum bucket; size so one
    *                    bucket's rows fit one task (ids need not be dense —
    *                    sparse buckets just do less work)
    * @return input rows + `pack_id` (0-based sequence index the document
    *         starts in) and `pack_offset` (token offset within it) */
  def packSequences(docs: DataFrame, idCol: String, stratCol: String,
                    tokensCol: String, seqLen: Long,
                    bucketWidth: Long): DataFrame = {
    val bucket = expr(s"CAST($idCol AS BIGINT) div $bucketWidth")
    val wLocal = Window.partitionBy(col(stratCol), col("__b"))
      .orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = docs.withColumn("__b", bucket)
      .withColumn("__lp", sum(col(tokensCol)).over(wLocal))
    // bucket totals: map-side partial agg straight off the scan (only the
    // stratum/bucket/token columns are read), then the sole stratum-wide
    // window — over rows(strata × buckets), thousands, not billions
    val wOff = Window.partitionBy(col(stratCol)).orderBy(col("__b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = docs.withColumn("__b", bucket)
      .groupBy(col(stratCol), col("__b"))
      .agg(sum(col(tokensCol)).as("__bt"))
      .withColumn("__off", coalesce(sum(col("__bt")).over(wOff), lit(0L)))
      .select(col(stratCol), col("__b"), col("__off"))
    val start = col("__lp") + col("__off") - col(tokensCol) // exclusive prefix
    local.join(broadcast(offsets), Seq(stratCol, "__b"))
      .withColumn("pack_id", expr(s"(__lp + __off - $tokensCol) div $seqLen"))
      .withColumn("pack_offset", start % seqLen)
      .drop("__b", "__lp", "__off")
  }
}
