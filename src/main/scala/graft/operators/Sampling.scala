package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data curation: language/source
  * rebalancing and reproducible splits over a 100 TB corpus.
  *
  * Everything is HASH-based — sample membership is a pure function of the
  * row id, so draws are reproducible across clusters, restarts, and
  * engines (no RNG state, no seed-per-partition coupling), and membership
  * is STABLE under incremental appends: a document's fate never changes
  * when other documents arrive, unlike count-based reservoir schemes.
  * This is the property an incremental nightly corpus build actually
  * needs — yesterday's sampled shard is still exactly right today.
  */
object Sampling {

  /** md5-derived per-mille bucket of an id column: uniform in [0, 1000).
    * First 60 bits of md5 of the id's decimal string — the same
    * construction as [[graft.functions.Text.hash60]], so a DuckDB oracle
    * reproduces it bit-for-bit. */
  def hashBucketPermille(id: Column): Column =
    conv(substring(md5(id.cast("string").cast("binary")), 1, 15), 16, 10)
      .cast("long") % 1000

  /** Stratified hash sample: keep a row iff its id bucket falls below its
    * stratum's per-mille rate. Rates ship as a small broadcast dim (the
    * idiom for per-stratum config at scale — no driver loop, no UDF);
    * strata absent from the map keep `defaultPermille`.
    *
    * Scale shape: one broadcast hash join + a codegen'd filter — zero
    * shuffles, and the filter sits directly over the scan so column
    * pruning and partition pruning pass straight through. */
  def stratifiedHash(df: DataFrame, idCol: String, stratCol: String,
                     permille: Map[String, Int],
                     defaultPermille: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val rates = permille.toSeq.toDF(stratCol, "__permille")
    df.join(broadcast(rates), Seq(stratCol), "left")
      .withColumn("__permille",
        coalesce(col("__permille"), lit(defaultPermille)))
      .filter(hashBucketPermille(col(idCol)) < col("__permille"))
      .drop("__permille")
  }

  /** Deterministic shard assignment + within-shard ordering for writing
    * training shards: shard = hash60(id) % nShards, pos = dense 0-based
    * rank within the shard ordered by (hash, id). Together these are a
    * reproducible global shuffle of the corpus — the training-order
    * randomization — as a pure function of the ids: no RNG state, no
    * seed/partition coupling, bit-identical across engines and re-runs.
    * Shard MEMBERSHIP is append-stable (a doc's shard never changes);
    * dense positions inherently are not.
    *
    * Scale shape: exactly one shuffle (hash partitioning on shard) and a
    * per-shard sort. Choose nShards so one shard ≈ one output file (tens
    * of thousands at 100 TB): the sort stays file-sized, never global,
    * and the write needs no further repartition. */
  def shardAssign(df: DataFrame, idCol: String, nShards: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val h = conv(substring(md5(col(idCol).cast("string").cast("binary")),
      1, 15), 16, 10).cast("long")
    df.withColumn("__h", h)
      .withColumn("shard", (col("__h") % nShards).cast("int"))
      .withColumn("pos", (row_number().over(
        Window.partitionBy(col("shard")).orderBy(col("__h"), col(idCol)))
        - 1).cast("long"))
      .drop("__h")
  }

  /** EXACT class rebalancing: downsample every stratum to the minority
    * stratum's count, deterministically — rank each row within its
    * stratum by (md5 hash, id) and keep rank ≤ min-count. Unlike
    * [[stratifiedHash]] (fixed configured rates, approximate counts),
    * the draw here is computed FROM the data and lands each class on
    * exactly the same count — the class-balance contract a fine-tuning
    * set or eval suite needs.
    *
    * Determinism is the same hash-order story as [[shardAssign]]: the
    * kept set is a pure function of the ids (no RNG), though unlike the
    * rate-based draw it is NOT append-stable — new arrivals can displace
    * ranks, which is inherent to any exact-count contract.
    *
    * Scale shape: one count aggregation (rows = |strata|, min taken via
    * a broadcast scalar), one window rank per stratum (the unavoidable
    * cost of exactness — rate-based [[stratifiedHash]] is the zero-
    * shuffle alternative when ±1% counts are acceptable). */
  def balanceToMinority(df: DataFrame, idCol: String,
                        stratCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = df.groupBy(col(stratCol)).agg(count(lit(1)).as("__cnt"))
    val minCnt = counts.agg(min(col("__cnt")).as("__m"))
    val h = conv(substring(md5(concat(lit("rb:"),
      col(idCol).cast("string")).cast("binary")), 1, 15), 16, 10)
      .cast("long")
    df.withColumn("__rk", row_number().over(
        Window.partitionBy(col(stratCol)).orderBy(h, col(idCol))))
      .crossJoin(broadcast(minCnt))
      .filter(col("__rk") <= col("__m"))
      .drop("__rk", "__m")
  }
}
