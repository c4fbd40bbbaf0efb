package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for hot keys at scale (SURVEY §4: at 100 TB a
  * handful of hot entities — a stop-shingle, a mega-ticker — can stall a
  * shuffle; AQE's skew-join split handles sort-merge joins, these helpers
  * cover aggregations and broadcast-averse joins).
  *
  * Salting is deterministic here (hash of a tiebreak column, not rand()):
  * results stay reproducible run-to-run, which the oracle gate requires.
  */
object Skew {

  /** Two-phase salted aggregation: partial-aggregate on (key, salt), then
    * final-aggregate on key. For algebraic aggregates this is semantics-
    * preserving; `partialAggs`/`finalAggs` supply the two phases (e.g.
    * partial sum → final sum, partial count → final sum). */
  def saltedAgg(df: DataFrame, keyCols: Seq[String], saltCol: Column,
                buckets: Int, partialAggs: Seq[Column],
                finalAggs: Seq[Column]): DataFrame = {
    val salted = df.withColumn("__salt", pmod(hash(saltCol), lit(buckets)))
    val partial = salted
      .groupBy((keyCols.map(col) :+ col("__salt")): _*)
      .agg(partialAggs.head, partialAggs.tail: _*)
    partial.groupBy(keyCols.map(col): _*)
      .agg(finalAggs.head, finalAggs.tail: _*)
  }

  /** Salted replicate join for a skewed fact ⋈ small-ish dim that is still
    * too big to broadcast whole: fact rows get a deterministic salt in
    * [0, buckets); the dim is replicated `buckets` times with matching
    * salts so the shuffle spreads each hot key over `buckets` partitions. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, keyCols: Seq[String],
                 saltSource: Column, buckets: Int): DataFrame = {
    val saltedFact = fact.withColumn("__salt",
      pmod(hash(saltSource), lit(buckets)))
    val replicatedDim = dim.withColumn("__salt",
      explode(array((0 until buckets).map(lit): _*)))
    saltedFact.join(replicatedDim, keyCols :+ "__salt").drop("__salt")
  }
}
