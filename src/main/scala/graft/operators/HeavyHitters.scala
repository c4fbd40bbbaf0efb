package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Exact frequent-item mining at scale via Misra-Gries candidate pruning
  * (Misra & Gries 1982; the MG summary underlying every modern heavy-
  * hitters system). Finds every item with frequency > N/k EXACTLY, without
  * ever shuffling the full item stream:
  *
  * 1. Per-partition MG pass (mapPartitions, k counters, O(1) amortized per
  *    item): if item p's GLOBAL count exceeds N/k, then on at least one
  *    partition its LOCAL count exceeds n_p/k (pigeonhole over
  *    Σn_p = N), and an MG summary of size k provably retains every item
  *    with local frequency > n_p/k — so the union of per-partition
  *    candidates is a SUPERSET of the true heavy hitters.
  * 2. Exact recount of candidates only: the candidate set (≤ k ×
  *    partitions rows) broadcasts back as a semi-join filter; the exact
  *    counts + the N/k threshold then yield the exact answer.
  *
  * The only shuffles are candidate-sized; the item stream itself is
  * touched by two map-side passes (MG mine, filtered recount). At 100 TB
  * this is the standard sketch-then-verify shape: approximate pass to
  * bound the candidate set, exact pass bounded by it — same discipline as
  * the LSH→Jaccard and MG-df pipelines elsewhere in this repo.
  */
object HeavyHitters {

  /** Per-partition Misra-Gries candidate items (k counters). Exposed for
    * the spec's superset-guarantee test. */
  def mgCandidates(items: Dataset[String], k: Int): DataFrame = {
    import items.sparkSession.implicits._
    require(k >= 2, s"k must be >= 2, got $k")
    items.mapPartitions { it =>
      val counters = scala.collection.mutable.HashMap.empty[String, Long]
      it.foreach { x =>
        counters.get(x) match {
          case Some(c) => counters(x) = c + 1
          case None if counters.size < k - 1 => counters(x) = 1L
          case None =>
            // decrement-all: the MG step that charges the new item plus
            // k-1 survivors one occurrence each
            val dead = counters.iterator
              .collect { case (key, 1L) => key }.toList
            counters.mapValuesInPlace((_, c) => c - 1)
            dead.foreach(counters.remove)
        }
      }
      counters.keysIterator
    }.toDF("item").distinct()
  }

  /** All items with exact frequency strictly greater than N/k, with their
    * exact counts: MG candidate mine → broadcast semi-join → exact
    * recount → threshold. */
  def frequentItems(items: Dataset[String], k: Int): DataFrame = {
    val total = items.count()
    val candidates = mgCandidates(items, k)
    items.toDF("item")
      .join(broadcast(candidates), Seq("item"), "left_semi")
      .groupBy(col("item"))
      .agg(count(lit(1)).as("cnt"))
      // cnt > N/k without division: cnt * k > N in exact integers
      .filter(col("cnt") * lit(k.toLong) > lit(total))
  }
}
