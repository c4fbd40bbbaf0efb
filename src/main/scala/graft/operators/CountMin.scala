package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Text

/** Count-Min sketch (Cormode & Muthukrishnan 2005) — the frequency-
  * estimation member of the repo's mergeable-sketch family (HLL q82 for
  * cardinality, DDSketch-style histogram q90 for quantiles, Bloom q97 for
  * membership, Misra-Gries q111 for heavy hitters): per group the state
  * is a fixed [[Depth]]×[[Width]] counter grid that partial aggregation
  * combines map-side (counter grids add), so frequency monitoring over
  * 100 TB costs one tiny (i, bucket)-keyed shuffle of a
  * vocabulary-independent register table; the point estimate for any key
  * is min over rows — an overestimate by construction (collisions only
  * ADD), within εN with probability 1-δ for w = ⌈e/ε⌉, d = ⌈ln 1/δ⌉.
  *
  * Exactness contract (what makes it oracle-gateable): row hashes are the
  * repo's md5 [[Text.hash60]] over `"i:" + token` reduced mod [[Width]] —
  * pure integer math both engines replay — and registers are exact long
  * sums, so the gate pins the register state and the estimates
  * bit-identically, not "within a few percent".
  */
object CountMin {

  /** d = 4 rows → δ = e⁻⁴ ≈ 1.8%. */
  val Depth = 4

  /** w = 256 buckets → ε = e/256 ≈ 1.1% of total count. */
  val Width = 256

  /** Row-i bucket of a token: hash60("i:" + tok) mod w (hash60 is
    * nonnegative, so % is already a proper mod). */
  def bucketCol(tok: Column, i: Int): Column =
    Text.hash60(concat(lit(i + ":"), tok)) % Width

  /** (tok, cnt, i, bucket) — each vocab row expanded to its [[Depth]]
    * register coordinates. Input should be the PRE-AGGREGATED vocab
    * relation (tok, cnt): the corpus-sized token stream collapses in the
    * one map-side-combined count shuffle, and the ×[[Depth]] expansion
    * happens on the vocabulary-sized result. */
  def bucketed(vocab: DataFrame, tokCol: String, cntCol: String): DataFrame =
    vocab.select(col(tokCol).as("tok"), col(cntCol).as("cnt"),
      explode(array((0 until Depth).map(i =>
        struct(lit(i).as("i"), bucketCol(col(tokCol), i).as("bucket"))): _*))
        .as("ib"))
      .select(col("tok"), col("cnt"), col("ib.i").as("i"),
        col("ib.bucket").as("bucket"))

  /** The sketch itself: (i, bucket, rc) with rc = Σ cnt of colliding
    * tokens. ≤ [[Depth]]·[[Width]] rows regardless of corpus size. */
  def registers(bucketed: DataFrame): DataFrame =
    bucketed.groupBy(col("i"), col("bucket"))
      .agg(sum(col("cnt")).as("rc"))

  /** Point estimates for `probes(tok)`: min over the [[Depth]] registers
    * each probe hashes to. `regs` is register-grid-sized → broadcast. */
  def estimates(probes: DataFrame, bucketedProbes: DataFrame,
                regs: DataFrame): DataFrame =
    bucketedProbes.join(probes, Seq("tok"), "leftsemi")
      .join(broadcast(regs), Seq("i", "bucket"))
      .groupBy(col("tok")).agg(min(col("rc")).as("cms_est"))
}
