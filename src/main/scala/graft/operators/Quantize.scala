package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scalar quantization (SQ8) for embedding columns — the memory-side scale
  * lever the ANN family (`Similarity`) has not covered yet: store each
  * float dimension as one uint8 code against per-dimension corpus [min,max]
  * ranges, cutting vector bytes 4× (and 8× vs the double-widened form) so
  * a 100 TB embedding corpus's candidate-generation pass shuffles and
  * caches codes, not floats. This is the faiss `SQ8` / Milvus `SQ8`
  * analog, re-expressed as pure Spark projections:
  *
  *  - [[dimRanges]] — one tiny aggregation (posexplode → per-dimension
  *    min/max, `dims` output rows). The ranges are bounded metadata
  *    (PLANS.md rule 6) and come back to the driver as literals, so the
  *    encode/decode projections below are map-side with NO join against a
  *    stats relation.
  *  - [[sq8Code]] — `code_d = clamp(floor((x_d-mn_d)/(mx_d-mn_d)*255+0.5))`
  *    per dimension; constant-range dimensions collapse to code 0.
  *  - [[sq8Recon]] — `mn_d + code_d/255*(mx_d-mn_d)`, the dequantized
  *    vector for symmetric distance computation.
  *
  * Every step is deterministic IEEE double arithmetic with a fixed
  * operation order, so a DuckDB oracle replays the codes bit-identically
  * (the gate ranks by reconstructed cosine and compares top-k SETS, which
  * additionally makes the comparison robust by construction).
  *
  * Reference anchor: the reference keeps its 13-dim factor vectors as
  * float4[] and scans them exactly (`factor-vectors.ts:319-333`,
  * `00121_create_factor_vectors.sql`); SQ8 is the standard first
  * compression step when that exact scan outgrows memory.
  */
object Quantize {

  /** Embedding dimensionality of the driver testdata (all SFs). */
  val Dims = 64

  /** Quantization levels - 1 (codes are 0..255). */
  val Levels = 255

  /** Per-dimension [min, max] over the corpus as driver-side arrays.
    * One shuffle of `dims` groups; the collect is bounded metadata
    * (`dims` rows), same sanction as q74's centroid collect. */
  def dimRanges(emb: DataFrame, vecCol: String, dims: Int): (Array[Double], Array[Double]) = {
    val rows = emb
      .select(posexplode(Similarity.asDouble(col(vecCol))).as(Seq("pos", "x")))
      .groupBy(col("pos")).agg(min(col("x")).as("mn"), max(col("x")).as("mx"))
      .collect()
    val mn = Array.ofDim[Double](dims)
    val mx = Array.ofDim[Double](dims)
    rows.foreach { r =>
      val p = r.getInt(0)
      mn(p) = r.getDouble(1)
      mx(p) = r.getDouble(2)
    }
    (mn, mx)
  }

  private def litArray(xs: Array[Double]): Column = array(xs.map(lit).toSeq: _*)

  /** Uint8 code array for a double-array column, against literal ranges.
    * Fixed-order scalar math (`(x-mn)/(mx-mn)*255.0 + 0.5` then floor then
    * clamp) — replayed verbatim by the oracle SQL. */
  def sq8Code(vec: Column, mn: Array[Double], mx: Array[Double]): Column = {
    val mnA = litArray(mn)
    val mxA = litArray(mx)
    transform(sequence(lit(1), lit(mn.length)), i => {
      val x = element_at(vec, i)
      val lo = element_at(mnA, i)
      val hi = element_at(mxA, i)
      when(hi === lo, lit(0L)).otherwise(
        least(lit(255L), greatest(lit(0L),
          floor((x - lo) / (hi - lo) * lit(255.0) + lit(0.5)))))
    })
  }

  /** Dequantized vector from a code array: `mn_d + code_d/255*(mx_d-mn_d)`. */
  def sq8Recon(codes: Column, mn: Array[Double], mx: Array[Double]): Column = {
    val mnA = litArray(mn)
    val mxA = litArray(mx)
    transform(sequence(lit(1), lit(mn.length)), i => {
      val c = element_at(codes, i)
      val lo = element_at(mnA, i)
      val hi = element_at(mxA, i)
      lo + c.cast("double") / lit(255.0) * (hi - lo)
    })
  }
}
