package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fellegi–Sunter probabilistic RECORD LINKAGE (entity resolution) —
  * the structured-data sibling of the document-dedup family: decide
  * which rows of two sources describe the same real-world entity when
  * no shared key exists, by scoring field-level agreement patterns with
  * log-likelihood weights (Fellegi & Sunter, JASA 1969; the model
  * behind Splink/dedupe/JedAI).
  *
  * Scale shape: candidates come from BLOCKING (a map-side composite
  * key join), never a cross join — per-block fan-in is bounded by the
  * key's selectivity, and a skewed block salts like any skewed join
  * key (operators.Skew). Scoring is a pure per-pair projection.
  *
  * Determinism: match/unmatch weights log₂(m/u) quantize once to
  * integer micro-units on the DRIVER, and the per-pair score is a
  * BIGINT sum of those constants — both engines classify with exact
  * integer arithmetic, no floating accumulation.
  */
object RecordLinkage {

  /** One comparison field: an agreement column (boolean) plus the
    * quantized agreement/disagreement weights (micro-units). */
  final case class Field(agreeCol: String, wAgree: Long, wDisagree: Long)

  /** log₂(m/u) in micro-units — the standard FS weight for a field
    * with match probability m and chance-agreement probability u. */
  def weight(m: Double, u: Double): Long =
    math.floor(math.log(m / u) / math.log(2.0) * 1e6 + 0.5).toLong

  /** Score candidate pairs and classify against the two FS thresholds.
    * `pairs` must already carry the boolean agreement columns. */
  def score(pairs: DataFrame, fields: Seq[Field],
            matchT: Long, possibleT: Long): DataFrame = {
    val s = fields.map(f =>
      when(col(f.agreeCol), lit(f.wAgree)).otherwise(lit(f.wDisagree)))
      .reduce(_ + _)
    pairs.withColumn("score_q", s)
      .withColumn("decision",
        when(col("score_q") >= matchT, lit("match"))
          .when(col("score_q") >= possibleT, lit("possible"))
          .otherwise(lit("non_match")))
  }
}
