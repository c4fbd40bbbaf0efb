package graft.operators

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** HyperLogLog distinct-count sketch (Flajolet et al. 2007; the stochastic
  * averaging form of Durand-Flajolet) as a custom Spark [[Aggregator]] —
  * the mergeable-sketch shape a 100 TB pipeline needs for cheap
  * cardinality monitoring: the per-group state is a fixed [[HllM]]-byte
  * register array that partial aggregation combines map-side, so a
  * billion-row group costs one 1 KiB buffer per task, not a shuffle of
  * distinct values.
  *
  * Exactness contract (what makes this ORACLE-GATEABLE, unlike library
  * HLLs): registers are derived from the repo's md5 [[graft.functions
  * .Text.hash60]] (register = low [[HllP]] bits, rho = 51 - bitlength of
  * the remaining 50-bit word, so rho ∈ [1, 51] for w > 0 and 51 for
  * w = 0 — one register update is pure integer math an oracle replays
  * verbatim), the indicator sum Σ 2^-M_j is carried as the EXACT scaled
  * integer Σ 2^(51-M_j) (fits a long: ≤ m · 2^51 = 2^61), and the one
  * transcendental (the linear-counting ln) is quantized on the repo's
  * 1e-6 grid. The estimate is bit-identical across engines, so the gate
  * checks the sketch's register state (via s51) AND its estimate, not
  * just "within a few percent".
  */
object HllSketch {

  /** 2^HllP registers; p=10 → ±3.25% standard error (1.04/√m). */
  val HllP = 10
  val HllM: Int = 1 << HllP

  /** Max rho: hash60 is 60-bit, minus HllP register bits leaves a 50-bit
    * word, so bitlength ∈ [1, 50] → rho = 51 - bitlen ∈ [1, 50], and the
    * all-zero word gets 51. */
  val HllRhoMax = 51

  /** alpha_m · m² · 2^51 folded into ONE double constant, so both engines
    * compute the raw estimate as a single division C / s51 with no
    * association ambiguity. alpha_m = 0.7213/(1 + 1.079/m) for m ≥ 128
    * (Flajolet et al. §4). */
  val HllAlphaNum: Double =
    0.7213 / (1.0 + 1.079 / HllM) * (HllM.toDouble * HllM.toDouble) *
      2251799813685248.0 // 2^51

  /** Linear-counting threshold 2.5·m (Flajolet et al. §4 small-range
    * correction). */
  val HllLcThreshold: Double = 2.5 * HllM

  /** (estimate quantized to the 1e-6 grid as a scaled long, estimate as
    * double, zero-register count, exact scaled indicator sum). */
  case class HllResult(est6: Long, hll_estimate: Double,
                       n_zero_registers: Long, s51: Long)

  /** Input: a [[graft.functions.Text.hash60]] value (60-bit nonneg). */
  object Hll60 extends Aggregator[Long, Array[Byte], HllResult] {
    override def zero: Array[Byte] = new Array[Byte](HllM)
    override def reduce(b: Array[Byte], h: Long): Array[Byte] = {
      val r = (h & (HllM - 1)).toInt
      val w = h >>> HllP
      val rho =
        if (w == 0L) HllRhoMax
        else HllRhoMax - (64 - java.lang.Long.numberOfLeadingZeros(w))
      if (rho > b(r)) b(r) = rho.toByte
      b
    }
    override def merge(b1: Array[Byte], b2: Array[Byte]): Array[Byte] = {
      var i = 0
      while (i < HllM) { if (b2(i) > b1(i)) b1(i) = b2(i); i += 1 }
      b1
    }
    override def finish(b: Array[Byte]): HllResult = {
      var s51 = 0L
      var zeros = 0L
      var i = 0
      while (i < HllM) {
        s51 += 1L << (HllRhoMax - b(i))
        if (b(i) == 0) zeros += 1
        i += 1
      }
      val raw = HllAlphaNum / s51.toDouble
      val est =
        if (raw <= HllLcThreshold && zeros > 0)
          HllM.toDouble * math.log(HllM.toDouble / zeros)
        else raw
      val est6 = math.floor(est * 1e6 + 0.5).toLong
      HllResult(est6, est6.toDouble / 1e6, zeros, s51)
    }
    override def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
    override def outputEncoder: Encoder[HllResult] = Encoders.product[HllResult]
  }

  /** Column form: `hll60(hash60Col)` → struct(est6, hll_estimate,
    * n_zero_registers, s51). */
  def hll60(c: Column): Column = udaf(Hll60).apply(c)
}
