package graft.operators

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Exact per-dimension moment sums over embedding columns — the "fit the
  * normalizer" primitive of a training pipeline (feature means/variances
  * for standardization, PCA preprocessing, drift monitors).
  *
  * Why an Aggregator and not posexplode+groupBy(dim): exploding an
  * n-row × d-dim table shuffles n·d rows; the Aggregator keeps the fold
  * map-side and shuffles ONE d-length partial state per partition — at
  * 100 TB that is the difference between a 6.4-trillion-row exchange and
  * a few thousand 64-long arrays. The moments are exact integer sums over
  * quantized components, so partial/merge order cannot change the result.
  *
  * Overflow discipline (the q84 rule): every accumulation is
  * `Math.addExact`/`multiplyExact`, so a sum that would wrap a BIGINT
  * fails loudly instead of silently corrupting stats. With the q108
  * quantization (1e4, |component| ≤ ~0.6 → |v| ≤ 6e3) the sum-of-squares
  * bound allows ~2.5e11 rows (~60 TB of raw fp32 at d=64) in a single
  * global aggregate; beyond that, pre-aggregate per shard and merge the
  * shard moments — they are plain integer sums.
  */
object VectorStats {

  /** Mergeable moment state: row count, per-dim Σv, per-dim Σv². */
  case class Moments(n: Long, s: Array[Long], ss: Array[Long])

  object MomentsAgg extends Aggregator[Seq[Long], Moments, Moments] {
    override def zero: Moments = Moments(0L, Array.empty, Array.empty)

    override def reduce(b: Moments, a: Seq[Long]): Moments = {
      if (a == null) return b
      val d = a.length
      val cur =
        if (b.s.isEmpty) Moments(b.n, new Array[Long](d), new Array[Long](d))
        else b
      require(cur.s.length == d,
        s"ragged vector: expected dim ${cur.s.length}, got $d")
      var i = 0
      while (i < d) {
        val v = a(i)
        cur.s(i) = Math.addExact(cur.s(i), v)
        cur.ss(i) = Math.addExact(cur.ss(i), Math.multiplyExact(v, v))
        i += 1
      }
      Moments(cur.n + 1, cur.s, cur.ss)
    }

    override def merge(x: Moments, y: Moments): Moments = {
      if (x.s.isEmpty) return y
      if (y.s.isEmpty) return x
      require(x.s.length == y.s.length,
        s"ragged vector: merging dim ${x.s.length} with ${y.s.length}")
      var i = 0
      while (i < x.s.length) {
        x.s(i) = Math.addExact(x.s(i), y.s(i))
        x.ss(i) = Math.addExact(x.ss(i), y.ss(i))
        i += 1
      }
      Moments(x.n + y.n, x.s, x.ss)
    }

    override def finish(r: Moments): Moments = r
    override def bufferEncoder: Encoder[Moments] = Encoders.product[Moments]
    override def outputEncoder: Encoder[Moments] = Encoders.product[Moments]
  }

  /** Group/global aggregate over an `array<bigint>` column of quantized
    * components: returns a struct {n, s: array, ss: array}. */
  def moments(c: Column): Column = udaf(MomentsAgg).apply(c)
}
