package graft.operators

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Deterministic Bloom filter as a custom Spark [[Aggregator]] — the
  * broadcast pre-filter shape a 100 TB pipeline needs to cheapen semi/anti
  * joins: build the filter with ONE associative aggregation over the small
  * side (map-side partials OR together), ship the fixed
  * [[BloomBits]]/8-byte bitset to every probe task (a literal/broadcast,
  * not a shuffle), drop the overwhelming majority of probe rows map-side,
  * and verify the surviving trickle with an exact join. The probe-side scan
  * never shuffles on the join key.
  *
  * Exactness contract (what makes this ORACLE-GATEABLE, unlike
  * `bloom_filter_agg`'s implementation-defined hashing): bit positions are
  * Kirsch-Mitzenmacher double hashing off the repo's md5-derived
  * [[graft.functions.Text.hash60]] — h1 = h mod m, h2 = 2·((h div m) mod
  * (m/2)) + 1 (odd, so the probe sequence walks the whole table), position
  * i = (h1 + i·h2) mod m for i < [[BloomK]] — pure integer math an oracle
  * replays verbatim, false positives included. No false negatives by
  * construction; the gate's per-source accounting proves flagged ⊇ members
  * bit-exactly on both engines.
  *
  * Sizing: m = [[BloomBits]] is deliberately small (256 B) so the gate
  * corpus actually exercises false positives (~8 bits/element at sf0.1);
  * production would scale m with the member count (the math is
  * m-independent).
  */
object BloomFilter {

  /** Filter size in bits (power of two) and probes per element. */
  val BloomBits = 2048
  val BloomK = 3

  /** i-th probe position for a [[graft.functions.Text.hash60]] value. */
  @inline def position(h: Long, i: Int): Int = {
    val h1 = h % BloomBits
    val h2 = 2L * ((h / BloomBits) % (BloomBits / 2)) + 1L
    ((h1 + i * h2) % BloomBits).toInt
  }

  @inline private def testBit(b: Array[Byte], pos: Int): Boolean =
    (b(pos >> 3) & (1 << (pos & 7))) != 0

  @inline private def setBit(b: Array[Byte], pos: Int): Unit =
    b(pos >> 3) = (b(pos >> 3) | (1 << (pos & 7))).toByte

  /** All [[BloomK]] probe bits set? Called from interpreted eval AND from
    * [[graft.functions.BloomExpr]]'s generated code. */
  def mightContain(b: Array[Byte], h: Long): Boolean = {
    var i = 0
    while (i < BloomK) {
      if (!testBit(b, position(h, i))) return false
      i += 1
    }
    true
  }

  /** Population count of the bitset (filter-load diagnostic; the gate pins
    * it against the oracle's distinct-position count). */
  def setBitCount(b: Array[Byte]): Long = {
    var n = 0L
    var i = 0
    while (i < b.length) { n += Integer.bitCount(b(i) & 0xff); i += 1 }
    n
  }

  /** Input: a [[graft.functions.Text.hash60]] value (60-bit nonneg).
    * Output: the raw bitset — callers collect it (bounded: 256 B) and
    * embed it as a literal in the probe side. */
  object Bloom60 extends Aggregator[Long, Array[Byte], Array[Byte]] {
    override def zero: Array[Byte] = new Array[Byte](BloomBits / 8)
    override def reduce(b: Array[Byte], h: Long): Array[Byte] = {
      var i = 0
      while (i < BloomK) { setBit(b, position(h, i)); i += 1 }
      b
    }
    override def merge(b1: Array[Byte], b2: Array[Byte]): Array[Byte] = {
      var i = 0
      while (i < b1.length) { b1(i) = (b1(i) | b2(i)).toByte; i += 1 }
      b1
    }
    override def finish(b: Array[Byte]): Array[Byte] = b
    override def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
    override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** Column form: `bloom60(hash60Col)` → binary bitset. */
  def bloom60(c: Column): Column = udaf(Bloom60).apply(c)
}
