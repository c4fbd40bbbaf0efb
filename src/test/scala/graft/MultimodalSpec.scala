package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal

/** Pure-JVM roundtrip tests for the REAL BMP/WAV codecs (q78's decode
  * layer). The oracle gate checks the arithmetic end to end; these pin the
  * binary-format edge cases directly: row padding at every alignment,
  * bottom-up row order, RIFF chunk skipping. */
class MultimodalSpec extends AnyFunSuite {

  test("BMP roundtrip recovers dims and pixel sums at every row padding") {
    // w*3 mod 4 walks 0,3,2,1 as w = 4..7 — all four padding widths
    for (w <- 4 to 7; h <- Seq(1, 3)) {
      val px = Array.tabulate(w * h * 3)(i => ((i * 11 + 5) % 256).toByte)
      val bytes = Multimodal.encodeBmp24(w, h, px)
      assert(bytes.length == 54 + ((w * 3 + 3) / 4 * 4) * h)
      val (dw, dh, sum, corner) = Multimodal.decodeBmp(bytes)
      assert(dw == w && dh == h)
      assert(sum == px.map(_ & 0xff).map(_.toLong).sum,
        s"padding bytes leaked into the content sum at w=$w")
      assert(corner == (0 until 3).map(i => (px(i) & 0xff).toLong).sum)
    }
  }

  test("BMP corner sum reads the logical top-left despite bottom-up rows") {
    val w = 4; val h = 2
    // top row all 1s, bottom row all 9s: a decoder that reads the FIRST
    // file row as the top gets corner 27, the correct answer is 3
    val px = Array.tabulate(w * h * 3)(i => if (i < w * 3) 1.toByte else 9.toByte)
    val (_, _, _, corner) = Multimodal.decodeBmp(Multimodal.encodeBmp24(w, h, px))
    assert(corner == 3L)
  }

  test("WAV roundtrip recovers rate and sample sum; JUNK chunk is skipped") {
    val samples = Array.tabulate(75)(i => ((i * 997 - 31000) % 32768).toShort)
    for (junk <- Seq(false, true)) {
      val bytes = Multimodal.encodeWavPcm16(11025, samples, junkChunk = junk)
      assert(bytes.length == 44 + (if (junk) 12 else 0) + samples.length * 2)
      val (sr, n, sum) = Multimodal.decodeWav(bytes)
      assert(sr == 11025)
      assert(n == samples.length.toLong)
      assert(sum == samples.map(_.toLong).sum)
    }
  }

  test("decoders reject what they do not support") {
    intercept[IllegalArgumentException] {
      Multimodal.decodeBmp("nonsense".getBytes("ASCII"))
    }
    intercept[IllegalArgumentException] {
      Multimodal.decodeWav("RIFFxxxxJUNK".getBytes("ASCII"))
    }
  }
}
