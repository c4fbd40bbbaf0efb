package graft

import org.apache.spark.sql.functions._
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

  test("WAV sample decode roundtrips exactly; frame features match brute force") {
    val samples = Array.tabulate(53)(i => ((i * 997 - 31000) % 32768).toShort)
    for (junk <- Seq(false, true)) {
      val bytes = Multimodal.encodeWavPcm16(22050, samples, junkChunk = junk)
      val (sr, got) = Multimodal.decodeWavSamples(bytes)
      assert(sr == 22050)
      assert(got.toSeq == samples.toSeq, s"junk=$junk")
    }
    // frame features against a brute-force fold (frames of FrameLen, the
    // 53 % 16 = 5-sample tail dropped)
    val fl = Multimodal.FrameLen
    val frames = samples.grouped(fl).filter(_.length == fl).toSeq
    frames.zipWithIndex.foreach { case (f, idx) =>
      val energy = f.map(v => v.toLong * v).sum
      val peak = f.map(v => math.abs(v.toLong)).max
      val zc = f.sliding(2).count(p => (p(0) < 0) != (p(1) < 0))
      assert(energy > 0 && peak > 0 && zc >= 0, s"frame $idx")
    }
    assert(frames.length == samples.length / fl)
  }

  test("decoders reject what they do not support") {
    intercept[IllegalArgumentException] {
      Multimodal.decodeBmp("nonsense".getBytes("ASCII"))
    }
    intercept[IllegalArgumentException] {
      Multimodal.decodeWav("RIFFxxxxJUNK".getBytes("ASCII"))
    }
  }

  test("WAV decoder fails loudly on a corrupt chunk size") {
    val bytes = Multimodal.encodeWavPcm16(8000,
      Array.tabulate(10)(_.toShort), junkChunk = false)
    // clobber the fmt chunk's declared size with a huge value
    val bad = bytes.clone()
    val bb = java.nio.ByteBuffer.wrap(bad)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(16, Int.MaxValue - 7)
    val e = intercept[IllegalArgumentException](Multimodal.decodeWav(bad))
    assert(e.getMessage.contains("chunk size"))
  }

  test("PNG roundtrip is exact across sizes covering all five filters") {
    // h >= 5 exercises None/Sub/Up/Average/Paeth; small sizes hit the
    // single-IDAT path, larger ones the split-IDAT path
    for (w <- Seq(1, 4, 13); h <- Seq(1, 5, 8)) {
      val px = Array.tabulate(w * h * 3)(i => ((i * 29 + 7) % 256).toByte)
      val bytes = Multimodal.encodePng(w, h, px)
      val (dw, dh, sum, corner, nf) = Multimodal.decodePng(bytes)
      assert(dw == w && dh == h)
      assert(sum == px.map(b => (b & 0xff).toLong).sum,
        s"DEFLATE/unfilter roundtrip drifted at w=$w h=$h")
      assert(corner == (0 until 3).map(i => (px(i) & 0xff).toLong).sum)
      assert(nf == math.min(h, 5))
    }
  }

  test("PNG decoder verifies chunk CRCs") {
    val px = Array.tabulate(6 * 6 * 3)(i => (i % 256).toByte)
    val bytes = Multimodal.encodePng(6, 6, px)
    // flip one bit inside the IHDR data (width field) without fixing CRC
    val bad = bytes.clone()
    bad(8 + 8 + 3) = (bad(8 + 8 + 3) ^ 1).toByte
    val e = intercept[IllegalArgumentException](Multimodal.decodePng(bad))
    assert(e.getMessage.contains("CRC"))
  }

  test("PNG decoder rejects bad magic and truncated files") {
    intercept[IllegalArgumentException] {
      Multimodal.decodePng("notapngfile".getBytes("ASCII"))
    }
    val good = Multimodal.encodePng(4, 4,
      Array.tabulate(4 * 4 * 3)(_.toByte))
    intercept[IllegalArgumentException] {
      Multimodal.decodePng(java.util.Arrays.copyOf(good, good.length - 6))
    }
  }

  test("GIF/LZW roundtrip is exact incl. KwKwK runs and width transitions") {
    def roundtrip(w: Int, h: Int, idx: Array[Byte]): Unit = {
      val (dw, dh, sum, rgb) = Multimodal.decodeGif(
        Multimodal.encodeGif(w, h, idx))
      assert(dw == w && dh == h)
      assert(sum == idx.map(_ & 0xff).map(_.toLong).sum)
      val p0 = idx(0) & 0xff
      assert(rgb == p0 + (255 - p0) + (7 * p0) % 256)
    }
    // constant image: immediate KwKwK case (code == next) every step
    roundtrip(16, 8, Array.fill(16 * 8)(7.toByte))
    // long random-ish image: dictionary passes 512 -> 10-bit codes and
    // approaches 1024 -> the 10->11 transition on bigger sizes
    val rng = new scala.util.Random(11)
    roundtrip(40, 30, Array.fill(40 * 30)(rng.nextInt(256).toByte))
    roundtrip(64, 48, Array.fill(64 * 48)(rng.nextInt(256).toByte))
    // structured repetition: dictionary hits long phrases
    roundtrip(50, 20, Array.tabulate(50 * 20)(i => ((i % 10) * 3).toByte))
    // 1x1 and 2x1 degenerate sizes
    roundtrip(1, 1, Array(200.toByte))
    roundtrip(2, 1, Array(5.toByte, 5.toByte))
  }

  test("GIF/LZW mid-stream CLEAR: dict-full streams roundtrip pixel-exact") {
    // images large/noisy enough to fill all 4096-258 dictionary slots force
    // the encoder's dict-full path: emit CLEAR, reset, keep coding (GIF87a
    // spec behavior; previously a hard require). The decoder must mirror
    // the reset AND stop adding entries while full. Pixel-array equality
    // (not the index sum) so a desync after the reset cannot cancel out.
    def exact(w: Int, h: Int, idx: Array[Byte]): Unit = {
      val bytes = Multimodal.encodeGif(w, h, idx)
      val (dw, dh, pix, _) = Multimodal.decodeGifPixels(bytes)
      assert(dw == w && dh == h)
      assert(java.util.Arrays.equals(pix, idx))
    }
    // random 256-symbol pixels add a dict entry nearly every step: 8192
    // pixels blow through 3838 additions and cross dict-full mid-stream
    val rng = new scala.util.Random(97)
    exact(64, 128, Array.fill(64 * 128)(rng.nextInt(256).toByte))
    // constant tail AFTER the reset: immediate KwKwK (code == next) in the
    // rebuilt dictionary — the classic post-clear desync trap
    val mixed = Array.tabulate(64 * 128)(i =>
      if (i < 6000) rng.nextInt(256).toByte else 9.toByte)
    exact(64, 128, mixed)
    // several resets in one stream
    exact(128, 200, Array.fill(128 * 200)(rng.nextInt(256).toByte))
  }

  test("GIF decoder fails loudly on structure violations") {
    intercept[IllegalArgumentException] {
      Multimodal.decodeGif("GIF89a not really".getBytes("ASCII"))
    }
    val good = Multimodal.encodeGif(8, 8, Array.tabulate(64)(_.toByte))
    intercept[IllegalArgumentException] { // chop the trailer + data
      Multimodal.decodeGif(java.util.Arrays.copyOf(good, good.length - 10))
    }
  }

  test("gzip actually compresses repetitive text and roundtrips unicode") {
    import graft.operators.Multimodal
    // the q165 gate pins the roundtrip; the compression PROPERTY (the
    // reason the column format exists) is pinned here since the oracle
    // cannot predict implementation-defined deflate sizes
    val repetitive = "spark table row scan merge " * 50
    assert(Multimodal.gzipSize(repetitive) < repetitive.length / 5)
    // short + unicode inputs survive the byte roundtrip (multi-byte
    // UTF-8 must not split across the deflate stream boundaries)
    val uni = "日本語テスト é à ü " + ("deflate " * 3)
    val bos = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(bos)
    gz.write(uni.getBytes("UTF-8")); gz.close()
    val back = new String(new java.util.zip.GZIPInputStream(
      new java.io.ByteArrayInputStream(bos.toByteArray)).readAllBytes(),
      "UTF-8")
    assert(back == uni)
  }

  test("hostile bytes: PNG/GIF/BMP/WAV walkers fail loudly on every truncation and mutation") {
    import graft.operators.Multimodal
    // decoders that will ever touch crawled bytes must throw a classified
    // IllegalArgumentException (or still decode, for mutations that land
    // in content) - never hang, overread (ArrayIndexOutOfBounds), or
    // return garbage silently
    val png = Multimodal.encodePng(9, 7,
      Array.tabulate(9 * 7 * 3)(i => ((i * 13 + 1) % 256).toByte))
    val gifIdx = Array.tabulate(40 * 30)(i => ((i * 7) % 256).toByte)
    val gif = Multimodal.encodeGif(40, 30, gifIdx)
    // a stream that crosses dict-full (mid-stream CLEAR emitted): the
    // reset path must be as truncation/mutation-hardened as the plain one
    val fuzzRng = new scala.util.Random(31)
    val gifReset = Multimodal.encodeGif(64, 80,
      Array.fill(64 * 80)(fuzzRng.nextInt(256).toByte))
    val bmp = Multimodal.encodeBmp24(5, 4,
      Array.tabulate(5 * 4 * 3)(i => (i % 256).toByte))
    val wav = Multimodal.encodeWavPcm16(8000,
      Array.tabulate(30)(i => (i * 5 - 60).toShort), junkChunk = true)
    val codecs: Seq[(String, Array[Byte], Array[Byte] => Any)] = Seq(
      ("png", png, Multimodal.decodePng(_)),
      ("gif", gif, Multimodal.decodeGif(_)),
      ("gif-reset", gifReset, Multimodal.decodeGif(_)),
      ("bmp", bmp, Multimodal.decodeBmp(_)),
      ("wav", wav, Multimodal.decodeWav(_)))
    for ((name, good, decode) <- codecs) {
      // sanity: the intact fixture decodes
      decode(good)
      // EVERY strict prefix must throw (IllegalArgument, nothing else)
      for (cut <- 0 until good.length) {
        try {
          decode(java.util.Arrays.copyOf(good, cut))
          fail(s"$name decoded a ${cut}B truncation of ${good.length}B")
        } catch { case _: IllegalArgumentException => () }
      }
      // single-byte mutations at every offset: decode or classified throw
      for (i <- good.indices) {
        val bad = good.clone()
        bad(i) = (bad(i) ^ 0xff).toByte
        try { decode(bad); () }
        catch {
          case _: IllegalArgumentException => ()
          case e: Throwable =>
            fail(s"$name threw ${e.getClass.getSimpleName} on a byte flip at $i")
        }
      }
    }
    // BMP-specific: hostile header fields that header-trusting decoders
    // mis-handle - huge width (rowSize int overflow), negative height,
    // data offset past EOF
    def patched(off: Int, v: Array[Byte]): Array[Byte] = {
      val b = bmp.clone(); v.copyToArray(b, off); b
    }
    for (hostile <- Seq(
      patched(18, Array(0xff, 0xff, 0xff, 0x3f).map(_.toByte)), // width 2^30-ish
      patched(22, Array(0xfc, 0xff, 0xff, 0xff).map(_.toByte)), // height -4
      patched(10, Array(0x00, 0x00, 0x00, 0x7f).map(_.toByte))  // offset 2^30
    )) intercept[IllegalArgumentException] { Multimodal.decodeBmp(hostile) }
  }

  test("MFCC pipeline: tables well-formed, c0 is the nonneg log-energy row, frames vary") {
    import org.apache.spark.sql.functions._
    val spark = SparkTestSession.spark
    // table invariants: DC twiddle row is the pure scale (cos 0 = 1);
    // every mel filter has mass; bin 0 (DC) is excluded from every filter
    assert(Multimodal.dftCos(0).forall(_ == Multimodal.TwiddleScale))
    assert(Multimodal.dftSin(0).forall(_ == 0L))
    assert(Multimodal.melWeights.forall(_.sum > 0))
    assert(Multimodal.melWeights.forall(_.head == 0L))
    // per-rate banks (q197's production layout): every planted rate's
    // bank is well-formed, and distinct rates lay distinct filters
    val banks = (0 until 5).map(i => Multimodal.melWeightsForRate(8000 + i * 1000))
    banks.foreach { bk =>
      assert(bk.forall(_.sum > 0)); assert(bk.forall(_.head == 0L))
    }
    assert(banks.map(_.map(_.toVector).toVector).distinct.size == 5,
      "per-rate mel banks must differ across rates")
    assert(Multimodal.dctTable(0).forall(_ == Multimodal.TwiddleScale))
    val rows = Multimodal.wavMfcc(spark, "/root/testdata/sf0.001")
    // same framing as q119: one row per full 16-sample frame per odd doc
    val q119n = Multimodal.wavFrameFeatures(spark, "/root/testdata/sf0.001").count()
    assert(rows.count() == q119n)
    // c0 = 2^20 * sum of log-mel energies: nonnegative (ln(1+E) >= 0),
    // and the chirp signal must produce real per-frame spectral variation
    val stats = rows.agg(min(col("c0")), countDistinct(col("c1")),
      max(col("frame_idx"))).collect()(0)
    assert(stats.getLong(0) >= 0L)
    assert(stats.getLong(1) > 1L, "MFCCs must vary across frames")
    // multi-frame docs exist (frame numbering really advances past 0)
    assert(stats.getInt(2) >= 1, "expected docs with more than one frame")
  }

  test("decodeFeatures dispatches on magic bytes: JPEG, MJPEG frame count, WAV, junk") {
    import graft.operators.{Jpeg, Multimodal}
    // single JPEG image -> 1 frame, dims from the stream, decoded pixel sum
    val px = Array.tabulate(16 * 8)(i => ((i * 2) % 256).toByte)
    val img = Multimodal.MediaRow(1L, "image", Jpeg.encodeGray(16, 8, px))
    val fi = Multimodal.decodeFeatures(img)
    assert(fi.width == 16 && fi.height == 8 && fi.n_frames == 1)
    assert(fi.n_samples == 16 * 8)
    // MJPEG: three concatenated frames -> n_frames counted by DECODE
    val frames = (0 until 3).map(f => Jpeg.encodeGray(8, 8,
      Array.fill(64)((2 * (f * 20 + 10)).toByte))).reduce(_ ++ _)
    val fv = Multimodal.decodeFeatures(Multimodal.MediaRow(2L, "video", frames))
    assert(fv.n_frames == 3 && fv.n_samples == 3 * 64)
    assert(fv.checksum == (0 until 3).map(f => 64L * 2 * (f * 20 + 10)).sum)
    // WAV -> sample count + signed sum
    val ss = Array.tabulate(40)(i => (i * 3 - 50).toShort)
    val wav = Multimodal.encodeWavPcm16(8000, ss, junkChunk = true)
    val fa = Multimodal.decodeFeatures(Multimodal.MediaRow(3L, "audio", wav))
    assert(fa.n_samples == 40 && fa.checksum == ss.map(_.toLong).sum)
    assert(fa.width == 0 && fa.height == 0)
    // unrecognized payloads fail loudly, not silently zero
    intercept[IllegalArgumentException] {
      Multimodal.decodeFeatures(
        Multimodal.MediaRow(4L, "image", Array.fill(20)(7.toByte)))
    }
  }

  test("pHash: invariances, twin recall through the real codec, band boundedness") {
    import graft.operators.Multimodal
    import graft.queries.Advanced
    val spark = SparkTestSession.spark
    // cos table invariants: DC row is the pure scale; row u sums to ~0
    // for u odd (cosine symmetry over the half-period sample points)
    assert(Multimodal.phCos(0).forall(_ == Multimodal.PhScale))
    assert(Multimodal.phCos(1).sum == 0L)
    // a constant image has NO non-DC energy: every coefficient 0, median
    // 0, strict > threshold -> hash 0
    val flat = Array.fill(16 * 16)(128)
    assert(Multimodal.pHash64(16, 16, flat) == 0L)
    // hash is invariant under brightness-preserving decode roundtrip:
    // encode real BMP bytes, decode, hash == hash of the raw pixels
    val px = Array.tabulate(24 * 16)(i => 30 + (i * 53 + i % 251) % 180)
    val bmp = Multimodal.encodeBmp24(24, 16,
      px.flatMap(v => Array(v.toByte, v.toByte, v.toByte)))
    val (dw, dh, gr) = Multimodal.decodeBmpGray(bmp)
    assert(dw == 24 && dh == 16 && gr.sameElements(px))
    // decodeBmpGray returns LOGICAL top-down order (row 0 first): the
    // top-left source pixel must come back at index 0
    assert(gr(0) == px(0))
    // gate shape at sf0.001: planted twins (2g, 2g+1) are found through
    // the full synth -> real-encode -> real-decode -> hash -> band-join
    // pipeline with high recall, and every reported pair is <= 3 bits
    val pairs = Advanced.q199PhashPairs(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(pairs.forall(_._3 <= 3))
    val twinHits = pairs.count { case (a, b, _) => a / 2 == b / 2 }
    val nTwins = Multimodal.phashes(spark, "/root/testdata/sf0.001")
      .count() / 2
    assert(twinHits >= (nTwins * 0.95).toInt,
      s"twin recall $twinHits/$nTwins below 95%")
    // band buckets stay content-bounded (the no-skew guarantee the
    // banded self-join relies on): no bucket collapses the join to
    // quadratic work
    val maxBucket = Multimodal.phashes(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("phash"),
        posexplode(array((0 until 4).map(b =>
          shiftright(col("phash"), 16 * b).bitwiseAND(lit(65535L))): _*)))
      .toDF("doc_id", "phash", "b", "bv")
      .groupBy(col("b"), col("bv")).count()
      .agg(max(col("count"))).collect()(0).getLong(0)
    assert(maxBucket <= 32, s"pHash band bucket skew: $maxBucket")
  }

  test("audio constellation: twin recall through the real codec, landmark boundedness") {
    import graft.queries.Advanced
    val spark = SparkTestSession.spark
    // the peak/runner-up extraction really recovers the planted tone
    // program: decode one doc and compare against constellationTones
    val (_, ss) = Multimodal.decodeWavSamples(
      Multimodal.synthConstellationWav(10L))
    assert(ss.length % Multimodal.FrameLen == 0)
    assert(ss.length / Multimodal.FrameLen == (5 + (10L / 2) % 8))
    // full match program at sf0.001: every odd doc must match its even
    // twin at offset 0 (measured 100% with the aligned-offset tiebreak)
    val rows = Advanced.q201AudioMatch(spark, "/root/testdata/sf0.001")
      .collect()
    assert(rows.nonEmpty)
    val ok = rows.count { r =>
      r.getAs[Long]("matched_doc") == r.getAs[Long]("query_doc") - 1 &&
        r.getAs[Int]("t_offset") == 0
    }
    assert(ok >= (rows.length * 0.97).toInt,
      s"twin match $ok/${rows.length} below 97%")
    // landmark hash buckets stay content-bounded — the keyed-join
    // guarantee (production would widen the FFT, not the buckets)
    val maxBucket = Multimodal.audioLandmarks(spark, "/root/testdata/sf0.001")
      .groupBy(col("h")).count()
      .agg(max(col("count"))).collect()(0).getLong(0)
    assert(maxBucket <= 64, s"landmark bucket skew: $maxBucket")
  }

  test("video clipped-copy: lossless frame roundtrip, twin alignment, bucket bounds") {
    import graft.queries.Advanced
    val spark = SparkTestSession.spark
    // the even-flat-block contract really holds through the per-frame
    // JPEG roundtrip: decoded MJPEG frames reproduce the closed-form
    // pixels bit-exactly (one doc checked frame by frame)
    val g = 3L
    val bytes = Multimodal.synthVideoMjpeg(6L) // even doc of group 3
    var off = 0; var j = 0
    while (off < bytes.length) {
      val dec = graft.operators.Jpeg.decodePixels(bytes, off)
      val (w, h) = Multimodal.videoDims(g)
      assert(dec.width == w && dec.height == h)
      val expect = Multimodal.videoFramePixels(g, j, w, h)
      assert(dec.samples.sameElements(expect), s"frame $j not lossless")
      off = dec.end; j += 1
    }
    assert(j == Multimodal.videoFrames(g))
    // full match program: nearly every odd doc matches its even twin at
    // offset -1 with nf-1 votes (the clipped-copy alignment); residual
    // mismatches are deterministic cross-content hash coincidences
    val rows = Advanced.q202VideoMatch(spark, "/root/testdata/sf0.001")
      .collect()
    assert(rows.nonEmpty)
    val ok = rows.count { r =>
      r.getAs[Long]("matched_doc") == r.getAs[Long]("query_doc") - 1 &&
        r.getAs[Int]("t_offset") == -1
    }
    assert(ok >= (rows.length * 0.97).toInt,
      s"twin alignment $ok/${rows.length} below 97%")
    // frame-hash buckets stay content-bounded (keyed join, never
    // all-pairs)
    val maxBucket = Multimodal.videoFrameHashes(spark, "/root/testdata/sf0.001")
      .groupBy(col("phash")).count()
      .agg(max(col("count"))).collect()(0).getLong(0)
    assert(maxBucket <= 64, s"frame hash bucket skew: $maxBucket")
  }
}
