package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.queries.{ExactSubstr, SuffixArray}

/** Non-ASCII (Japanese) corpus through the suffix-array family — the
  * round-13 capacity lift's off-ASCII leg, exercised for real:
  *
  *  1. SEED PATH — a multi-byte corpus must take the CODE-POINT seed
  *     fallback (`seedOk = false`: the base-128 radix seed only applies
  *     to code points in [1, 127]), asserted via the probe, and an
  *     ASCII corpus must take the radix seed — the dispatch itself is
  *     pinned, not just the outcome.
  *  2. EXACTNESS — dup-gram positions + keepers equal brute-force
  *     L-gram grouping on the Japanese fixture (dupGramPositions runs
  *     THROUGH corpusRanks, so this is the fallback seed end to end).
  *  3. TAIL — span reassembly conserves chars and the kept-text md5
  *     (UTF-8 bytes) matches brute force.
  *  4. RANKS — total corpus suffix ranks equal the brute dense rank of
  *     distinct suffixes (BMP Japanese: code-point order == Java string
  *     order, so `sorted` is the oracle); packed == wide carrier.
  *
  * All fixture text is BMP (kana/kanji/fullwidth punctuation) — no
  * surrogate pairs, matching the reference corpus family (Japanese
  * filings), where String length == code point count.
  */
class UnicodeCorpusSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  /** Japanese fixture: an 18-char planted duplicate run across three
    * docs (twice in doc 4), Japanese filler from a 60-glyph alphabet
    * (seeded — deterministic; accidental 16-gram collisions in random
    * filler are ~60^-16). Doc 3 is pure filler (no dups). */
  private lazy val jpDocs: Map[Long, String] = {
    val glyphs = ("あいうえおかきくけこさしすせそたちつてとなにぬねの" +
      "はひふへほまみむめもやゆよらりるれろわをん株式会社決算報告書").toCharArray
    assert(glyphs.forall(c => !Character.isSurrogate(c)))
    val rnd = new scala.util.Random(7)
    def blob(n: Int) = Array.fill(n)(glyphs(rnd.nextInt(glyphs.length))).mkString
    val common = "当社の第三四半期決算は前年同期比で増収増益。"
    assert(common.length >= ExactSubstr.DupGramL + 2)
    Map(
      1L -> (blob(120) + common + blob(80)),
      2L -> (blob(40) + common + blob(150)),
      3L -> blob(100),
      4L -> (common + blob(90) + common))
  }

  private def jpDocsDf = {
    import spark.implicits._
    jpDocs.toSeq.sortBy(_._1).toDF("doc_id", "text")
  }

  /** Brute-force dup grams, keep-first by lexicographic (doc_id, pos). */
  private def bruteDup(l: Int): Map[(Long, Long), Boolean] = {
    val occ = scala.collection.mutable.Map[String, List[(Long, Long)]]()
    jpDocs.foreach { case (d, t) =>
      var p = 0
      while (p + l <= t.length) {
        val g = t.substring(p, p + l)
        occ(g) = (d, p.toLong) :: occ.getOrElse(g, Nil)
        p += 1
      }
    }
    occ.values.filter(_.size >= 2).flatMap { os =>
      val mn = os.min
      os.map(o => o -> (o == mn))
    }.toMap
  }

  test("non-ASCII corpus takes the code-point seed fallback; ASCII takes the radix seed") {
    import spark.implicits._
    SuffixArray.lastSeedOk = None
    SuffixArray.corpusRanks(spark, jpDocsDf, SuffixArray.SaRounds,
      total = true).count()
    assert(SuffixArray.lastSeedOk.contains(false),
      "Japanese corpus must dispatch to the code-point seed fallback")
    SuffixArray.corpusRanks(spark,
      Seq((1L, "abcabc"), (2L, "bcabca")).toDF("doc_id", "text"),
      SuffixArray.SaRounds, total = true).count()
    assert(SuffixArray.lastSeedOk.contains(true),
      "pure-ASCII corpus must dispatch to the radix seed")
  }

  test("unicode dup grams + keepers exact vs brute force (fallback seed end to end)") {
    import spark.implicits._
    val want = bruteDup(ExactSubstr.DupGramL)
    SuffixArray.lastSeedOk = None
    val got = ExactSubstr.dupGramPositions(spark, jpDocsDf)
      .select(col("doc_id"), col("pos"), col("is_keeper"))
      .as[(Long, Long, Boolean)].collect()
      .map { case (d, p, k) => (d, p) -> k }.toMap
    assert(SuffixArray.lastSeedOk.contains(false),
      "the dup-gram pass must have run through the fallback seed")
    assert(want.nonEmpty && got == want)
    // keep-first lands on doc 1's occurrence (lexicographic first)
    assert(got((1L, 120L)), "doc 1 @120 must be the keeper")
    assert(!got((2L, 40L)) && !got((4L, 0L)))
    // doc 3 (pure filler) contributes nothing
    assert(got.keys.forall(_._1 != 3L))
  }

  test("unicode reassembly: chars conserved, kept-text md5 (UTF-8) matches brute force") {
    import spark.implicits._
    val l = ExactSubstr.DupGramL
    val want = bruteDup(l)
    def spans(d: Long): List[(Long, Long)] = {
      val ps = want.collect { case ((`d`, p), false) => p }.toList.sorted
      ps.foldLeft(List.empty[(Long, Long)]) {
        case (Nil, p) => List((p, p + l))
        case ((s, e) :: tl, p) =>
          if (p - (e - l) <= l) (s, p + l) :: tl
          else (p, p + l) :: (s, e) :: tl
      }.reverse
    }
    val md = java.security.MessageDigest.getInstance("MD5")
    def md5hex(x: String) =
      md.digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val wantRows = jpDocs.keys.toList.sorted.map { d =>
      val t = jpDocs(d)
      val sp = spans(d)
      val kept = {
        val sb = new StringBuilder
        var c = 0L
        sp.foreach { case (s, e) =>
          sb.append(t.substring(c.toInt, s.toInt)); c = e
        }
        sb.append(t.substring(c.toInt)); sb.toString
      }
      (d, t.length.toLong, kept.length.toLong, md5hex(kept))
    }
    val got = ExactSubstr.applySpans(jpDocsDf,
      ExactSubstr.dupGramPositions(spark, jpDocsDf))
      .select(col("doc_id"), col("doc_len"), col("dup_chars"),
        col("kept_len"), col("kept_fp"))
      .as[(Long, Long, Long, Long, String)].collect().toList
    assert(got.map(r => (r._1, r._2, r._4, r._5)) == wantRows)
    got.foreach { case (d, n, dc, kept, _) =>
      assert(kept + dc == n, s"doc $d: chars not conserved")
    }
    assert(got.exists(_._3 > 0), "fixture removed nothing — vacuous")
  }

  test("unicode total corpus ranks equal brute suffix order " +
      "(code-point pair seed end to end)") {
    import spark.implicits._
    SuffixArray.lastSeedOk = None
    val got = SuffixArray.corpusRanks(spark, jpDocsDf,
        SuffixArray.SaRounds, total = true)
      .select(col("doc_id"), col("pos"), col("r"))
      .as[(Long, Long, Long)].collect().sortBy(x => (x._1, x._2))
    assert(SuffixArray.lastSeedOk.contains(false),
      "the rank build must have run through the code-point fallback seed")
    val sufs = jpDocs.toSeq.flatMap { case (d, t) =>
      (0 until t.length).map(p => ((d, p.toLong), t.substring(p)))
    }
    val rankOf = sufs.map(_._2).distinct.sorted.zipWithIndex
      .map { case (s, i) => s -> (i + 1L) }.toMap
    assert(got.forall { case (d, p, r) => rankOf(jpDocs(d).substring(p.toInt)) == r },
      "unicode corpus suffix ranks diverge from brute-force suffix sort")
  }
}
