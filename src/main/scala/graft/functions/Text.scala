package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column builders for the large-scale training-data pipeline
  * operators (language ID, quality scoring, token counting, fingerprinting).
  *
  * Everything here is a pure Catalyst expression (codegen'd, no UDFs) and is
  * deliberately restricted to constructs with exact DuckDB equivalents so the
  * whole surface is oracle-checkable: counts are integers, scores are IEEE
  * doubles derived from integer counts with deterministic scalar math.
  */
object Text {

  /** Whitespace-normalized lowercase form — the canonical text for
    * fingerprinting and shingling. Semantically
    * `regexp_replace(lower(trim(text)), "\\s+", " ")`; executed as the
    * native single-pass [[NormalizeTextExpr]] (identical output, ~10×
    * cheaper — this expression opens every text pipeline). */
  def normalize(text: Column): Column = NormalizeTextExpr(text)

  /** The original three-pass composition, kept as the reference the
    * equivalence spec checks [[normalize]] against. */
  private[graft] def normalizeReference(text: Column): Column =
    regexp_replace(lower(trim(text)), "\\s+", " ")

  /** Exact content fingerprint (md5 of normalized text) — exact-dedup key. */
  def fingerprint(text: Column): Column = md5(normalize(text).cast("binary"))

  /** 60-bit numeric hash derived from md5 — stable across engines (DuckDB:
    * `CAST('0x'||substr(md5(s),1,15) AS BIGINT)`). Used as the base hash for
    * MinHash; positive, < 2^60. */
  def hash60(s: Column): Column =
    conv(substring(md5(s.cast("binary")), 1, 15), 16, 10).cast("long")

  /** Word-ish token count: runs of [A-Za-z0-9_]. */
  def tokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("\\w+"), lit(0)))

  /** BPE-ish subword count: words plus standalone punctuation marks, the
    * usual pre-tokenizer regex shape. */
  def subwordCount(text: Column): Column =
    size(regexp_extract_all(text, lit("\\w+|[^\\w\\s]"), lit(0)))

  def uniqueTokenRatio(text: Column): Column = {
    val toks = split(normalize(text), " ")
    when(size(toks) > 0,
      size(array_distinct(toks)).cast("double") / size(toks))
  }

  /** Stopword-hit count for one language's marker list (regex alternation on
    * word boundaries). */
  def stopwordHits(text: Column, words: Seq[String]): Column =
    size(regexp_extract_all(lower(text),
      lit("\\b(" + words.mkString("|") + ")\\b"), lit(0)))

  /** Tiny language-ID heuristic: argmax of per-language stopword hit counts
    * (n-gram/stopword heuristic class; ties broken by list order). Returns
    * "und" when no list matches. */
  val stopwordLists: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "that"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein"),
    "fr" -> Seq("le", "la", "les", "et", "est", "une", "dans"),
    "es" -> Seq("el", "los", "las", "es", "una", "en", "que"),
    "zh" -> Seq("de", "shi", "le", "zai", "you"))

  def langId(text: Column): Column = {
    val scored = stopwordLists.map { case (lang, words) =>
      struct(stopwordHits(text, words).as("hits"), lit(lang).as("lang"))
    }
    // argmax by hits; on ties the earlier list wins (stable: compare >)
    val best = scored.reduceLeft { (a, b) =>
      when(b.getField("hits") > a.getField("hits"), b).otherwise(a)
    }
    when(best.getField("hits") > 0, best.getField("lang")).otherwise(lit("und"))
  }

  /** Quality score in [0,1]: blend of length saturation, alpha ratio,
    * unique-token ratio and stopword presence (reference-style multi-signal
    * quality gate; integer counts → deterministic double math). */
  def qualityScore(text: Column): Column = {
    val nChars = length(text).cast("double")
    val nTokens = tokenCount(text).cast("double")
    val nAlpha = size(regexp_extract_all(text, lit("[A-Za-z]"), lit(0))).cast("double")
    val lenScore = least(nChars / lit(400.0), lit(1.0))
    val alphaRatio = when(nChars > 0, nAlpha / nChars).otherwise(lit(0.0))
    val uniq = coalesce(uniqueTokenRatio(text), lit(0.0))
    val stop = when(nTokens > 0,
      least(stopwordHits(text, stopwordLists.flatMap(_._2).distinct).cast("double")
        / nTokens * lit(4.0), lit(1.0))).otherwise(lit(0.0))
    (lenScore * lit(0.3)) + (alphaRatio * lit(0.3)) +
      (uniq * lit(0.2)) + (stop * lit(0.2))
  }
}
