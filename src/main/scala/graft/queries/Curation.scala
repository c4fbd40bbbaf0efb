package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Text
import graft.operators.{Packing, Sampling}

/** Corpus-curation queries over `documents`: deterministic stratified
  * sampling (language rebalancing) and sequence packing — the two shaping
  * steps between dedup/quality filtering and writing training shards. */
object Curation {

  /** Per-mille keep rates by language: downsample the dominant English,
    * halve Chinese, keep the rest. */
  val SamplePermille: Map[String, Int] = Map("en" -> 250, "zh" -> 500)
  val DefaultPermille = 1000

  val SeqLen = 2048L
  val PackBucketWidth = 1000L

  /** Deterministic language-rebalancing sample ([[Sampling.stratifiedHash]]):
    * membership is a pure hash of doc_id, so the draw is reproducible and
    * stable under corpus appends. */
  def q63StratifiedSample(s: SparkSession, dir: String): DataFrame =
    Sampling.stratifiedHash(Tables.documents(s, dir), "doc_id", "lang",
        SamplePermille, DefaultPermille)
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
      .orderBy(col("doc_id"))

  val oracleQ63: String = {
    val cases = SamplePermille.toSeq.sorted
      .map { case (l, p) => s"WHEN '$l' THEN $p" }.mkString(" ")
    s"""SELECT doc_id, lang, source, n_chars
       |FROM documents
       |WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 1000
       |  < CASE lang $cases ELSE $DefaultPermille END
       |ORDER BY doc_id""".stripMargin
  }

  /** Sequence packing ([[Packing.packSequences]]): concatenate each
    * language's documents in doc_id order and chunk into [[SeqLen]]-token
    * sequences; every document reports the pack it starts in and its token
    * offset there. Token counts are q11's `\\w+` convention. */
  def q64SequencePacking(s: SparkSession, dir: String): DataFrame =
    Packing.packSequences(
        Tables.documents(s, dir)
          .select(col("doc_id"), col("lang"),
            Text.tokenCount(col("text")).cast("long").as("n_tokens")),
        "doc_id", "lang", "n_tokens", SeqLen, PackBucketWidth)
      .select(col("doc_id"), col("lang"), col("n_tokens"),
        col("pack_id"), col("pack_offset"))
      .orderBy(col("doc_id"))

  /** Vocabulary size for q65: top tokens by global count (ties broken by
    * token ascending, so the set is deterministic in both engines). */
  val VocabK = 20

  /** Corpus-derived vocabulary coverage: build the top-[[VocabK]] token
    * vocabulary from the corpus itself, broadcast it back, and score every
    * document's out-of-vocabulary rate — the curation signal for
    * tokenizer-fit / gibberish filtering.
    *
    * Scale shape: the token aggregation is map-side combined on the token
    * key; the top-K is `TakeOrderedAndProject` (per-partition top-K, one
    * bounded driver merge — never a global sort); the K-row vocabulary
    * broadcasts back onto the exploded token stream, so the only real
    * shuffles are the token count and the per-doc regroup. The
    * build-small-dim-from-big-fact-then-broadcast shape is the standard
    * answer at 100 TB. */
  def q65VocabCoverage(s: SparkSession, dir: String): DataFrame = {
    val toks = Tables.documents(s, dir)
      .select(col("doc_id"),
        explode(split(Text.normalize(col("text")), " ")).as("tok"))
      .filter(length(col("tok")) > 0)
    val vocab = toks.groupBy(col("tok")).agg(count(lit(1)).as("__cnt"))
      .orderBy(col("__cnt").desc, col("tok")).limit(VocabK)
      .select(col("tok"), lit(1).as("__in_vocab"))
    toks.join(broadcast(vocab), Seq("tok"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("__in_vocab").isNull, 1L).otherwise(0L)).as("n_oov"))
      .withColumn("oov_rate", col("n_oov").cast("double") / col("n_tokens"))
      .orderBy(col("doc_id"))
  }

  val oracleQ65: String =
    s"""WITH toks AS (
       |  SELECT doc_id, unnest(string_split(
       |    regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ')) AS tok
       |  FROM documents
       |), toks2 AS (
       |  SELECT doc_id, tok FROM toks WHERE len(tok) > 0
       |), vocab AS (
       |  SELECT tok FROM toks2 GROUP BY tok
       |  ORDER BY COUNT(*) DESC, tok LIMIT $VocabK
       |)
       |SELECT t.doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
       |  CAST(SUM(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
       |  CAST(SUM(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
       |    / COUNT(*) AS oov_rate
       |FROM toks2 t LEFT JOIN vocab v ON v.tok = t.tok
       |GROUP BY t.doc_id ORDER BY doc_id""".stripMargin

  /** Gopher/C4-style repetition statistics per document (Rae et al. 2021,
    * "Scaling Language Models" §A1.1; Raffel et al. 2020 C4 heuristics):
    * the fraction of the document covered by its single most frequent
    * bigram, and the fraction of duplicated trigrams — the standard
    * boilerplate / degenerate-repetition filters ahead of training.
    *
    * Scale shape: n-gram arrays and their distinct counts are one
    * map-side projection (same carrier discipline as the LSH shingles);
    * only the top-bigram mode needs a shuffle, and it ships (doc,
    * bigram-hash) longs — two partial/final aggregations, nothing else. */
  def q67RepetitionStats(s: SparkSession, dir: String): DataFrame = {
    val base = Tables.documents(s, dir)
      .select(col("doc_id"),
        split(Text.normalize(col("text")), " ").as("t"))
      .filter(size(col("t")) >= 3)
      .select(col("doc_id"),
        expr("transform(sequence(1, size(t)-1), i -> " +
          "concat(element_at(t, i), ' ', element_at(t, i+1)))").as("bg"),
        expr("transform(sequence(1, size(t)-2), i -> " +
          "concat(element_at(t, i), ' ', element_at(t, i+1), ' ', " +
          "element_at(t, i+2)))").as("tg"))
    val mapSide = base.select(col("doc_id"),
      size(col("bg")).cast("long").as("n_bigrams"),
      size(col("tg")).cast("long").as("n_trigrams"),
      size(array_distinct(col("tg"))).cast("long").as("n_distinct_trigrams"))
    val topBg = base.select(col("doc_id"), explode(col("bg")).as("v"))
      .groupBy(col("doc_id"), col("v")).agg(count(lit(1)).as("__c"))
      .groupBy(col("doc_id")).agg(max(col("__c")).as("top_bigram_n"))
    mapSide.join(topBg, Seq("doc_id"))
      .withColumn("top_bigram_frac",
        col("top_bigram_n").cast("double") / col("n_bigrams"))
      .withColumn("dup_trigram_frac",
        lit(1.0) - col("n_distinct_trigrams").cast("double") / col("n_trigrams"))
      .select(col("doc_id"), col("n_bigrams"), col("top_bigram_n"),
        col("top_bigram_frac"), col("dup_trigram_frac"))
      .orderBy(col("doc_id"))
  }

  val oracleQ67: String =
    s"""WITH base AS (
       |  SELECT doc_id,
       |    string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS t
       |  FROM documents
       |), arrs AS (
       |  SELECT doc_id,
       |    list_transform(range(1, len(t)), i ->
       |      t[CAST(i AS INT)] || ' ' || t[CAST(i AS INT) + 1]) AS bg,
       |    list_transform(range(1, len(t) - 1), i ->
       |      t[CAST(i AS INT)] || ' ' || t[CAST(i AS INT) + 1] || ' ' ||
       |      t[CAST(i AS INT) + 2]) AS tg
       |  FROM base WHERE len(t) >= 3
       |), ms AS (
       |  SELECT doc_id, CAST(len(bg) AS BIGINT) AS n_bigrams,
       |    CAST(len(tg) AS BIGINT) AS n_trigrams,
       |    CAST(len(list_distinct(tg)) AS BIGINT) AS n_distinct_trigrams
       |  FROM arrs
       |), top AS (
       |  SELECT doc_id, CAST(MAX(c) AS BIGINT) AS top_bigram_n FROM (
       |    SELECT doc_id, COUNT(*) AS c
       |    FROM (SELECT doc_id, unnest(bg) AS v FROM arrs)
       |    GROUP BY doc_id, v
       |  ) GROUP BY doc_id
       |)
       |SELECT ms.doc_id, ms.n_bigrams, top.top_bigram_n,
       |  CAST(top.top_bigram_n AS DOUBLE) / ms.n_bigrams AS top_bigram_frac,
       |  1.0 - CAST(ms.n_distinct_trigrams AS DOUBLE) / ms.n_trigrams
       |    AS dup_trigram_frac
       |FROM ms JOIN top ON top.doc_id = ms.doc_id
       |ORDER BY ms.doc_id""".stripMargin

  val oracleQ64: String =
    s"""WITH t AS (
       |  SELECT doc_id, lang,
       |    CAST(len(regexp_extract_all(text, '\\w+')) AS BIGINT) AS n_tokens
       |  FROM documents
       |), r AS (
       |  SELECT doc_id, lang, n_tokens,
       |    SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run
       |  FROM t
       |)
       |SELECT doc_id, lang, n_tokens,
       |  CAST((run - n_tokens) // $SeqLen AS BIGINT) AS pack_id,
       |  CAST((run - n_tokens) % $SeqLen AS BIGINT) AS pack_offset
       |FROM r ORDER BY doc_id""".stripMargin
}
