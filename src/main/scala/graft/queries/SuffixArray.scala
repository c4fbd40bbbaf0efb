package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Suffix-array construction by prefix doubling (Manber & Myers,
  * SODA'90; distributed formulation after Flick & Aluru, SC'15) and the
  * LCP-based repetition analysis built on it. This is the index
  * structure under exact-substring dedup at scale (Lee et al. 2022 build
  * a corpus-level suffix array for ExactSubstr): q88 approximates that
  * with positional k-gram hashes; q206/q207 build the real thing per
  * document and read repetition structure off it exactly.
  *
  * Reference anchor: the reference's text-cleaning stage flags
  * boilerplate/repetition heuristically (SURVEY §2.8 text family); the
  * suffix array is the exact-arithmetic upgrade of that analysis.
  */
object SuffixArray {

  /** ORACLE doubling rounds: the DuckDB replays unroll a fixed number of
    * rounds, so 2^[[SaRounds]] bounds the document length the ORACLES
    * can check (driver corpus max 577 chars; 2^10 = 1024 headroom) and
    * each oracle carries an `error()` guard that trips at verify time if
    * the corpus ever outgrows it. The ENGINE is not bounded: both
    * [[rankLevels]] and [[corpusRanks]] derive their round count from
    * the measured max document length (ceil-log2), so longer documents
    * simply run more rounds. */
  val SaRounds = 10

  /** Smallest k with 2^k ≥ n (rounds needed for total suffix ranks). */
  private[graft] def ceilLog2(n: Long): Int = {
    var k = 0
    while ((1L << k) < n) k += 1
    k
  }

  /** Rank levels by prefix doubling: one row per suffix (doc_id, pos);
    * r0 is the code point of the character at pos; r{k+1} is the dense
    * rank of the pair (r{k}(pos), r{k}(pos + 2^k), −1 beyond the end)
    * within the doc. After round k, equal ranks mean equal 2^k-grams,
    * so the last level (round count DERIVED from the measured max doc
    * length — no capacity cap) is the suffix rank (the inverse suffix
    * array) and the intermediate levels support O(log n) LCP folds
    * (q207).
    * `keepLevels = false` carries only the current rank (q206's slim
    * path — the intermediate levels are dead weight there).
    *
    * Scale shape: the text column is dropped AT THE EXPLODE (only
    * (doc, pos, rank) longs ever move — the rule-7 carrier
    * discipline); every round is two windows keyed on doc_id — the
    * same exchange reused — with a `localCheckpoint` every third
    * round to cap lineage without paying 10 materializations.
    * Documents bound the window width, so a 1000-executor run
    * distributes by doc hash with no skew beyond the longest document.
    * A corpus-level (cross-document) suffix array replaces the per-doc
    * window with a range-partitioned global pair sort — same round
    * structure, named here because ExactSubstr needs it; the per-doc
    * form is what the repetition gates consume. */
  def rankLevels(s: SparkSession, dir: String,
                 keepLevels: Boolean): DataFrame = {
    // empty docs would explode sequence(0, -1) = [0, -1] (Spark picks
    // step -1 when start > stop) — two bogus suffix rows the oracle's
    // `WHERE j < n` never emits; filter them out before the explode
    val docs = Tables.documents(s, dir).select(col("doc_id"), col("text"))
      .filter(length(col("text")) > 0)
    // round count derived from the data: one scalar collect (bounded
    // metadata); an empty corpus degenerates to one vacuous round
    val mx = docs.agg(max(length(col("text")))).collect()(0)
    val maxLen = if (mx.isNullAt(0)) 0 else mx.getInt(0)
    // ≥ 1 round so the output rank is always a dense rank (r0 is raw
    // code points); ceilLog2(maxLen) rounds guarantee totality
    val rounds = math.max(1, ceilLog2(maxLen.toLong))
    var r = docs
      .select(col("doc_id"),
        explode(sequence(lit(0L), length(col("text")).cast("long") - 1L))
          .as("pos"),
        col("text"))
      .select(col("doc_id"), col("pos"),
        ascii(expr("substring(text, CAST(pos + 1 AS INT), 1)")).cast("long")
          .as("r0"))
      .localCheckpoint()
    val wLead = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    var k = 0
    var total = false
    while (k < rounds && !total) {
      val o = 1 << k
      val wRank = Window.partitionBy(col("doc_id"))
        .orderBy(col(s"r$k"), col("__r2"))
      r = r.withColumn("__r2",
          coalesce(lead(col(s"r$k"), o).over(wLead), lit(-1L)))
        .withColumn(s"r${k + 1}",
          dense_rank().over(wRank).cast("long"))
        .drop("__r2")
      if (!keepLevels) r = r.drop(s"r$k")
      if (k % 3 == 2 || k == rounds - 1) {
        r = r.localCheckpoint()
        // EARLY EXIT, exact by construction: once every doc's ranks are
        // total (max dense rank == suffix count), every further doubling
        // round is the identity map in BOTH engines — the oracle's fixed
        // unroll computes those identity rounds explicitly, Spark skips
        // them. The LCP fold stays exact too: totality at round k means
        // all 2^k-grams are distinct, so no LCP can reach 2^k and the
        // skipped higher levels could never contribute a match.
        val t = r.groupBy(col("doc_id"))
          .agg((max(col(s"r${k + 1}")) === count(lit(1))).as("t"))
          .agg(min(col("t"))).collect()(0)
        total = t.isNullAt(0) || t.getBoolean(0)
      }
      k += 1
    }
    r
  }

  /** Index of the last computed rank level in a [[rankLevels]] output
    * (early exit makes it data-dependent). */
  private def lastLevel(df: DataFrame): Int =
    df.columns.filter(c => c.startsWith("r") && c.drop(1).forall(_.isDigit))
      .map(_.drop(1).toInt).max

  /** q206 — the per-document suffix array: for every suffix its
    * lexicographic rank within the document (the inverse suffix array;
    * rank→pos is a projection away). Gate output is the full relation —
    * every rank at every position must match the oracle's replay of the
    * same doubling rounds exactly. */
  def q206SuffixArray(s: SparkSession, dir: String): DataFrame = {
    val r = rankLevels(s, dir, keepLevels = false)
    r.select(col("doc_id"), col("pos"), col(s"r${lastLevel(r)}").as("rk"))
      .orderBy(col("doc_id"), col("pos"))
  }

  /** Shared oracle CTE chain s0..s[[SaRounds]] replaying the doubling
    * rounds (s_k ranks compare 2^k-grams). */
  private lazy val saCtes: String = {
    val rounds = (0 until SaRounds).map { k =>
      s"""s${k + 1} AS MATERIALIZED (
         |  SELECT doc_id, pos,
         |    CAST(dense_rank() OVER (PARTITION BY doc_id ORDER BY r, r2)
         |      AS BIGINT) AS r
         |  FROM (
         |    SELECT doc_id, pos, r,
         |      coalesce(lead(r, ${1 << k}) OVER (
         |        PARTITION BY doc_id ORDER BY pos), -1) AS r2
         |    FROM s$k))""".stripMargin
    }.mkString(",\n")
    s"""d AS (SELECT doc_id, text, length(text) AS n FROM documents),
       |gcap AS (
       |  SELECT CASE WHEN max(n) > ${1 << SaRounds} THEN error(
       |    'document exceeds the oracle round bound 2^$SaRounds')
       |    ELSE 1 END AS ok FROM d
       |),
       |s0 AS MATERIALIZED (
       |  SELECT doc_id, CAST(j AS BIGINT) AS pos,
       |    CAST(ascii(substr(text, CAST(j + 1 AS INT), 1)) AS BIGINT) AS r
       |  FROM d, range(0, ${1 << SaRounds}) t(j), gcap
       |  WHERE gcap.ok = 1 AND j < n
       |),
       |$rounds""".stripMargin
  }

  lazy val oracleQ206: String =
    s"""WITH $saCtes
       |SELECT doc_id, pos, r AS rk FROM s$SaRounds
       |ORDER BY doc_id, pos""".stripMargin

  final case class SfxG(pid: Int, doc_id: Long, pos: Long, pk: Long)

  final case class SfxP(pid: Int, doc_id: Long, pos: Long, a: Long, b: Long)

  final case class SfxR(doc_id: Long, pos: Long, r: Long)

  /** Driver-correction cap for [[denseFromHeads]]: above this many
    * multi-member groups the conversion falls back to the
    * bounded-driver-traffic global sort-rank ([[globalDenseRank]]). */
  private val DenseCorrMaxGroups = 1L << 21

  /** HEAD ranks → DENSE ranks without a global sort, when the final
    * multi-member groups fit the driver: dense(x) = head(x) − Σ(m_g − 1)
    * over groups g with head(g) < head(x) (each group of size m occupies
    * m consecutive global row indices but only ONE dense value, so every
    * earlier group overcounts head ranks by m − 1; singletons contribute
    * nothing). The correction table is exactly the surviving active set
    * grouped by rank — the duplicated-suffix values, tiny at the gate
    * scale — sorted once on the driver and binary-searched in a single
    * map pass over the standing relation. Falls back to
    * [[globalDenseRank]] when the group count exceeds
    * [[DenseCorrMaxGroups]] (driver-residency cap; the sort path's
    * driver traffic is one row per partition regardless of data). */
  private def denseFromHeads(s: SparkSession, full: DataFrame,
                             groups: DataFrame): DataFrame = {
    import s.implicits._
    val nGroups = groups.count()
    if (nGroups > DenseCorrMaxGroups) {
      val (dense, _) = globalDenseRank(s,
        full.select(col("doc_id"), col("pos"), col("r").as("pk")))
      dense.withColumnRenamed("nr", "r")
    } else {
      val gs = groups.select(col("r"), col("m"))
        .as[(Long, Long)].collect().sortBy(_._1)
      val heads = gs.map(_._1)
      val cum = new Array[Long](gs.length)
      var acc = 0L
      var i = 0
      while (i < gs.length) {
        acc += gs(i)._2 - 1L
        cum(i) = acc
        i += 1
      }
      val bHeads = s.sparkContext.broadcast(heads)
      val bCum = s.sparkContext.broadcast(cum)
      full.select(col("doc_id"), col("pos"), col("r")).as[SfxR]
        .mapPartitions { it =>
          val hs = bHeads.value
          val cs = bCum.value
          it.map { x =>
            // largest index with head < r (strict): every group AT r is
            // x's own group and must not correct x
            var lo = 0
            var hi = hs.length - 1
            var idx = -1
            while (lo <= hi) {
              val mid = (lo + hi) >>> 1
              if (hs(mid) < x.r) { idx = mid; lo = mid + 1 }
              else hi = mid - 1
            }
            (x.doc_id, x.pos, if (idx < 0) x.r else x.r - cs(idx))
          }
        }.toDF("doc_id", "pos", "r")
    }
  }

  /** Distributed GLOBAL dense rank of the packed pair column `pk` — the
    * piece the corpus-level suffix array needs and a per-doc window
    * cannot give: `repartitionByRange` on pk (equal keys land in one
    * partition by construction), sort within partitions, then a bounded
    * per-partition distinct count (32 rows to the driver) turns into
    * offsets and a single ordered map pass assigns offset + local dense
    * index. No global single-partition window anywhere — this is how a
    * 1000-executor sort-rank runs. The assigned ranks are independent
    * of where the sampled range boundaries fall, so the result is
    * deterministic even though the partitioner samples. Returns (ranked
    * relation, total distinct pair count) — the count rides along free
    * from the offsets pass, so the caller's fixed-point check costs no
    * extra job. */
  private def globalDenseRank(s: SparkSession,
                              df: DataFrame): (DataFrame, Long) = {
    import s.implicits._
    val dbg = sys.env.contains("SPARK_GRAFT_SA_DEBUG")
    var t0 = System.nanoTime()
    def lap(tag: String): Unit = if (dbg) {
      System.err.println(
        f"SA-PROBE   gdr.$tag ${(System.nanoTime() - t0) / 1e9}%.2f s")
      t0 = System.nanoTime()
    }
    val n = s.sparkContext.defaultParallelism
    // repartitionByRange runs a SAMPLING job before the shuffle — without
    // this barrier the upstream window-lead computes twice per round
    val dfM = df.localCheckpoint()
    lap("window+pack checkpoint")
    val sorted = dfM.repartitionByRange(n, col("pk"))
      .sortWithinPartitions(col("pk"))
      .select(spark_partition_id().as("pid"), col("doc_id"), col("pos"),
        col("pk"))
      .as[SfxG]
      .localCheckpoint()
    lap("range-sort checkpoint")
    // per-partition distinct-key counts: one sequential scan of the
    // sorted checkpoint — no distinct shuffle
    val counts = sorted.mapPartitions { it =>
      var pid = -1
      var c = 0L
      var pr = 0L
      it.foreach { x =>
        if (pid < 0) pid = x.pid
        if (c == 0L || x.pk != pr) { c += 1; pr = x.pk }
      }
      if (pid < 0) Iterator.empty else Iterator((pid, c))
    }.collect().toMap // bounded: one row per partition
    lap("counts collect")
    val offsets: Map[Int, Long] = counts.keys.map { p =>
      p -> counts.filter(_._1 < p).values.sum
    }.toMap
    val ranked = sorted.mapPartitions { it =>
      var local = 0L
      var off = 0L
      var pr = 0L; var first = true
      it.map { x =>
        if (first) { off = offsets.getOrElse(x.pid, 0L); first = false }
        if (local == 0L || x.pk != pr) { local += 1; pr = x.pk }
        (x.doc_id, x.pos, off + local)
      }
    }
    (ranked.toDF("doc_id", "pos", "nr"), counts.values.sum)
  }

  /** Distributed GLOBAL HEAD ranks + group sizes of the pair (a, b): the
    * head rank of a row is the 1-based GLOBAL ROW INDEX of its equal-pair
    * group's first row in (a, b) order — NOT the dense rank. Head ranks
    * are what make singleton FREEZING sound (round-18, the r17 "does not
    * compose with global dense-rank renumbering" objection resolved): a
    * doubling round splits a group of size m into subgroups that renumber
    * WITHIN the group's index interval [r, r+m−1], so every other
    * suffix's rank — and in particular every singleton's — is final the
    * moment its group reaches size 1. Head ranks are order-isomorphic to
    * dense ranks level by level (both monotone relabelings of the same
    * pair order), so rank EQUALITY and rank ORDER — all any consumer or
    * doubling round uses — are identical; [[corpusRanks]] converts to
    * dense ranks once at the very end (total callers only).
    *
    * Structure: range-partition on (a, b) (equal pairs land in one
    * partition by construction), sort within partitions, per-partition
    * ROW counts collected as offsets (head rank is a position in the
    * global row order, so offsets are partition SIZES — no distinct
    * scan), then one ordered pass assigns rank = group-head global index
    * + 1 and cnt = group size. One group buffers in memory at a time —
    * group sizes are content-bounded (a gram group costs its occurrence
    * count), the same single-partition bound the range sort already
    * imposes on equal keys. Assigned ranks are independent of where the
    * sampled range boundaries fall. Returns (doc_id, pos, r, cnt). */
  private def globalHeadRank(s: SparkSession, df: DataFrame): DataFrame = {
    import s.implicits._
    val dbg = sys.env.contains("SPARK_GRAFT_SA_DEBUG")
    var t0 = System.nanoTime()
    def lap(tag: String): Unit = if (dbg) {
      System.err.println(
        f"SA-PROBE   ghr.$tag ${(System.nanoTime() - t0) / 1e9}%.2f s")
      t0 = System.nanoTime()
    }
    val n = s.sparkContext.defaultParallelism
    // repartitionByRange runs a SAMPLING job before the shuffle — the
    // barrier keeps the pack map from computing twice (measured: the
    // barrier-free variant re-ran the explode+substring map in both the
    // sampling pass and the sort, +1.3 s at sf0.1)
    val dfM = df.localCheckpoint()
    lap("pair checkpoint")
    val sorted = dfM.repartitionByRange(n, col("a"), col("b"))
      .sortWithinPartitions(col("a"), col("b"))
      .select(spark_partition_id().as("pid"), col("doc_id"), col("pos"),
        col("a"), col("b"))
      .as[SfxP]
      .localCheckpoint()
    lap("range-sort checkpoint")
    val sizes = sorted.mapPartitions { it =>
      var pid = -1
      var c = 0L
      it.foreach { x => if (pid < 0) pid = x.pid; c += 1 }
      if (pid < 0) Iterator.empty else Iterator((pid, c))
    }.collect().toMap // bounded: one row per partition
    lap("sizes collect")
    val offsets: Map[Int, Long] = sizes.keys.map { p =>
      p -> sizes.filter(_._1 < p).values.sum
    }.toMap
    val ranked = sorted.mapPartitions { it =>
      val buf = it.buffered
      new Iterator[(Long, Long, Long, Long)] {
        private var off = -1L // global row index of the next unread row
        private var pending: Iterator[(Long, Long, Long, Long)] =
          Iterator.empty
        def hasNext: Boolean = pending.hasNext || buf.hasNext
        def next(): (Long, Long, Long, Long) = {
          if (!pending.hasNext) {
            val h = buf.head
            if (off < 0) off = offsets.getOrElse(h.pid, 0L)
            val (a0, b0) = (h.a, h.b)
            val g = scala.collection.mutable.ArrayBuffer.empty[SfxP]
            while (buf.hasNext && buf.head.a == a0 && buf.head.b == b0)
              g += buf.next()
            val r = off + 1L
            val m = g.length.toLong
            off += m
            pending = g.iterator.map(x => (x.doc_id, x.pos, r, m))
          }
          pending.next()
        }
      }
    }
    ranked.toDF("doc_id", "pos", "r", "cnt")
  }

  /** Corpus-level rank levels by radix-seeded prefix doubling over an
    * arbitrary (doc_id, text) relation: returns (doc_id, pos, r) where
    * equal r ⟺ equal 2^`uptoLevel`-prefix (corpus-wide, end-padding
    * distinct) and r is order-correct in lexicographic prefix order.
    * With `total = true` the round count is DERIVED from the measured
    * max document length (ceil-log2), equal final ranks mean equal whole
    * suffixes at ANY document length, and r is additionally the global
    * DENSE rank (the oracle's g[[SaRounds]] relation) — there is no
    * capacity cap. For `total = false` callers r is the group HEAD rank
    * (order-isomorphic to the dense rank; every consumer uses only rank
    * equality/order, which the two agree on) — skipping the dense
    * renumbering saves a full global sort.
    *
    * Round-18 structure (the r17 "rounds are balanced, leave q209
    * alone" rejection re-measured and overturned — see
    * OPTIMIZATION_r18.md):
    *
    *  - 16-CHAR SEED: for pure-ASCII corpora the initial ranking pairs
    *    TWO 8-char base-128 packed longs — one global pair sort yields
    *    level-4 head ranks map-side, replacing the 4-char seed plus two
    *    full-relation doubling rounds. Non-ASCII corpora pair raw code
    *    points (level 1), never a refusal.
    *  - FROZEN DOUBLING: [[globalHeadRank]] head-rank semantics make a
    *    singleton's rank FINAL, so each round processes only the ACTIVE
    *    suffixes (groups of size ≥ 2 — the dedupable mass, which decays
    *    fast), looks the 2^k neighbor's rank up by a shuffled-hash join
    *    that STREAMS the standing full relation in place (hash(doc_id)
    *    partitioning established once and preserved through the
    *    checkpoints — zero full-relation Exchange or sort per round,
    *    where the r12–r17 shape paid one doc-keyed window sort plus one
    *    global range sort of the FULL relation every round), and
    *    renumbers GROUP-LOCALLY: a group splitting by (r, r2) assigns
    *    subgroup head ranks r + |{members with smaller r2}| — two
    *    windows sharing one active-sized hash(r) exchange, no global
    *    sort.
    *  - ONE final dense conversion (total callers): the existing
    *    single-column [[globalDenseRank]] over the final head ranks.
    *
    * The per-round fixed point is unchanged in meaning: a round that
    * splits no group leaves every later round the identity map. */
  /** Which seed the LAST [[corpusRanks]] call chose: Some(true) = the
    * packed base-128 radix seed (pure-ASCII corpus), Some(false) = the
    * code-point fallback (non-ASCII input — more doubling rounds, never
    * a refusal). Test instrumentation only: specs assert the fallback
    * seed actually ran on non-ASCII fixtures. */
  @volatile private[graft] var lastSeedOk: Option[Boolean] = None

  private[graft] def corpusRanks(s: SparkSession, docs0: DataFrame,
                                 uptoLevel: Int,
                                 total: Boolean = false): DataFrame = {
    // empty docs would explode sequence(0, -1) = [0, -1]; drop pre-explode
    val docs = docs0.select(col("doc_id"), col("text"))
      .filter(length(col("text")) > 0)
    // ONE bounded-metadata scan picks the round count and the seed:
    // maxLen drives totality rounds, the char range decides whether the
    // base-128 radix seed applies. Nothing here REFUSES input — every
    // bound is a path switch, not a capacity cap.
    val st = docs.agg(
      max(length(col("text"))),
      max(expr("aggregate(transform(split(text, ''), c -> ascii(c)), " +
        "0, (a, x) -> greatest(a, x))")),
      min(expr("aggregate(transform(split(text, ''), c -> ascii(c)), " +
        "128, (a, x) -> least(a, x))"))).collect()(0)
    if (st.isNullAt(0)) // empty corpus: zero suffix rows, zero rounds
      return docs.select(col("doc_id"), lit(0L).as("pos"), lit(0L).as("r"))
    val maxLen = st.getInt(0)
    val maxChar = st.getInt(1)
    val minChar = st.getInt(2)
    // the radix seed needs codes in [1, 127] (0 is the end-padding
    // sentinel); anything else falls back to the code-point pair seed
    val seedOk = minChar >= 1 && maxChar < 128
    lastSeedOk = Some(seedOk) // spec probe: which seed path ran
    // target level: equal ranks at level L ⟺ equal 2^L-prefixes
    val lvl =
      if (total) math.max(1, ceilLog2(maxLen.toLong))
      else math.max(1, uptoLevel)
    // seed PAIR level j: the initial global pair sort ranks level j+1.
    // ASCII packs w = 2^j ≤ 8 chars per long (7 bits/char, j ≤ 3);
    // non-ASCII pairs single code points (j = 0). Never exceed the
    // target level — a caller asking for level 2 must not get level-4
    // equality classes.
    val j = if (seedOk) math.min(3, lvl - 1) else 0
    val w = 1 << j
    def packAt(off: Int): org.apache.spark.sql.Column =
      (0 until w).map { i =>
        ascii(expr(s"substring(text, CAST(pos + ${off + i + 1} AS INT), 1)"))
          .cast("long") * lit(1L << (7 * (w - 1 - i)))
      }.reduce(_ + _)
    val (aCol, bCol) =
      if (seedOk) (packAt(0), packAt(w))
      else (
        ascii(expr("substring(text, CAST(pos + 1 AS INT), 1)")).cast("long"),
        // +1 shift keeps a real U+0000 distinct from the end-padding 0
        expr("CASE WHEN pos + 1 < length(text) THEN " +
          "ascii(substring(text, CAST(pos + 2 AS INT), 1)) + 1 " +
          "ELSE 0 END").cast("long"))
    val dbg = sys.env.contains("SPARK_GRAFT_SA_DEBUG")
    var t0 = System.nanoTime()
    def lap(tag: String): Unit = if (dbg) {
      System.err.println(f"SA-PROBE $tag ${(System.nanoTime() - t0) / 1e9}%.2f s")
      t0 = System.nanoTime()
    }
    val pairs = docs
      .select(col("doc_id"),
        explode(sequence(lit(0L), length(col("text")).cast("long") - 1L))
          .as("pos"),
        col("text"))
      .select(col("doc_id"), col("pos"), aCol.as("a"), bCol.as("b"))
    val ranked0 = globalHeadRank(s, pairs)
    lap(s"initial rank (seedOk=$seedOk level=${j + 1} lvl=$lvl)")
    if (lvl <= j + 1) {
      // the initial ranking already reaches the target level (the
      // uptoLevel = 4 ExactSubstr callers with the 16-char seed): no
      // rounds, no doc-clustered base — one global pair sort IS the
      // whole rank build
      val out = ranked0.select(col("doc_id"), col("pos"), col("r"))
      return if (!total) out
      else {
        val dense = denseFromHeads(s, out,
          ranked0.filter(col("cnt") >= 2)
            .groupBy(col("r")).agg(count(lit(1)).as("m")))
        lap("dense conversion")
        dense
      }
    }
    val n = s.sparkContext.defaultParallelism
    // the standing BASE relation: level-(j+1) head ranks, hash(doc_id)-
    // clustered ONCE and never rewritten — later rounds' rank changes
    // live in a small PATCH relation (latest rank per changed position),
    // so the per-round storage work is active-sized, never O(corpus).
    // A full-relation rewrite per round was measured at a ~1 s/round
    // floor at sf0.1 regardless of how few ranks changed.
    //
    // persist(), NOT localCheckpoint: a local checkpoint erases the
    // plan's partitioning (LogicalRDD reports UnknownPartitioning —
    // measured on this Spark), and the whole point of clustering the
    // base is that every round's lookup join streams it IN PLACE. The
    // persist is scoped: [[corpusRanks]]' callers (bench/Verify) retire
    // blocks between runs, and the base never outlives the query's
    // lineage. Subset-key co-partitioning (hash(doc_id) serving a
    // (doc_id, pos) join) additionally needs
    // spark.sql.requireAllClusterKeysForCoPartition=false — scoped
    // save/set/restore around the rounds, the q214/q216 conf-scoping
    // precedent; it unlocks a planner capability at ANY scale, it is
    // not a local-mode tune.
    val fullBase = ranked0.select(col("doc_id"), col("pos"), col("r"))
      .repartition(n, col("doc_id")).persist()
    fullBase.count()
    lap("base persist")
    // current ranks = base overridden by the patch (stream base, build
    // patch — base keeps its clustering through the join)
    def currentRanks(patch: Option[DataFrame]): DataFrame = patch match {
      case None => fullBase
      case Some(p) =>
        fullBase.join(p.hint("shuffle_hash"), Seq("doc_id", "pos"), "left")
          .select(col("doc_id"), col("pos"),
            coalesce(col("__pr"), col("r")).as("r"))
    }
    var patch: Option[DataFrame] = None
    // the active set starts as a cheap view over the initial ranking's
    // sorted checkpoint; each round's is a view over that round's
    // checkpoint
    var active = ranked0.filter(col("cnt") >= 2)
      .select(col("doc_id"), col("pos"), col("r"))
    // matched-prefix length the current ranks certify; the target is the
    // first power of two ≥ maxLen (total) or 2^uptoLevel
    var P = 1L << (j + 1)
    val targetP = 1L << lvl
    var fixed = false
    var activeCnt = -1L // unknown until the first round's control read
    val coPartKey = "spark.sql.requireAllClusterKeysForCoPartition"
    val savedCoPart = s.conf.getOption(coPartKey)
    s.conf.set(coPartKey, "false")
    try {
    while (P < targetP && !fixed && activeCnt != 0L) {
      // QUADRUPLING round (r18): ranks certifying P chars + lookups at
      // pos+P, pos+2P, pos+3P certify 4P — halving the round count a
      // doubling walk needs (each lookup stride ≤ P keeps the standard
      // prefix-doubling composition argument intact). Non-total callers
      // must land EXACTLY on the target level (over-refining would
      // change the equality classes consumers group by), so the last
      // round shrinks its stride: m = min(4, target/P) ∈ {2, 4}.
      val m = math.min(4L, targetP / P)
      // the neighbors' CURRENT ranks (frozen ranks are final; active
      // ones come off the patch) — build sides are the patch and the
      // active set, the base only streams, and the pivot back to one
      // row per active suffix needs no exchange (hash(doc_id) already
      // satisfies the grouping). Beyond-end positions match nothing →
      // rank 0, below every real head rank (≥ 1), the same order the
      // −1 sentinel gave the chain.
      val cand = currentRanks(patch)
        .select(col("doc_id"), col("pos"), col("r").as("__r2"))
        .withColumn("__off", explode(array((1L until m).map(lit): _*)))
        .select(col("doc_id"), (col("pos") - col("__off") * P).as("pos"),
          col("__off"), col("__r2"))
      def pivotAt(i: Long): org.apache.spark.sql.Column =
        coalesce(max(when(col("__off") === i, col("__r2"))), lit(0L))
      val piv = active.hint("shuffle_hash")
        .join(cand, Seq("doc_id", "pos"), "left")
        .groupBy(col("doc_id"), col("pos"), col("r"))
        .agg(pivotAt(1L).as("__ra"), pivotAt(2L).as("__rb"),
          pivotAt(3L).as("__rc"))
      val ord = Seq(col("__ra"), col("__rb"), col("__rc"))
      val wOrd = Window.partitionBy(col("r")).orderBy(ord: _*)
      val wEq = Window.partitionBy(col("r") +: ord: _*)
      // group-local head-rank renumber: r + |{smaller lookup tuple in
      // the group}| = rank() − 1 (min-rank ties). rank() is 32-bit —
      // exact while no single rank group exceeds 2^31 members, the same
      // hot-gram occupancy bound the range sort's equal-keys-in-one-
      // partition property already imposes.
      val stepped0 = piv
        .withColumn("__lt", rank().over(wOrd).cast("long") - 1L)
        .withColumn("__cnt", count(lit(1)).over(wEq))
        .select(col("doc_id"), col("pos"),
          (col("r") + col("__lt")).as("r"),
          col("__cnt"), (col("__lt") > 0L).as("__chg"))
      if (sys.env.contains("SPARK_GRAFT_SA_PLAN"))
        System.err.println(s"SA-PLAN round P=$P:\n" +
          stepped0.queryExecution.executedPlan.toString.linesIterator
            .filter(l => l.contains("Exchange") || l.contains("Join") ||
              l.contains("Window") || l.contains("Scan") ||
              l.contains("Aggregate"))
            .map(_.trim.take(140)).mkString("\n"))
      val stepped = stepped0.localCheckpoint()
      lap(s"  round P=$P stepped-ckpt")
      // one bounded action reads both loop controls off the checkpoint
      val ctl = stepped.agg(
        sum(when(col("__chg"), 1L).otherwise(0L)),
        sum(when(col("__cnt") >= 2, 1L).otherwise(0L))).collect()(0)
      lap(s"  round P=$P ctl")
      val changed = if (ctl.isNullAt(0)) 0L else ctl.getLong(0)
      activeCnt = if (ctl.isNullAt(1)) 0L else ctl.getLong(1)
      if (changed == 0L) fixed = true
      else {
        // latest-wins fold of this round's changed ranks into the patch
        // (all patch-sized; the base never rewrites). Checkpointed: a
        // lazy chain re-evaluated the whole anti-join stack inside
        // every later round's lookup and measured WORSE than the
        // ~0.1-0.4 s/round materialization it saved.
        val upd = stepped.filter(col("__chg"))
          .select(col("doc_id"), col("pos"), col("r").as("__pr"))
        patch = Some((patch match {
          case None => upd
          case Some(p) => upd.unionByName(
            p.join(upd.select(col("doc_id"), col("pos")),
              Seq("doc_id", "pos"), "left_anti"))
        }).localCheckpoint())
        lap(s"  round P=$P patch-ckpt")
        active = stepped.filter(col("__cnt") >= 2)
          .select(col("doc_id"), col("pos"), col("r"))
      }
      lap(s"round P=$P m=$m active=$activeCnt changed=$changed")
      P *= m
    }
    if (!total) currentRanks(patch)
    else {
      // head → dense via the driver-corrected map pass (the surviving
      // multi-member groups ARE the active set at exit)
      val dense = denseFromHeads(s, currentRanks(patch),
        active.groupBy(col("r")).agg(count(lit(1)).as("m")))
      lap("dense conversion")
      dense
    }
    } finally savedCoPart match {
      case Some(v) => s.conf.set(coPartKey, v)
      case None => s.conf.unset(coPartKey)
    }
  }

  /** q209 — CORPUS-LEVEL suffix ranks: the same doubling rounds as
    * q206 but ranked across the whole corpus (the index shape
    * ExactSubstr dedup actually builds — cross-document repeats sort
    * adjacent). Identical string suffixes from different documents keep
    * equal ranks forever (dense rank, semantically correct); rounds
    * stop at the exact fixed point — when a round splits no rank group,
    * every later round is the identity in both engines, so the fixed
    * [[SaRounds]]-round oracle agrees.
    *
    * Scale shape: per round, one doc-keyed window (the 2^k neighbor
    * rank) packed into one long + one range-partitioned global
    * sort-rank ([[globalDenseRank]] — bounded driver traffic, no
    * single-partition window). The radix seed replaces the first
    * [[SeedLevel]] rounds with a map-side packed prefix, so the round
    * count (and with it the checkpoint-storage term the round-11 sf1
    * probe flagged) drops from 10 to ≤ 8, each round ~25% slimmer.
    * This is the 100-TB path the per-doc q206 scaladoc names: a
    * corpus-level SA over N documents is log(maxlen) range sorts. */
  def q209CorpusSuffixRank(s: SparkSession, dir: String): DataFrame =
    corpusRanks(s, Tables.documents(s, dir), SaRounds, total = true)
      .select(col("doc_id"), col("pos"), col("r").as("rk"))
      .orderBy(col("doc_id"), col("pos"))

  lazy val oracleQ209: String = {
    val rounds = (0 until SaRounds).map { k =>
      s"""g${k + 1} AS MATERIALIZED (
         |  SELECT doc_id, pos,
         |    CAST(dense_rank() OVER (ORDER BY r, r2) AS BIGINT) AS r
         |  FROM (
         |    SELECT doc_id, pos, r,
         |      coalesce(lead(r, ${1 << k}) OVER (
         |        PARTITION BY doc_id ORDER BY pos), -1) AS r2
         |    FROM g$k))""".stripMargin
    }.mkString(",\n")
    s"""WITH d AS (SELECT doc_id, text, length(text) AS n FROM documents),
       |gcap AS (
       |  SELECT CASE WHEN max(n) > ${1 << SaRounds} THEN error(
       |    'document exceeds the oracle round bound 2^$SaRounds')
       |    ELSE 1 END AS ok FROM d
       |),
       |g0 AS MATERIALIZED (
       |  SELECT doc_id, CAST(j AS BIGINT) AS pos,
       |    CAST(ascii(substr(text, CAST(j + 1 AS INT), 1)) AS BIGINT) AS r
       |  FROM d, range(0, ${1 << SaRounds}) t(j), gcap
       |  WHERE gcap.ok = 1 AND j < n
       |),
       |$rounds
       |SELECT doc_id, pos, r AS rk FROM g$SaRounds
       |ORDER BY doc_id, pos""".stripMargin
  }

  final case class SuffixRow(doc_id: Long, pos: Long,
                                     levels: Array[Long])
  final case class LrsRow(doc_id: Long, lrs_len: Long,
                                  lrs_pos: Long)

  /** q207 — longest repeated substring per document, read exactly off
    * the suffix array: the LRS is the maximum LCP over suffix pairs
    * ADJACENT in suffix-array order (any longer repeat would make some
    * adjacent pair share it), and each LCP is the standard O(log n)
    * binary fold over the doubling levels — descend k =
    * [[SaRounds]]−1..0, and whenever the level-k ranks at (p+acc, q+acc)
    * agree (equal rank at level k ⟺ the 2^k-grams agree; distinct
    * same-doc suffixes have distinct lengths, so padding never aliases),
    * add 2^k to the matched prefix. Exact integer arithmetic end to
    * end — no hashing, no probabilistic bound: this is the precise
    * within-doc repetition signal q67's heuristics approximate, the
    * quality dimension (Gopher's repetition filters) computed exactly.
    *
    * Scale shape: the level table shuffles ONCE, keyed by doc (the
    * q31 typed-group discipline for per-group sequential kernels); the
    * fold then runs in-memory per document (≤ maxlen rows), emitting
    * one row per doc. The oracle replays the identical fold as
    * [[SaRounds]] chained joins — both sides are pure integer
    * arithmetic, so the group-local evaluation and the join-chain
    * evaluation agree bit-for-bit. A pure-join formulation measured
    * 20 s at sf0.1 against ~2 s for this plan — 20 keyed shuffles
    * replaced by one. */
  def q207LongestRepeat(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val wide = rankLevels(s, dir, keepLevels = true)
    val last = lastLevel(wide)
    val lvlCols = array((0 to last).map(k => col(s"r$k")): _*)
    val rows = wide
      .select(col("doc_id"), col("pos"), lvlCols.as("levels"))
      .as[SuffixRow]
    val out = rows.groupByKey(_.doc_id).flatMapGroups { (doc, it) =>
      val sufs = it.toArray
      // rank→pos order: final ranks are total within the doc
      val saOrder = sufs.sortBy(_.levels(last))
      val byPos = new Array[Array[Long]](sufs.length)
      sufs.foreach(r => byPos(r.pos.toInt) = r.levels)
      val n = sufs.length
      var bestLen = 0L
      var bestPos = Long.MaxValue
      var i = 0
      while (i + 1 < n) {
        val p = saOrder(i).pos
        val q = saOrder(i + 1).pos
        var acc = 0L
        var k = last - 1
        while (k >= 0) {
          val a = p + acc; val b = q + acc
          if (a < n && b < n && byPos(a.toInt)(k) == byPos(b.toInt)(k))
            acc += (1L << k)
          k -= 1
        }
        val lp = math.min(p, q)
        if (acc > bestLen || (acc == bestLen && lp < bestPos)) {
          bestLen = acc; bestPos = lp
        }
        i += 1
      }
      if (n < 2) Iterator.empty
      else Iterator(LrsRow(doc, bestLen, bestPos))
    }
    out.toDF().orderBy(col("doc_id"))
  }

  lazy val oracleQ207: String = {
    val folds = (SaRounds - 1 to 0 by -1).map { k =>
      val prev = if (k == SaRounds - 1) "adj" else s"f${k + 1}"
      s"""f$k AS MATERIALIZED (
         |  SELECT a.doc_id, a.p, a.q,
         |    a.acc + CASE WHEN x.r IS NOT NULL AND y.r IS NOT NULL
         |      AND x.r = y.r THEN ${1L << k} ELSE 0 END AS acc
         |  FROM $prev a
         |  LEFT JOIN s$k x ON x.doc_id = a.doc_id AND x.pos = a.p + a.acc
         |  LEFT JOIN s$k y ON y.doc_id = a.doc_id AND y.pos = a.q + a.acc)"""
        .stripMargin
    }.mkString(",\n")
    s"""WITH $saCtes,
       |adj0 AS (
       |  SELECT doc_id, pos AS p,
       |    lead(pos, 1) OVER (PARTITION BY doc_id ORDER BY r) AS q
       |  FROM s$SaRounds
       |), adj AS MATERIALIZED (
       |  SELECT doc_id, p, q, CAST(0 AS BIGINT) AS acc
       |  FROM adj0 WHERE q IS NOT NULL
       |),
       |$folds
       |SELECT doc_id, acc AS lrs_len, lp AS lrs_pos FROM (
       |  SELECT doc_id, acc, least(p, q) AS lp,
       |    row_number() OVER (PARTITION BY doc_id
       |      ORDER BY acc DESC, least(p, q)) AS rn
       |  FROM f0)
       |WHERE rn = 1
       |ORDER BY doc_id""".stripMargin
  }
}
