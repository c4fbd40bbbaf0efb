package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, Packing, Sampling}

class CurationSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  // ---------------- content-defined chunking ----------------

  test("cdc chunks: cover exactly, boundaries are content-defined (substitution is local)") {
    import spark.implicits._
    import graft.queries.Curation
    val rnd = new scala.util.Random(7)
    val base = (1 to 400).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    // substitute ONE char at position 200 (0-based); lengths equal
    val edited = base.updated(200, if (base(200) == 'q') 'z' else 'q')
    val chunks = Curation.cdcChunks(
        Seq((1L, base), (2L, edited)).toDF("doc_id", "text"))
      .collect()
      .groupBy(_.getLong(0))
      .view.mapValues(_.map(r =>
        (r.getLong(1), r.getLong(2), r.getLong(3))).sortBy(_._1)).toMap
    // chunks tile the doc exactly: starts chain, ends at length
    chunks.values.foreach { cs =>
      assert(cs.head._2 == 1L && cs.last._3 == 400L)
      cs.sliding(2).foreach {
        case Array((_, _, e1), (_, s2, _)) => assert(s2 == e1 + 1)
        case _ =>
      }
    }
    // the gear hash's 2^32 modulus forgets a char after 32 shifts, so
    // every boundary at positions > 200+32 must appear in BOTH docs —
    // the content-defined property a fixed-width chunker lacks
    val ends1 = chunks(1L).map(_._3).filter(_ > 233L).toSet
    val ends2 = chunks(2L).map(_._3).filter(_ > 233L).toSet
    assert(ends1 == ends2 && ends1.nonEmpty)
    // and the edit DID move something locally (sanity that the test bites)
    assert(chunks(1L) != chunks(2L))
  }

  // ---------------- exact AUC ----------------

  test("aucBySource: perfect=1, reversed=0, all-ties=0.5, midrank formula, degenerate=null") {
    import spark.implicits._
    import graft.queries.Curation
    def auc(rows: Seq[(String, Long, Long)]): Map[String, (Long, Option[Double])] =
      Curation.aucBySource(rows.toDF("source", "score", "pos")).collect()
        .map(r => r.getString(0) ->
          (r.getLong(3), if (r.isNullAt(4)) None else Some(r.getDouble(4))))
        .toMap
    // perfect separation (all positives score higher) → AUC 1;
    // reversed → 0; constant score → every pair is a tie → 0.5
    val m = auc(Seq(
      ("perf", 10L, 1L), ("perf", 11L, 1L), ("perf", 1L, 0L), ("perf", 2L, 0L),
      ("rev", 1L, 1L), ("rev", 2L, 1L), ("rev", 10L, 0L), ("rev", 11L, 0L),
      ("tie", 5L, 1L), ("tie", 5L, 1L), ("tie", 5L, 0L), ("tie", 5L, 0L),
      ("onecls", 3L, 1L), ("onecls", 4L, 1L)))
    assert(m("perf")._2.contains(1.0))
    assert(m("rev")._2.contains(0.0))
    assert(m("tie")._2.contains(0.5))
    assert(m("onecls")._2.isEmpty) // no negatives → AUC undefined, not 0/0
    // hand-checked midrank case: pos scores {3,1}, neg {2,1}
    // ranks: score1 → midrank 1.5 (×2), score2 → 3, score3 → 4
    // R+ = 4 + 1.5 = 5.5; AUC = (5.5 - 3)/4 = 0.625
    val h = auc(Seq(("h", 3L, 1L), ("h", 1L, 1L), ("h", 2L, 0L), ("h", 1L, 0L)))
    assert(h("h")._1 == 5L && h("h")._2.contains(0.625))
  }

  test("mixture plan: takes sum exactly to language budgets, never oversample, budget maximal") {
    import graft.queries.Curation
    val rows = Curation.q149MixturePlan(spark, "/root/testdata/sf0.001")
      .collect()
    assert(rows.nonEmpty)
    // no source oversampled (≤ 1 epoch) and rates in [0, 1]
    rows.foreach { r =>
      assert(r.getAs[Long]("take") <= r.getAs[Long]("tokens"), r)
      val rate = r.getAs[Double]("rate")
      assert(rate >= 0.0 && rate <= 1.0, r)
    }
    // Hamilton apportionment: per-language takes sum EXACTLY to b_l
    rows.groupBy(_.getAs[String]("lang")).foreach { case (lang, rs) =>
      assert(rs.map(_.getAs[Long]("take")).sum ==
        rs.head.getAs[Long]("lang_budget"), lang)
    }
    // budget maximality: the binding language's b_l uses (nearly) all its
    // tokens — some language must be within #sources of its total
    val binding = rows.groupBy(_.getAs[String]("lang")).exists {
      case (_, rs) =>
        val bl = rs.head.getAs[Long]("lang_budget")
        val tl = rs.head.getAs[Long]("lang_tokens")
        bl <= tl && tl - bl < Curation.MixDen
    }
    assert(binding, "no language is budget-binding")
  }

  // ---------------- stratified hash sampling ----------------

  test("stratified hash sample: deterministic, stable under appends, ~rate") {
    import spark.implicits._
    val docs = (0L until 2000L).map(i =>
      (i, if (i % 4 == 0) "en" else "ja")).toDF("doc_id", "lang")
    val rates = Map("en" -> 250, "ja" -> 500)
    val s1 = Sampling.stratifiedHash(docs, "doc_id", "lang", rates, 1000)
      .select("doc_id").as[Long].collect().toSet
    // deterministic: same input → same draw
    val s2 = Sampling.stratifiedHash(docs, "doc_id", "lang", rates, 1000)
      .select("doc_id").as[Long].collect().toSet
    assert(s1 == s2)
    // append-stable: membership of existing ids unchanged by new rows
    val more = docs.unionByName(
      (2000L until 2500L).map(i => (i, "en")).toDF("doc_id", "lang"))
    val s3 = Sampling.stratifiedHash(more, "doc_id", "lang", rates, 1000)
      .select("doc_id").as[Long].collect().toSet
    assert(s3.filter(_ < 2000L) == s1)
    // rate: binomial(500, .25) and binomial(1500, .5) within 5 sigma
    val en = s1.count(_ % 4 == 0)
    val ja = s1.size - en
    assert(math.abs(en - 125.0) < 5 * math.sqrt(500 * 0.25 * 0.75), s"en=$en")
    assert(math.abs(ja - 750.0) < 5 * math.sqrt(1500 * 0.5 * 0.5), s"ja=$ja")
  }

  test("stratified hash sample: default rate keeps unlisted strata whole") {
    import spark.implicits._
    val docs = (0L until 100L).map(i => (i, "de")).toDF("doc_id", "lang")
    val kept = Sampling.stratifiedHash(docs, "doc_id", "lang",
      Map("en" -> 0), 1000)
    assert(kept.count() == 100L)
  }

  // ---------------- sequence packing ----------------

  test("two-phase packed prefix == naive single-window prefix") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    // sparse, shuffled ids across 3 strata; token counts incl. zeros
    val rows = rnd.shuffle((0 until 3000).toList).take(1700).map { i =>
      (i.toLong * 7 % 5000, Seq("en", "ja", "de")(i % 3),
        rnd.nextInt(900).toLong)
    }.distinct
    val docs = rows.toDF("doc_id", "lang", "n_tokens")
      .groupBy("doc_id", "lang").agg(max("n_tokens").as("n_tokens"))
    val got = Packing.packSequences(docs, "doc_id", "lang", "n_tokens",
        seqLen = 512L, bucketWidth = 100L)
      .select(col("doc_id"), col("lang"), col("pack_id"), col("pack_offset"))
    val w = Window.partitionBy(col("lang")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val want = docs
      .withColumn("__start", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .select(col("doc_id"), col("lang"),
        expr("__start div 512").as("pack_id"),
        (col("__start") % 512).as("pack_offset"))
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("packing semantics: offsets advance by token count within a pack") {
    import spark.implicits._
    val docs = Seq(
      (1L, "en", 100L), (2L, "en", 400L), (3L, "en", 20L), (4L, "en", 600L),
      (5L, "ja", 512L), (6L, "ja", 1L)).toDF("doc_id", "lang", "n_tokens")
    val out = Packing.packSequences(docs, "doc_id", "lang", "n_tokens", 512L, 2L)
      .select("doc_id", "pack_id", "pack_offset").as[(Long, Long, Long)]
      .collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(out(1L) == (0L, 0L))   // starts the en stream
    assert(out(2L) == (0L, 100L))
    assert(out(3L) == (0L, 500L)) // starts at token 500, spills into pack 1
    assert(out(4L) == (1L, 8L))   // 520 tokens in → second sequence
    assert(out(5L) == (0L, 0L))   // strata independent
    assert(out(6L) == (1L, 0L))   // exact boundary rolls to next pack
  }

  // ---------------- vocab coverage ----------------

  test("vocab top-K is deterministic on count ties; OOV rate exact") {
    import spark.implicits._
    // corpus where "bb" and "cc" tie on count — K=2 must pick {aa, bb}
    // (count desc, then token asc), never {aa, cc}
    val docs = Seq(
      (1L, "aa aa aa bb cc"),
      (2L, "aa bb cc dd")).toDF("doc_id", "text")
    val toks = docs.select(col("doc_id"),
        explode(split(graft.functions.Text.normalize(col("text")), " "))
          .as("tok"))
      .filter(length(col("tok")) > 0)
    val vocab = toks.groupBy(col("tok")).agg(count(lit(1)).as("__cnt"))
      .orderBy(col("__cnt").desc, col("tok")).limit(2)
      .select("tok").as[String].collect().toSet
    assert(vocab == Set("aa", "bb"))
  }

  // ---------------- winnow containment ----------------

  test("containment flags a doc embedded in a larger one; df cap suppresses") {
    import spark.implicits._
    val quote = "the seventeen silver llamas crossed the frozen river at dawn " +
      "carrying baskets of rare mountain tea toward the northern market"
    val host = "completely unrelated preamble text goes here first and then " +
      quote + " and afterwards the chronicle wanders into other business " +
      "entirely, describing harvests, weather, and the price of salt"
    val other = "this text shares nothing with the quoted passage above and " +
      "speaks only of shipping manifests, tide tables, and harbor fees"
    val docs = Seq((1L, quote), (2L, host), (3L, other)).toDF("doc_id", "text")
    val fps = Dedup.winnowFingerprints(docs, "doc_id", "text", 5, 8)
    val pairs = Dedup.containmentPairs(fps, "doc_id", maxDf = 50,
        minContainment = 0.5)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
    // df cap = 1 drops every shared fingerprint → no pairs at all
    val capped = Dedup.containmentPairs(fps, "doc_id", maxDf = 1,
      minContainment = 0.0)
    assert(capped.count() == 0L)
  }

  // ---------------- corpus-cleaning program ----------------

  test("q70 gates compose: keep is the AND, reason is the first failure") {
    val rows = graft.queries.Curation
      .q70CorpusClean(spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val lang = r.getAs[Boolean]("lang_ok")
      val qual = r.getAs[Boolean]("quality_ok")
      val rep = r.getAs[Boolean]("repetition_ok")
      val len = r.getAs[Boolean]("length_ok")
      assert(r.getAs[Boolean]("keep") == (lang && qual && rep && len))
      val expected =
        if (!lang) "lang" else if (!qual) "quality"
        else if (!rep) "repetition" else if (!len) "length" else null
      assert(r.getAs[String]("reason") == expected)
    }
    // the gates actually discriminate on this corpus (not all-keep)
    assert(rows.exists(!_.getAs[Boolean]("keep")))
    assert(rows.exists(_.getAs[Boolean]("keep")))
  }

  // ---------------- training manifest (capstone) ----------------

  test("training manifest agrees with every stage it composes") {
    import graft.queries.Curation
    val dir = "/root/testdata/sf0.001"
    val m = Curation.q76TrainingManifest(spark, dir).collect()
    assert(m.nonEmpty)
    val ids = m.map(_.getAs[Long]("doc_id")).toSet
    // the benchmark source never trains
    assert(m.forall(_.getAs[String]("source") != Curation.DecontamEvalSource))
    // survivors are a subset of the sampled, clean, uncontaminated docs
    val sampled = Curation.q63StratifiedSample(spark, dir)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(ids.subsetOf(sampled))
    val kept = Curation.q70CorpusClean(spark, dir).collect()
      .filter(_.getAs[Boolean]("keep")).map(_.getAs[Long]("doc_id")).toSet
    assert(ids.subsetOf(kept))
    val contaminated = Curation.q68Decontamination(spark, dir).collect()
      .filter(_.getAs[Boolean]("contaminated"))
      .map(_.getAs[Long]("doc_id")).toSet
    assert(ids.intersect(contaminated).isEmpty)
    // positions are dense 0..n-1 within every shard
    m.groupBy(_.getAs[Int]("shard")).values.foreach { rows =>
      assert(rows.map(_.getAs[Long]("pos")).sorted
        .sameElements(rows.indices.map(_.toLong)))
    }
  }

  // ---------------- shard assignment ----------------

  test("shard assign: deterministic, membership append-stable, dense pos") {
    import spark.implicits._
    val docs = (0L until 500L).map(i => (i, s"doc$i")).toDF("doc_id", "text")
    val a = Sampling.shardAssign(docs, "doc_id", 8)
      .select("doc_id", "shard", "pos")
      .as[(Long, Int, Long)].collect().sortBy(_._1)
    val b = Sampling.shardAssign(docs, "doc_id", 8)
      .select("doc_id", "shard", "pos")
      .as[(Long, Int, Long)].collect().sortBy(_._1)
    assert(a.sameElements(b)) // reproducible
    // every shard's positions are dense 0..n-1
    a.groupBy(_._2).foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted.sameElements(rows.indices.map(_.toLong)))
    }
    // membership append-stable: adding docs never moves an existing doc
    val more = docs.unionByName(
      (500L until 600L).map(i => (i, s"doc$i")).toDF("doc_id", "text"))
    val c = Sampling.shardAssign(more, "doc_id", 8)
      .select("doc_id", "shard").as[(Long, Int)].collect().toMap
    a.foreach { case (id, shard, _) => assert(c(id) == shard) }
  }

  // ---------------- chunking ----------------

  test("chunking covers every char with bounded overlap; tail may be short") {
    import spark.implicits._
    import graft.queries.Curation.{ChunkSize, ChunkStride}
    val dir = "/root/testdata/sf0.001"
    val lens = Tables.documents(spark, dir)
      .select(col("doc_id"),
        length(graft.functions.Text.normalize(col("text"))).cast("long"))
      .as[(Long, Long)].collect().toMap
    val chunks = graft.queries.Curation.q75Chunking(spark, dir)
      .select("doc_id", "chunk_id", "start", "chunk_len")
      .as[(Long, Long, Long, Long)].collect()
      .groupBy(_._1).map { case (id, cs) => id -> cs.sortBy(_._2) }
    assert(chunks.keySet == lens.keySet)
    chunks.foreach { case (id, cs) =>
      // dense chunk ids from 0, starts on the stride grid
      assert(cs.map(_._2).sameElements(cs.indices.map(_.toLong)))
      cs.foreach { case (_, cid, st, _) => assert(st == 1 + cid * ChunkStride) }
      // full coverage: first chunk at 1, last chunk reaches the final char,
      // consecutive chunks overlap (stride < size)
      assert(cs.head._3 == 1L)
      assert(cs.last._3 + cs.last._4 - 1 == lens(id))
      assert(cs.forall(_._4 <= ChunkSize))
      cs.sliding(2).foreach {
        case Array((_, _, s1, l1), (_, _, s2, _)) => assert(s2 <= s1 + l1)
        case _ =>
      }
    }
  }

  // ---------------- unigram-LM score ----------------

  test("q72 lm score: negative mean logprob, common-token docs score higher") {
    val rows = graft.queries.Curation
      .q72LmScore(spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    // every token prob < 1 → every per-doc mean logprob is negative, and
    // the integer carrier reconstructs it: sum_lp6/1e6/n == avg_logprob
    rows.foreach { r =>
      val avg = r.getAs[Double]("avg_logprob")
      assert(avg < 0.0)
      assert(math.abs(avg - r.getAs[Long]("sum_lp6").toDouble / 1e6 /
        r.getAs[Long]("n_tokens")) < 1e-12)
    }
  }

  // ---------------- BM25 ranking ----------------

  test("q71 bm25: scores positive, sorted desc, capped at top-k") {
    val rows = graft.queries.TextQueries
      .q71Bm25(spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty &&
      rows.length <= graft.queries.TextQueries.Bm25TopK)
    val scores = rows.map(_.getAs[Double]("bm25"))
    assert(scores.forall(_ > 0.0))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
  }

  test("token-budget selection keeps a contiguous quality prefix within budget per source") {
    val rows = graft.queries.Curation
      .q101TokenBudget(spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    val bySource = rows.groupBy(_.getAs[String]("source"))
    bySource.foreach { case (src, rs) =>
      val ranks = rs.map(_.getAs[Int]("sel_rank")).sorted
      assert(ranks.toSeq == (1 to ranks.length), s"$src ranks not a prefix")
      assert(rs.map(_.getAs[Long]("cum_tokens")).max <=
        graft.queries.Curation.TokenBudget, src)
      // running sum consistency: cum at rank k = sum of n_tokens through k
      val byRank = rs.sortBy(_.getAs[Int]("sel_rank"))
      val cums = byRank.scanLeft(0L)(_ + _.getAs[Int]("n_tokens").toLong).tail
      assert(byRank.map(_.getAs[Long]("cum_tokens")).toSeq == cums.toSeq, src)
    }
  }

  test("bigram LM scores every held-out doc, log-probs negative, terciles populated") {
    val rows = graft.queries.Curation
      .q100BigramLm(spark, "/root/testdata/sf0.001").collect()
    // held-out split = odd doc_ids; synthetic docs all have >= 2 tokens
    assert(rows.nonEmpty && rows.forall(_.getAs[Long]("doc_id") % 2 == 1))
    assert(rows.forall(_.getAs[Long]("sum_lp6") < 0L))
    assert(rows.forall(r => r.getAs[Long]("n_bigrams") > 0))
    val buckets = rows.groupBy(r =>
      (r.getAs[String]("lang"), r.getAs[String]("bucket")))
      .view.mapValues(_.length).toMap
    val perLang = rows.groupBy(_.getAs[String]("lang")).view.mapValues(_.length)
    perLang.foreach { case (lang, n) =>
      if (n >= 6) {
        // terciles: each bucket within a factor-2 band of n/3 (ties can skew)
        Seq("head", "middle", "tail").foreach { b =>
          val c = buckets.getOrElse((lang, b), 0)
          assert(c > 0 && c <= 2 * (n / 3 + 1), s"$lang/$b: $c of $n")
        }
      }
    }
  }

  test("BPE training: greedy non-overlap, composed merges, deterministic ties") {
    import spark.implicits._
    // "aaaab": (a,a) appears 3 times overlapping but greedy left-to-right
    // merges only positions (1,2) and (3,4) -> "aa aa b"; next round the
    // composed pair (aa,aa) must win, proving merged symbols re-enter the
    // pair alphabet
    val docs = Seq.fill(5)("aaaab dd dd").zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val m = graft.operators.Bpe.trainMerges(docs, "text", 3)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getLong(3)))
    // round 0: (a,a) cnt 3*5=15 beats (d,d) cnt 2*5=10... per-word freq:
    // word "aaaab" freq 5 -> pairs aa,aa,aa,ab each weighted 5
    assert(m(0) == ((0, "a", "a", 15L)))
    // round 1: "aa aa b" -> pair (aa,aa) cnt 5, (aa,b) 5, (d,d) 10: dd wins
    assert(m(1) == ((1, "d", "d", 10L)))
    // round 2: (aa,aa) vs (aa,b) tie at 5 -> lexicographic: (aa,aa) < (aa,b)
    assert(m(2) == ((2, "aa", "aa", 5L)))
    // encode side: the same merges applied to the vocabulary
    val enc = graft.operators.Bpe.trainAndEncode(docs, "text", 3)._2
      .collect().map(r => r.getString(0) -> (r.getString(1), r.getLong(2)))
      .toMap
    assert(enc("aaaab") == (("aaaa b", 2L)))
    assert(enc("dd") == (("dd", 1L)))
  }

  test("balanceToMinority: every stratum lands on exactly the min count") {
    import spark.implicits._
    val df = ((1 to 100).map(i => (i.toLong, "en")) ++
      (101 to 130).map(i => (i.toLong, "ja")) ++
      (131 to 140).map(i => (i.toLong, "de"))).toDF("doc_id", "lang")
    val kept = Sampling.balanceToMinority(df, "doc_id", "lang").collect()
    val byLang = kept.groupBy(_.getString(1)).view.mapValues(_.length).toMap
    assert(byLang == Map("en" -> 10, "ja" -> 10, "de" -> 10))
    // deterministic: re-running picks the identical set
    val again = Sampling.balanceToMinority(df, "doc_id", "lang")
      .collect().map(_.getLong(0)).toSet
    assert(again == kept.map(_.getLong(0)).toSet)
  }

  test("Markov attribution: planted chains solve to the analytic absorption values") {
    import graft.queries.Attribution
    val S = Attribution.AttrScale
    // acyclic chain: START -> A always; A -> CONV 3 of 4, A -> DROP 1 of 4
    // exact after two rounds: v(A) = 3S div 4, v(START) = v(A)
    val c1 = Map(("START", "A") -> 10L, ("A", "CONV") -> 3L, ("A", "DROP") -> 1L)
    assert(Attribution.solveChain(c1, None) == 3L * S / 4L)
    assert(Attribution.solveChain(c1, Some("A")) == 0L)
    // two channels: START -> A (1) / B (1); A -> CONV; B -> DROP
    // base = S/2; removing A kills everything; removing B changes nothing
    val c2 = Map(("START", "A") -> 5L, ("START", "B") -> 5L,
      ("A", "CONV") -> 5L, ("B", "DROP") -> 5L)
    assert(Attribution.solveChain(c2, None) == S / 2L)
    assert(Attribution.solveChain(c2, Some("A")) == 0L)
    assert(Attribution.solveChain(c2, Some("B")) == S / 2L)
    // cycle A <-> B with leak to CONV: geometric convergence within
    // 2^-20 of the analytic fixed point p = (1/2)/(1 - 1/4) = 2/3
    val c3 = Map(("START", "A") -> 1L, ("A", "CONV") -> 1L, ("A", "B") -> 1L,
      ("B", "A") -> 1L, ("B", "DROP") -> 1L)
    val p = Attribution.solveChain(c3, None).toDouble / S
    assert(math.abs(p - 2.0 / 3.0) < 1e-6, s"cyclic fixed point: $p")
    // full program: effects in [0, base], one row per non-START channel
    val spark = SparkTestSession.spark
    val out = Attribution
      .q210MarkovAttribution(spark, "/root/testdata/sf0.001").collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (base, rem, eff) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(eff == base - rem)
      assert(rem >= 0L && rem <= base, s"${r.getString(0)}: $rem vs $base")
    }
  }

  test("unigram Viterbi equals exhaustive segmentation search on planted vocabularies") {
    import graft.queries.Unigram
    // exhaustive ground truth: enumerate EVERY segmentation into vocab
    // pieces, take max score then fewest pieces
    def exhaustive(t: String, vocab: Map[String, Long]): (Long, Long) = {
      def go(i: Int): Seq[(Long, Long)] =
        if (i == t.length) Seq((0L, 0L))
        else (1 to math.min(Unigram.UgMaxLen, t.length - i)).flatMap { l =>
          vocab.get(t.substring(i, i + l)).toSeq.flatMap { sc =>
            go(i + l).map { case (s2, n2) => (sc + s2, n2 + 1L) }
          }
        }
      val all = go(0)
      val best = all.map(_._1).max
      (all.filter(_._1 == best).map(_._2).min, best)
    }
    val vocabs = Seq(
      // favors long pieces: "abab" beats a+b+a+b
      Map("a" -> -5000L, "b" -> -5100L, "ab" -> -3000L, "abab" -> -4000L,
        "ba" -> -3100L),
      // tie-inducing: "aa"+"a" == "a"+"aa" — fewest-pieces break matters
      Map("a" -> -1000L, "aa" -> -2000L, "aaa" -> -3000L),
      // single chars only fallback
      Map("a" -> -700L, "b" -> -900L, "c" -> -1100L))
    val texts = Seq("ababab", "aaaaa", "abcabcba", "aabbaabb", "cab")
    for (v <- vocabs; t <- texts
         if t.forall(c => v.contains(c.toString))) {
      val got = Unigram.viterbi(7L, t, v)
      val (en, es) = exhaustive(t, v)
      assert(got.total_score == es, s"$t score ${got.total_score} != $es")
      assert(got.n_pieces == en, s"$t pieces ${got.n_pieces} != $en")
    }
    // full program smoke over real data: scores negative, pieces within
    // [ceil(n/4), n], deterministic across runs
    val spark = SparkTestSession.spark
    val out = Unigram.q208UnigramSegment(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.nonEmpty)
    val lens = Tables.documents(spark, "/root/testdata/sf0.001")
      .selectExpr("doc_id", "length(text) AS n").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    out.foreach { case (id, np, sc) =>
      val n = lens(id)
      assert(sc < 0L)
      assert(np >= (n + Unigram.UgMaxLen - 1) / Unigram.UgMaxLen && np <= n,
        s"doc $id: $np pieces for $n chars")
    }
  }
}
