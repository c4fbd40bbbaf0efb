package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{BusinessDay, Text}
import graft.operators.{AsOfJoin, Windows}

/** Edge-case unit coverage for the window/join/text operator surface. */
class OperatorsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  def d(s: String): java.sql.Date = java.sql.Date.valueOf(s)

  test("asof strict mode hides same-timestamp state rows") {
    import spark.implicits._
    val left = Seq((1L, 10L)).toDF("k", "t")
    val right = Seq((1L, 10L, 99.0)).toDF("k", "t", "v")
    val incl = AsOfJoin.backward(left, right, Seq("k"), "t", "t", Seq("v"))
      .collect()(0)
    assert(incl.getAs[Any]("v") == 99.0)
    val strict = AsOfJoin.backward(left, right, Seq("k"), "t", "t", Seq("v"),
      strict = true).collect()(0)
    assert(strict.isNullAt(strict.fieldIndex("v")))
  }

  test("invertedPercentile: ties share rank, nulls excluded, single row = 100") {
    import spark.implicits._
    val df = Seq(("a", Some(1.0)), ("a", Some(2.0)), ("a", Some(2.0)),
      ("a", None), ("b", Some(7.0))).toDF("g", "x")
    val out = Windows.invertedPercentile(df, col("g"), col("x"), "pct",
        lowerIsBetter = false)
      .collect().map(r => (r.getString(0), Option(r.getAs[Any]("x")),
        Option(r.getAs[Any]("pct")))).toSet
    // n=3 non-null in a: best pct 100 for the tied 2.0s ((1-0)*100),
    // 1.0 gets (1-(3-1)/2)*100 = 0; null row gets null pct
    assert(out.contains(("a", Some(2.0), Some(100.0))))
    assert(out.contains(("a", Some(1.0), Some(0.0))))
    assert(out.contains(("a", None, None)))
    // singleton partition: percent_rank 0 → 100
    assert(out.contains(("b", Some(7.0), Some(100.0))))
  }

  test("rankPivot returns values at exactly the requested ranks") {
    import spark.implicits._
    val df = Seq((1, d("2024-01-01"), 10.0), (1, d("2024-01-02"), 20.0),
      (1, d("2024-01-03"), 30.0)).toDF("k", "dt", "v")
    val out = Windows.rankPivot(df, col("k"), Seq(col("dt")), col("v"),
      Seq(1, 2, 5), "v_rn").collect()(0)
    assert(out.getAs[Double]("v_rn1") == 30.0) // latest
    assert(out.getAs[Double]("v_rn2") == 20.0)
    assert(out.isNullAt(out.fieldIndex("v_rn5"))) // beyond history
  }

  test("langId: und for no stopword hits; quality score bounded [0,1]") {
    import spark.implicits._
    val df = Seq("zzz qqq xxx", "the cat and the dog is in the house",
      "").toDF("text")
      .select(Text.langId(col("text")).as("lang"),
        Text.qualityScore(col("text")).as("q"))
    val rows = df.collect()
    assert(rows(0).getString(0) == "und")
    assert(rows(1).getString(0) == "en")
    rows.foreach(r => assert(r.getDouble(1) >= 0.0 && r.getDouble(1) <= 1.0))
  }

  test("native js_round expression matches the composed helper and codegens") {
    import spark.implicits._
    val df = (1 to 1000).map(i => i * 0.0137 - 5.0).toDF("x")
    val both = df.select(
      graft.functions.jsRound(col("x"), 3).as("composed"),
      graft.functions.JsRoundExpr.jsRoundNative(col("x"), 3).as("native"))
    assert(both.filter(col("composed") =!= col("native")).count() == 0)
    // registered SQL form
    graft.functions.JsRoundExpr.register(spark)
    df.createOrReplaceTempView("jsr_probe")
    val viaSql = spark.sql("SELECT js_round(x, 3) r FROM jsr_probe")
      .agg(sum("r")).collect()(0).getDouble(0)
    val viaCol = both.agg(sum("native")).collect()(0).getDouble(0)
    assert(viaSql == viaCol)
    // null propagates
    val n = Seq[Option[Double]](None).toDF("x")
      .select(graft.functions.JsRoundExpr.jsRoundNative(col("x"), 2).as("r"))
      .collect()(0)
    assert(n.isNullAt(0))
  }

  test("business-day navigation: next and shift snap over weekends") {
    import spark.implicits._
    // Jan 2024: 6th/7th and 13th/14th are weekends
    val cal = (1 to 20).map { i =>
      val dt = d(f"2024-01-$i%02d")
      val dow = java.time.LocalDate.parse(dt.toString).getDayOfWeek.getValue
      (dt, dow <= 5)
    }.toDF("calendar_date", "is_business_day")
    val df = Seq(Tuple1(d("2024-01-05"))).toDF("dt") // Friday
    val nxt = BusinessDay.next(df, "dt", cal).collect()(0)
      .getAs[java.sql.Date]("next_business_day")
    assert(nxt == d("2024-01-08")) // Monday
    val shifted = BusinessDay.addBusinessDays(
        Seq(Tuple1(d("2024-01-06"))).toDF("dt"), "dt", cal, 2) // Saturday
      .collect()(0).getAs[java.sql.Date]("shifted_day")
    // snaps to Fri 5th, +2 business days → Tue 9th
    assert(shifted == d("2024-01-09"))
  }

  test("business-day navigation preserves duplicate input rows") {
    import spark.implicits._
    val cal = (1 to 20).map { i =>
      val dt = d(f"2024-01-$i%02d")
      val dow = java.time.LocalDate.parse(dt.toString).getDayOfWeek.getValue
      (dt, dow <= 5)
    }.toDF("calendar_date", "is_business_day")
    // identical rows must stay distinct through navigation (the old
    // groupBy-all-columns formulation collapsed them to one)
    val dup = Seq(Tuple1(d("2024-01-05")), Tuple1(d("2024-01-05")),
      Tuple1(d("2024-01-10"))).toDF("dt")
    val nxt = BusinessDay.next(dup, "dt", cal)
    assert(nxt.count() == 3)
    assert(nxt.filter(col("next_business_day") === d("2024-01-08")).count() == 2)
    val shifted = BusinessDay.addBusinessDays(dup, "dt", cal, 1)
    assert(shifted.count() == 3)
    assert(shifted.filter(col("shifted_day") === d("2024-01-08")).count() == 2)
    // off-calendar date resolves to null, row still present
    val off = BusinessDay.next(Seq(Tuple1(d("2025-06-01"))).toDF("dt"), "dt", cal)
    assert(off.count() == 1 && off.collect()(0).isNullAt(1))
  }

  test("validateDense accepts a dense calendar and rejects a gapped one") {
    import spark.implicits._
    val dense = (1 to 10).map(i => (d(f"2024-01-$i%02d"), true))
      .toDF("calendar_date", "is_business_day")
    BusinessDay.validateDense(dense) // must not throw
    val gapped = dense.filter(col("calendar_date") =!= d("2024-01-05"))
    intercept[IllegalArgumentException] {
      BusinessDay.validateDense(gapped)
    }
  }

  test("VectorStats moments: exact sums match brute force across partitionings") {
    import spark.implicits._
    import graft.operators.VectorStats
    val vecs = Seq(
      Seq(1L, -2L, 3L), Seq(4L, 5L, -6L), Seq(-7L, 8L, 9L),
      Seq(10L, 0L, -1L), Seq(2L, 2L, 2L))
    val expS = Array(10L, 13L, 7L)
    val expSS = Array(170L, 97L, 131L)
    for (parts <- Seq(1, 2, 5)) {
      val df = vecs.toDF("v").repartition(parts)
      val m = df.agg(VectorStats.moments(col("v")).as("m"))
        .select("m.n", "m.s", "m.ss").collect()(0)
      assert(m.getLong(0) == 5L)
      assert(m.getSeq[Long](1).toArray.sameElements(expS), s"parts=$parts")
      assert(m.getSeq[Long](2).toArray.sameElements(expSS), s"parts=$parts")
    }
  }

  test("Quality.validate: exact counts, null predicate counts as violation, one row per rule") {
    import spark.implicits._
    import graft.operators.Quality
    val df = Seq[(java.lang.Long, String)]((1L, "a"), (-2L, "b"),
      (3L, null), (null, "a"), (5L, "c")).toDF("v", "s")
    val got = Quality.validate(df, Seq(
        "v_pos" -> (col("v") > 0), // null v -> null predicate -> violation
        "s_known" -> col("s").isin("a", "b"),
        "all_pass" -> lit(true)))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(got.size == 3)
    assert(got("v_pos") == ((5L, 2L, 0.4))) // -2 fails, null fails
    assert(got("s_known") == ((5L, 2L, 0.4))) // null s and 'c' fail
    assert(got("all_pass") == ((5L, 0L, 0.0)))
  }

  test("backwardWithin: stale matches nulled, boundary age inclusive, rows preserved") {
    import spark.implicits._
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val left = Seq((1L, t("2024-01-02 00:00:00"), "fresh"),
      (1L, t("2024-01-10 00:00:00"), "stale"),
      (1L, t("2024-01-02 00:00:01"), "boundary+1"),
      (2L, t("2024-01-05 00:00:00"), "nomatch"))
      .toDF("k", "ts", "tag")
    val right = Seq((1L, t("2024-01-01 00:00:00"), 42.0))
      .toDF("k", "ts", "v")
    val got = AsOfJoin.backwardWithin(left, right, Seq("k"), "ts", "ts",
        Seq("v"), maxAgeSec = 86400L)
      .collect().map(r => r.getAs[String]("tag") ->
        Option(r.getAs[java.lang.Double]("v"))).toMap
    assert(got.size == 4) // left-join row semantics preserved
    assert(got("fresh").contains(42.0)) // age == tolerance: inclusive
    assert(got("boundary+1").isEmpty) // one second past: nulled
    assert(got("stale").isEmpty)
    assert(got("nomatch").isEmpty)
  }

  test("ZOrder.interleave2 matches a reference bit-interleave; cluster tightens boxes") {
    import spark.implicits._
    import graft.operators.ZOrder
    def ref(a: Long, b: Long): Long =
      (0 until ZOrder.Bits).map { k =>
        (((a >> k) & 1L) << (2 * k)) | (((b >> k) & 1L) << (2 * k + 1))
      }.reduce(_ | _)
    val samples = Seq((0L, 0L), (1L, 0L), (0L, 1L), (65535L, 65535L),
      (0xAAAAL, 0x5555L), (12345L, 54321L), (40000L, 3L))
    val got = samples.toDF("a", "b")
      .select(ZOrder.interleave2(col("a"), col("b")).as("z")).as[Long]
      .collect()
    assert(got.toSeq == samples.map { case (a, b) => ref(a, b) })
    // locality: 256 points on a 16x16 grid z-clustered into 8 partitions —
    // every partition's bounding box must be far smaller than the grid
    val grid = (for (x <- 0L until 16L; y <- 0L until 16L) yield (x, y))
      .toDF("x", "y")
    val parts = ZOrder.cluster(grid, col("x") * 4096, col("y") * 4096, 8)
      .select(col("x"), col("y"))
      .rdd.mapPartitions { it =>
        val pts = it.map(r => (r.getLong(0), r.getLong(1))).toList
        if (pts.isEmpty) Iterator.empty
        else Iterator((pts.map(_._1).max - pts.map(_._1).min,
          pts.map(_._2).max - pts.map(_._2).min))
      }.collect()
    assert(parts.nonEmpty)
    parts.foreach { case (dx, dy) =>
      assert(dx.min(dy) <= 8 && dx.max(dy) <= 12, s"loose box ($dx,$dy)")
    }
  }

  test("mergePartials: merge of era partials equals full recompute, chains associatively") {
    import spark.implicits._
    import graft.operators.Incremental
    val rows = Seq(("a", 1L), ("a", 5L), ("b", 2L), ("b", 7L), ("c", 4L),
      ("a", 3L), ("c", 9L), ("d", 11L))
    def agg(part: Seq[(String, Long)]) =
      part.toDF("k", "v").groupBy("k")
        .agg(count(lit(1)).as("n"), sum(col("v")).as("s"),
          min(col("v")).as("mn"), max(col("v")).as("mx"))
    val full = agg(rows).collect().map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // two-way split with keys present on only one side (d only in tail)
    val merged2 = Incremental.mergePartials(agg(rows.take(3)),
        agg(rows.drop(3)), Seq("k"), Seq("n", "s"), Seq("mn"), Seq("mx"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(merged2 == full)
    // three-way chain (daily increments folding into standing state)
    val chained = Incremental.mergePartials(
      Incremental.mergePartials(agg(rows.take(2)), agg(rows.slice(2, 5)),
        Seq("k"), Seq("n", "s"), Seq("mn"), Seq("mx")),
      agg(rows.drop(5)), Seq("k"), Seq("n", "s"), Seq("mn"), Seq("mx"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(chained == full)
  }

  test("HeavyHitters: MG candidates are a superset of true heavy hitters; exact output") {
    import spark.implicits._
    import graft.operators.HeavyHitters
    // skewed stream: 'hot' 40%, 'warm' 15%, tail of 45 singletons repeated
    val stream = Seq.fill(400)("hot") ++ Seq.fill(150)("warm") ++
      (0 until 450).map(i => s"t${i % 45}")
    // adversarial arrangement: tail first, hitters last, few partitions
    val ds = (stream.sorted.reverse).toDS().repartition(3)
    val k = 8
    val n = stream.size
    val exact = stream.groupBy(identity).view.mapValues(_.size)
      .filter { case (_, c) => c.toLong * k > n }.keySet
    val cands = HeavyHitters.mgCandidates(ds, k).as[String].collect().toSet
    assert(exact.subsetOf(cands), s"missing ${exact -- cands}")
    val got = HeavyHitters.frequentItems(ds, k).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.keySet == exact)
    got.foreach { case (item, c) =>
      assert(c == stream.count(_ == item).toLong, item)
    }
  }

  test("PageRank: cycle stays uniform, star concentrates on hub, partitioning-invariant") {
    import spark.implicits._
    import graft.operators.PageRank
    val S = PageRank.DefaultScale
    // directed 3-cycle: every node has in=out=1 — ranks stay equal
    val cycle = Seq(("a", "b"), ("b", "c"), ("c", "a")).toDF("src", "dst")
    val cr = PageRank.run(cycle, 4).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(cr.values.toSet.size == 1, s"cycle ranks diverged: $cr")
    assert(cr("a") <= S && cr("a") > S * 15L / 100L)
    // star: spokes -> hub (and hub -> one spoke to avoid dangling hub)
    val star = ((1 to 8).map(i => (s"n$i", "hub")) :+ ("hub", "n1"))
      .toDF("src", "dst")
    val sr = PageRank.run(star, 3).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sr("hub") > sr("n2") * 4, s"hub not dominant: $sr")
    assert(sr("n1") > sr("n2"), "n1 receives the hub's mass")
    // exact integer propagation => identical results at any parallelism
    val sr8 = PageRank.run(star.repartition(8), 3).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sr8 == sr)
  }

  test("Triangles: K4, triangle-free cycle, bowtie, partitioning-invariant") {
    import spark.implicits._
    import graft.operators.Triangles
    def counts(edges: Seq[(Long, Long)], parts: Int = 1): Map[Long, Long] =
      Triangles.perNode(edges.toDF("u", "v").repartition(parts)).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // K4 (nodes 1-4): each node sits in C(3,2) = 3 triangles
    val k4 = Seq(1L -> 2L, 1L -> 3L, 1L -> 4L, 2L -> 3L, 2L -> 4L, 3L -> 4L)
    assert(counts(k4) == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    // C5 (nodes 5-9) has no triangles — empty result, not zero rows per node
    val c5 = Seq(5L -> 6L, 6L -> 7L, 7L -> 8L, 8L -> 9L, 9L -> 5L)
    assert(counts(c5).isEmpty)
    // bowtie: two triangles sharing vertex 10
    val bowtie = Seq(11L -> 12L, 11L -> 10L, 12L -> 10L,
      13L -> 14L, 13L -> 10L, 14L -> 10L)
    assert(counts(bowtie) ==
      Map(11L -> 1L, 12L -> 1L, 13L -> 1L, 14L -> 1L, 10L -> 2L))
    // exact integers => identical at any parallelism (distinct: k4 and
    // bowtie share the a-b and c-d pairs, and the contract is one row
    // per unordered pair)
    val merged = (k4 ++ bowtie).distinct
    assert(counts(merged, parts = 7) == counts(merged))
  }

  test("KCore.peel: onion layers on triangle+path, core degrees, fail-loud on round cap") {
    import spark.implicits._
    import graft.operators.KCore
    // triangle {1,2,3} with a path 3-4-5-6 hanging off; k=2 peels the
    // path one layer per round from the free end inward
    val edges = Seq(1L -> 2L, 2L -> 3L, 1L -> 3L,
      3L -> 4L, 4L -> 5L, 5L -> 6L).toDF("u", "v")
    val got = KCore.peel(spark, edges, k = 2, maxRounds = 10).collect()
      .map(r => r.getLong(0) -> (
        if (r.isNullAt(1)) None else Some(r.getLong(1)),
        if (r.isNullAt(2)) None else Some(r.getLong(2)))).toMap
    // triangle survives as the 2-core with in-core degree 2
    (1L to 3L).foreach(i => assert(got(i) == (None, Some(2L)), i))
    // onion layers: 6 (deg 1) peels in round 1, then 5, then 4
    assert(got(6L)._1.contains(1L))
    assert(got(5L)._1.contains(2L))
    assert(got(4L)._1.contains(3L))
    assert(Seq(4L, 5L, 6L).forall(got(_)._2.isEmpty))
    // fail-loud when the cap is too small for the path's layer count
    intercept[IllegalArgumentException] {
      KCore.peel(spark, edges, k = 2, maxRounds = 2).collect()
    }
  }

  test("KCore.peel: node whose edges all vanish in one round still peels (degree-0 case)") {
    import spark.implicits._
    import graft.operators.KCore
    // star: center 1 joined to leaves 2,3 (deg 2 = k), each leaf deg 1.
    // Round 1 peels both leaves; ALL of 1's edges vanish at once, so 1
    // is absent from the next round's degree table. The carried alive
    // set must peel it in round 2 with degree 0 — the r7 ADVICE hole
    // left it unclassified (both columns null).
    val edges = Seq(1L -> 2L, 1L -> 3L).toDF("u", "v")
    val got = KCore.peel(spark, edges, k = 2, maxRounds = 10).collect()
      .map(r => r.getLong(0) -> (
        if (r.isNullAt(1)) None else Some(r.getLong(1)),
        if (r.isNullAt(2)) None else Some(r.getLong(2)))).toMap
    assert(got(2L) == ((Some(1L), None)))
    assert(got(3L) == ((Some(1L), None)))
    assert(got(1L) == ((Some(2L), None)), "center must peel in round 2, not vanish")
  }

  test("RecordLinkage: FS weights and decision thresholds classify agreement patterns") {
    import spark.implicits._
    import graft.operators.RecordLinkage
    import graft.operators.RecordLinkage.Field
    // weight() is log2(m/u) in micro-units, exact floor(x*1e6+0.5)
    assert(RecordLinkage.weight(0.5, 0.5) == 0L)
    assert(RecordLinkage.weight(0.8, 0.2) == 2000000L)
    assert(RecordLinkage.weight(0.2, 0.8) == -2000000L)
    val pairs = Seq(
      (1L, true, true),   // both agree  -> +4M -> match
      (2L, true, false),  // one agrees  -> +1M -> possible
      (3L, false, false)  // none agree  -> -4M -> non_match
    ).toDF("id", "fa", "fb")
    val got = RecordLinkage.score(pairs,
      Seq(Field("fa", 2000000L, -1000000L), Field("fb", 2000000L, -1000000L)),
      matchT = 3000000L, possibleT = 0L)
      .select(col("id"), col("score_q"), col("decision"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    assert(got(1L) == ((4000000L, "match")))
    assert(got(2L) == ((1000000L, "possible")))
    assert(got(3L) == ((-2000000L, "non_match")))
  }

  test("Personalized PageRank: mass stays seed-reachable, proximity ordering, seeds dominate") {
    import spark.implicits._
    import graft.operators.PageRank
    // chain s -> a -> b plus an unreachable pair x <-> y; seed = {s}
    val edges = Seq(("s", "a"), ("a", "b"), ("x", "y"), ("y", "x"))
      .toDF("src", "dst")
    val seeds = Seq("s").toDF("node")
    val r = PageRank.runPersonalized(edges, seeds, 3).collect()
      .map(row => row.getString(0) -> (row.getBoolean(1), row.getLong(2)))
      .toMap
    // nodes unreachable from the seed accrue NO mass (global PR gives
    // every node base mass — the defining difference)
    assert(r("x")._2 == 0L && r("y")._2 == 0L)
    // proximity ordering: seed > 1-hop > 2-hop, all positive
    assert(r("s")._2 > r("a")._2 && r("a")._2 > r("b")._2 && r("b")._2 > 0L)
    assert(r("s")._1 && !r("a")._1)
    // partitioning-invariant exact integers
    val r8 = PageRank.runPersonalized(edges.repartition(8), seeds, 3)
      .collect().map(row => row.getString(0) -> row.getLong(2)).toMap
    assert(r8 == r.view.mapValues(_._2).toMap)
  }

  test("VectorStats moments: null rows skipped, ragged vectors rejected, overflow fails loudly") {
    import spark.implicits._
    import graft.operators.VectorStats
    val withNull = Seq(Some(Seq(1L, 2L)), None, Some(Seq(3L, 4L)))
      .toDF("v")
    val m = withNull.agg(VectorStats.moments(col("v")).as("m"))
      .select("m.n", "m.s").collect()(0)
    assert(m.getLong(0) == 2L && m.getSeq[Long](1) == Seq(4L, 6L))
    val ragged = Seq(Seq(1L, 2L), Seq(3L)).toDF("v").coalesce(1)
    intercept[org.apache.spark.SparkException] {
      ragged.agg(VectorStats.moments(col("v")).as("m")).collect()
    }
    // Σv² for 3e9 twice exceeds 2^63 — must throw, not wrap
    val big = Seq(Seq(3000000000L), Seq(3000000000L)).toDF("v").coalesce(1)
    intercept[org.apache.spark.SparkException] {
      big.agg(VectorStats.moments(col("v")).as("m")).collect()
    }
  }
}
