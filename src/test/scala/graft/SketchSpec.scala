package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Text
import graft.operators.HllSketch
import graft.queries.Curation

class SketchSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  test("HLL estimate is within the 1.04/sqrt(m) error envelope of exact") {
    import spark.implicits._
    val n = 20000
    val df = (1 to n).map(i => s"user-$i").toDF("v")
      .select(Text.hash60(col("v")).as("h"))
    val r = df.agg(HllSketch.hll60(col("h")).as("hll"))
      .select(col("hll.hll_estimate")).collect()(0).getDouble(0)
    // 3 sigma at p=10: 3 * 1.04/32 ≈ 9.8%
    assert(math.abs(r - n) / n < 0.098, s"estimate $r vs exact $n")
  }

  test("HLL registers merge associatively: union sketch == sketch of union") {
    import spark.implicits._
    val a = (1 to 5000).map(i => s"a-$i")
    val b = (3000 to 8000).map(i => s"a-$i") // overlap 3000..5000
    def est(vs: Seq[String], parts: Int) =
      vs.toDF("v").repartition(parts)
        .select(Text.hash60(col("v")).as("h"))
        .agg(HllSketch.hll60(col("h")).as("hll"))
        .select(col("hll.s51"), col("hll.est6")).collect()(0)
    // partial-aggregation merge across many partitions must reach the
    // identical register state (s51 is a lossless register digest)
    val u1 = est(a ++ b, 1)
    val u32 = est(a ++ b, 32)
    assert(u1 == u32)
  }

  test("HLL rho math matches the oracle formulation on edge words") {
    // w = 0 → rho 51; w = 1 → bitlen 1 → rho 50; w = 2^49 → bitlen 50 → rho 1
    def rho(h: Long): Int = {
      val w = h >>> HllSketch.HllP
      if (w == 0L) HllSketch.HllRhoMax
      else HllSketch.HllRhoMax - (64 - java.lang.Long.numberOfLeadingZeros(w))
    }
    assert(rho(5L) == 51)                      // register 5, word 0
    assert(rho(1024L) == 50)                   // word 1
    assert(rho((1L << 49) << 10) == 1)         // top word bit
    assert((1L to 51L).forall(k => 1L << (51 - k) > 0))
  }

  test("q81 selects exactly DsirTopK docs and scores favor the target source") {
    val r = Curation.q81DsirImportance(spark, sf)
    val sel = r.filter(col("selected")).count()
    assert(sel == Curation.DsirTopK)
    // the target source's own docs must score above the corpus mean on
    // average — the importance ratio is meant to find target-like text
    val docs = Tables.documents(spark, sf).select(col("doc_id"), col("source"))
    val j = r.join(docs, Seq("doc_id"))
    val tAvg = j.filter(col("source") === Curation.DsirTargetSource)
      .agg(avg(col("avg_logratio"))).collect()(0).getDouble(0)
    val rAvg = j.filter(col("source") =!= Curation.DsirTargetSource)
      .agg(avg(col("avg_logratio"))).collect()(0).getDouble(0)
    assert(tAvg > rAvg, s"target avg $tAvg !> rest avg $rAvg")
  }

  test("q85 weighted sample favors longer docs and is append-stable") {
    val r = Curation.q85WeightedSample(spark, sf)
    val sampledAvg = r.agg(avg(col("n_chars"))).collect()(0).getDouble(0)
    val corpusAvg = Tables.documents(spark, sf)
      .agg(avg(col("n_chars"))).collect()(0).getDouble(0)
    assert(sampledAvg > corpusAvg,
      s"length-weighted draw avg $sampledAvg !> corpus avg $corpusAvg")
    // the score is a pure per-row function (append-stable by
    // construction): recompute one sampled row's key JVM-side from md5
    val row = r.orderBy(col("doc_id")).limit(1)
      .select(col("doc_id"), col("n_chars"), col("lnu6"), col("es_score"))
      .collect()(0)
    val md5 = java.security.MessageDigest.getInstance("MD5")
      .digest(row.getLong(0).toString.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val h60 = java.lang.Long.parseLong(md5.take(15), 16)
    val lnu6 = math.floor(
      math.log((h60 + 1).toDouble / 1152921504606846976.0) * 1e6 + 0.5).toLong
    assert(row.getLong(2) == lnu6)
    assert(row.getDouble(3) == lnu6.toDouble / row.getLong(1))
  }

  test("q90 sketch quantiles bracket the exact: lo <= exact < 2*lo") {
    // the log2-bucket guarantee: the true quantile lies in the reported
    // bucket [2^(b-1), 2^b)
    Curation.q90QuantileSketch(spark, sf).collect().foreach { r =>
      for ((lo, ex) <- Seq((2, 3), (4, 5), (6, 7))) {
        val l = r.getLong(lo); val e = r.getLong(ex)
        assert(l <= e && e < 2 * l,
          s"${r.getString(0)}: exact $e outside bucket [$l, ${2 * l})")
      }
    }
  }

  test("native dot/sumSquares are bit-identical to the interpreted folds") {
    import spark.implicits._
    import graft.functions.VectorExprs
    val rnd = new scala.util.Random(42)
    val rows = (1 to 200).map { i =>
      (i.toLong, Array.fill(64)(rnd.nextDouble() * 2 - 1),
        Array.fill(64)(rnd.nextDouble() * 2 - 1))
    }
    val df = rows.toDF("id", "a", "b")
      .select(col("id"),
        expr("transform(a, x -> CAST(x AS DOUBLE))").as("a"),
        expr("transform(b, x -> CAST(x AS DOUBLE))").as("b"))
    val cmp = df.select(col("id"),
        VectorExprs.dot(col("a"), col("b")).as("nat"),
        aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
          lit(0.0), (acc, x) => acc + x).as("old"),
        VectorExprs.sumSquares(col("a")).as("natq"),
        aggregate(col("a"), lit(0.0), (acc, x) => acc + x * x).as("oldq"))
      .collect()
    cmp.foreach { r =>
      // bit-identical, not approximately equal: same ascending fold
      assert(java.lang.Double.doubleToLongBits(r.getDouble(1)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(2)), s"dot @${r.getLong(0)}")
      assert(java.lang.Double.doubleToLongBits(r.getDouble(3)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(4)), s"ssq @${r.getLong(0)}")
    }
    // degenerate shapes: length mismatch and null elements poison to null
    // in BOTH formulations
    val deg = spark.sql(
      """SELECT CAST(array(1.0, 2.0) AS ARRAY<DOUBLE>) AS a,
        |  CAST(array(1.0) AS ARRAY<DOUBLE>) AS b,
        |  CAST(array(1.0, NULL) AS ARRAY<DOUBLE>) AS c""".stripMargin)
      .select(
        VectorExprs.dot(col("a"), col("b")).as("mismatch"),
        aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
          lit(0.0), (acc, x) => acc + x).as("mismatch_old"),
        VectorExprs.dot(col("a"), col("c")).as("nullelem"),
        VectorExprs.sumSquares(col("c")).as("nullsq"))
      .collect()(0)
    assert(deg.isNullAt(0) && deg.isNullAt(1) && deg.isNullAt(2) && deg.isNullAt(3))
  }

  test("streaming HLL windows: registers match batch bit-exactly; dups collapse") {
    import spark.implicits._
    import graft.streaming.StreamCardinality
    import graft.streaming.StreamCardinality.Event
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sc = spark.sqlContext
    def ts(s: String) = java.sql.Timestamp.valueOf(s)

    val data = Seq(
      Event(ts("2024-01-01 10:01:00"), 1, "click"),
      Event(ts("2024-01-01 10:02:00"), 1, "click"), // dup user in window
      Event(ts("2024-01-01 10:03:00"), 2, "click"),
      Event(ts("2024-01-01 10:04:00"), 3, "view"),
      Event(ts("2024-01-01 10:12:00"), 1, "click")) // next window
    val stream = MemoryStream[Event]
    val q = StreamCardinality.windowedDistinct(stream.toDS(),
        "10 minutes", "5 minutes")
      .writeStream.format("memory").queryName("hllwin")
      .outputMode("append").start()
    stream.addData(data: _*)
    q.processAllAvailable()
    stream.addData(Event(ts("2024-01-01 11:00:00"), 9, "click")) // close all
    q.processAllAvailable()
    q.stop()

    def key(r: org.apache.spark.sql.Row) =
      (r.getTimestamp(0).toString, r.getString(1), r.getLong(2),
        r.getDouble(3), r.getLong(4))
    val streamed = spark.table("hllwin").collect().map(key).toSet
    // unified plan: the same call over a batch Dataset must produce the
    // identical rows, registers (s51) included
    // the 11:00 sentinel's own window never closes in append mode — the
    // equivalence claim is over CLOSED windows
    val batch = StreamCardinality.windowedDistinct(
        (data :+ Event(ts("2024-01-01 11:00:00"), 9, "click")).toDS(),
        "10 minutes", "5 minutes")
      .collect().map(key).filter(_._1 < "2024-01-01 11:00").toSet
    assert(streamed == batch)
    // two distinct users in the 10:00 click window: with 1024 registers
    // and 2 values the linear-counting branch is exact to the 1e-6 grid
    val clickWin = streamed.find(r => r._1.startsWith("2024-01-01 10:00") &&
      r._2 == "click").get
    assert(clickWin._3 == 3L) // 3 events
    assert(math.abs(clickWin._4 - 2.0) < 0.01, s"estimate ${clickWin._4}")
  }

  test("CMS: overestimate-only, exact for isolated keys, grids add on merge") {
    import spark.implicits._
    import graft.operators.CountMin
    val vocab = (1 to 300).map(i => (s"tok$i", i.toLong)).toDF("tok", "cnt")
    val buck = CountMin.bucketed(vocab, "tok", "cnt")
    val regs = CountMin.registers(buck).collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val truth = (1 to 300).map(i => s"tok$i" -> i.toLong).toMap
    val est = CountMin.estimates(vocab.select("tok"), buck,
        CountMin.registers(buck))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // never underestimates; any clean row (no collision) gives exactness
    truth.foreach { case (t, c) =>
      assert(est(t) >= c, s"$t underestimated: ${est(t)} < $c") }
    assert(est.count { case (t, e) => e == truth(t) } > 200,
      "with 300 keys over 4x256 buckets most estimates should be exact")
    // merge = grid addition: sketch(A ++ B) == sketch(A) + sketch(B)
    val (va, vb) = (vocab.filter(col("cnt") <= 150),
      vocab.filter(col("cnt") > 150))
    val ra = CountMin.registers(CountMin.bucketed(va, "tok", "cnt"))
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val rb = CountMin.registers(CountMin.bucketed(vb, "tok", "cnt"))
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val summed = (ra.keySet ++ rb.keySet).map(k =>
      k -> (ra.getOrElse(k, 0L) + rb.getOrElse(k, 0L))).toMap
    assert(summed == regs)
  }
}
