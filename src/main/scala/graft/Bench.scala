package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      // let AQE coalesce partitions inside cached (persisted) subtrees —
      // otherwise persist() freezes small shuffles at the full partition
      // count and schedules empty tasks (~2x on the LSH pipeline)
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm up the JVM/codegen/parquet reader so the first measured query
    // doesn't absorb session startup; touch every input table once so no
    // query pays the first-footer-read for its table
    spark.range(1000000).selectExpr("sum(id)").collect()
    try SparkEntry.entry(spark).count() catch { case _: Throwable => }
    Tables.names.foreach { n =>
      try {
        val df = if (n == "events") Tables.events(spark, sfDir)
                 else Tables.load(spark, sfDir, n)
        df.count()
      } catch { case _: Throwable => }
    }
    // median-of-N per query: a single cold shot is dominated by first-touch
    // codegen + whatever else the host is doing, and round-3 proved it can
    // report 5-10x phantom regressions on unchanged code. The median of 3
    // back-to-back runs is stable to ~10%.
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt
    val results = SparkEntry.queries.map { case (name, fn) =>
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
        val dt = (System.nanoTime() - t0) / 1e9
        // drop intra-query persists so no rep is timed against another's
        // leftover cache (or its memory pressure). clearCache() only drops
        // SQL-catalog caches; localCheckpoint() blocks live as persistent
        // RDDs in the BlockManager and must be released explicitly — round
        // 5 proved they accumulate across the 77-query session and inflate
        // late-query medians up to ~6.5x (q76 93.7s reported vs 14.0s on a
        // fresh JVM).
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
        dt
      }.sorted
      name -> (times(times.length / 2), times.head)
    }
    // millisecond precision + short query keys ("q25" not
    // "q25_factor_vectors") keep the one-line JSON inside the driver's
    // 2000-char tail buffer — round 4's full-precision long-key line
    // overflowed it and the driver recorded parsed:null
    def f3(d: Double): String = "%.3f".formatLocal(java.util.Locale.ROOT, d)
    def short(k: String): String = k.takeWhile(_ != '_')
    val qs = results.map { case (k, (med, _)) =>
      s"\"" + short(k) + "\":" + f3(med) }.mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.map(_._1).sum else 0.0
    // per-query MIN diagnostics go to stderr on request only: at 71+
    // queries a second map would push the one-line JSON past the driver's
    // 2000-char tail buffer (the round-4 parsed:null failure mode)
    if (sys.env.contains("SPARK_GRAFT_BENCH_MIN")) {
      val qsMin = results.map { case (k, (_, min)) =>
        s"\"" + short(k) + "\":" + f3(min) }.mkString("{", ",", "}")
      System.err.println(s"""{"queries_min":$qsMin}""")
    }
    println(s"""{"metric":"total","value":${f3(total)},"unit":"sec","queries":$qs,"reps":$reps,"sf":"$sfDir"}""")
    spark.stop()
  }
}
