package graft.tools

import org.apache.spark.sql.SparkSession

import graft.jobs.LandingJob
import graft.jobs.LandingJob.ApiRow
import graft.sources.{Ingest, JobLock, RunLedger}

/** Measures the composed landing control plane over a multi-date
  * backfill at production-ish per-day volume: per-date BYTES WRITTEN
  * under the landing root (must be day-sized — the partition-scoped
  * write), what the round-14 full-snapshot rewrite would have written
  * instead (cumulative table size per date), and the sizes of the
  * coverage manifest + run-ledger file (must stay metadata-sized).
  * Backs the PLANS.md round-15 row.
  * Usage: runMain graft.tools.ProbeLanding [nDates] [rowsPerDate]
  */
object ProbeLanding {
  private def dirBytes(p: java.io.File): Long =
    if (!p.exists()) 0L
    else if (p.isFile) p.length()
    else Option(p.listFiles()).getOrElse(Array()).map(dirBytes).sum

  def main(args: Array[String]): Unit = {
    val nDates = if (args.nonEmpty) args(0).toInt else 30
    val rowsPerDate = if (args.length > 1) args(1).toInt else 100000
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val tmp = java.nio.file.Files.createTempDirectory("graft_plnd")
    val cfg = LandingJob.Config("landing_probe", "probe",
      s"$tmp/landing", s"$tmp/coverage")
    var now = 0L
    val bucket = new Ingest.TokenBucket(requestsPerMinute = 60,
      minIntervalMs = 1000L, nowMs = () => now, sleepMs = now += _)
    val lock = new JobLock(tmp.resolve("locks"))
    val ledgerFile = tmp.resolve("runs.tsv")
    val runs = new RunLedger(nowMs = () => now,
      persistTo = Some(ledgerFile))
    val fetch: LandingJob.Fetch = (date, _) => {
      val d = date.takeRight(2).toLong
      (200, (0 until rowsPerDate).map(i =>
        ApiRow(d * 1000000L + i, date, d + i * 1e-6)), None)
    }
    val dates = (1 to nDates).map(i => f"2024-03-$i%02d")
    val landingDir = new java.io.File(s"${cfg.landingRoot}")
    var cumRows = 0L
    var partitionedSum = 0L
    var rewriteSum = 0L
    var t0 = System.nanoTime()
    dates.foreach { d =>
      val before = dirBytes(landingDir)
      val r = LandingJob.run(spark, lock, runs, cfg, Seq(d), fetch,
        bucket, retrySleepMs = now += _, nowMs = () => now)
        .toOption.get.head
      require(r.status == "success", r.toString)
      val after = dirBytes(landingDir)
      cumRows += r.rows
      partitionedSum += after - before
      rewriteSum += cumRows // rows a full-snapshot rewrite writes here
      val dt = (System.nanoTime() - t0) / 1e9; t0 = System.nanoTime()
      println(f"$d: ${dt}%5.2f s  wrote ${after - before}%9d bytes " +
        f"(table now $after%10d bytes, $cumRows%9d rows)  " +
        f"manifest ${dirBytes(new java.io.File(cfg.coverageRoot))}%7d B" +
        f"  ledger ${dirBytes(ledgerFile.toFile)}%5d B")
    }
    // a mid-history RE-land (the catch-up shape) must also be day-sized
    val reBefore = dirBytes(landingDir)
    LandingJob.run(spark, lock,
      new RunLedger(nowMs = () => now), // fresh ledger forces re-fetch
      cfg, Seq(dates(nDates / 2)), fetch, bucket,
      retrySleepMs = now += _, nowMs = () => now)
    val reWrote = dirBytes(landingDir) - reBefore
    println(f"re-land of ${dates(nDates / 2)}: wrote $reWrote%d net bytes " +
      "(one partition replaced; a snapshot rewrite would rewrite the table)")
    println(f"TOTAL bytes written across the $nDates%d-date backfill: " +
      f"$partitionedSum%d (partition-scoped)")
    println(f"row-volume comparison: partition-scoped wrote $cumRows%d " +
      f"rows total; per-date full-snapshot rewrite (the r14 LandingJob) " +
      f"would have written $rewriteSum%d rows " +
      f"(${rewriteSum.toDouble / cumRows}%.1fx)")

    // REFRESH LEG (round-16): simulate the daily cadence — one
    // landing-derived refresh per landed date, retention bounded to the
    // 2 most recent superseded versions. Measures (a) per-date refresh
    // INPUT rows (must stay O(day) — the stages prune to the one
    // target_date partition) and (b) snapshot version-dir counts per
    // stage (must stay bounded at retain+2, not grow with the cadence:
    // current + the name-pinned spared previous + retain superseded).
    import org.apache.spark.sql.functions.{col, lit, to_date}
    val outRoot = s"$tmp/refresh"
    val refreshLock = new graft.sources.JobLock(tmp.resolve("rlocks"))
    var tR = System.nanoTime()
    dates.foreach { d =>
      val out = graft.jobs.DailyRefreshJob.runRefreshForLandedDate(
        spark, refreshLock, runs, cfg, d, outRoot, version = s"d$d",
        retainVersions = Some(2))
      val stages = out.fold(e => sys.error(s"refresh blocked: $e"), identity)
      require(stages.forall(_.error.isEmpty), stages.toString)
      // what the pruned stage scan actually read: the files feeding the
      // one target_date partition
      val inputRows = LandingJob.readLanding(spark, cfg.landingRoot).get
        .filter(col("target_date") === to_date(lit(d))).count()
      val vDirs = Seq("landing_daily_stats", "landing_value_ranks").map { st =>
        Option(new java.io.File(s"$outRoot/$st").listFiles())
          .getOrElse(Array()).count(f => f.isDirectory &&
            f.getName.startsWith("v="))
      }
      val dt = (System.nanoTime() - tR) / 1e9; tR = System.nanoTime()
      println(f"refresh $d: ${dt}%5.2f s  input rows $inputRows%9d " +
        f"(O(day), table holds $cumRows%9d)  version dirs " +
        f"${vDirs.mkString("/")} (retain=2 -> bounded at 4)")
    }
    spark.stop()
  }
}
