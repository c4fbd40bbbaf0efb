package graft.jobs

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.analytics.ScreenMetrics
import graft.operators.Upsert
import graft.queries.{AnalyticsQueries, TextQueries}

/** The cron-A daily pipeline re-expressed as one DataFrame DAG
  * (SURVEY §3.1: target resolution → fetch → transform → sink →
  * derived-refresh chain, `scripts/cron/cron-a-direct.ts:115-147`).
  *
  * Each derived stage reads only tables written by earlier stages; every
  * write is an atomic snapshot publication ([[Upsert.publishSnapshot]]) so
  * a crash mid-chain never exposes a partial snapshot — the reference's
  * `_PUBLISHED`-marker discipline (refresh-technical.ts:181-196).
  * Re-running a stage with the same inputs overwrites the same version
  * directory: the job is idempotent end-to-end.
  *
  * The continue-on-error chain semantics of cron-a.yml are preserved:
  * each stage is attempted independently and failures are reported, not
  * cascaded.
  */
object DailyRefreshJob {

  final case class StageResult(name: String, rows: Long,
                               error: Option[String])

  /** Publish gate (refresh-technical.ts:98-112,129-135): a derived
    * snapshot only publishes when it covers at least `minCoverage` of the
    * entity universe — two scalar counts and a guard, never a collect of
    * the data itself. */
  def coverageGate(snapshot: org.apache.spark.sql.DataFrame,
                   universe: org.apache.spark.sql.DataFrame,
                   minCoverage: Double): Either[String, Long] = {
    val got = snapshot.count()
    val want = universe.count()
    if (want == 0) Left("empty universe")
    else if (got.toDouble / want < minCoverage)
      Left(f"coverage ${got.toDouble / want}%.3f below $minCoverage%.2f " +
        s"($got of $want entities)")
    else Right(got)
  }

  /** The production chain: each stage reads only tables written by
    * earlier stages (or the snapshot dir). */
  def defaultStages(spark: SparkSession, sfDir: String)
      : Seq[(String, () => DataFrame)] = Seq(
      "screen_metrics" -> (() => ScreenMetrics.run(spark, sfDir)),
      "technical_snapshot" -> (() =>
        graft.analytics.TechnicalJob.fromEvents(spark, sfDir)),
      "market_breadth" -> (() => AnalyticsQueries.q19Breadth(spark, sfDir)),
      "market_breadth_full" -> (() =>
        graft.queries.Breadth.q42MarketBreadth(spark, sfDir)),
      "per_bands" -> (() => graft.queries.PerBands.q43PerBands(spark, sfDir)),
      "market_indicators" -> (() =>
        AnalyticsQueries.q38ColumnGroupMerge(spark, sfDir)),
      "factor_vectors" -> (() =>
        AnalyticsQueries.q25FactorVectors(spark, sfDir)),
      "neardup_pairs" -> (() => TextQueries.q15NearDupPairs(spark, sfDir)),
    )

  /** Run the derived-analytics chain over a testdata snapshot dir,
    * publishing each stage under `outRoot/<stage>/v=<version>`.
    * `afterStage` observes each completed stage — [[runLocked]] hangs
    * the lease heartbeat there. */
  def run(spark: SparkSession, sfDir: String, outRoot: String,
          version: String,
          stages: Option[Seq[(String, () => DataFrame)]] = None,
          afterStage: StageResult => Unit = _ => (),
          publishGuard: () => Option[String] = () => None,
          retainVersions: Option[Int] = None)
      : Seq[StageResult] = {
    // None = the production chain; Some(Nil) is an honest no-op run (an
    // isEmpty sentinel would silently run all ten default stages on a
    // caller whose dynamically-built list came out empty)
    val chain = stages.getOrElse(defaultStages(spark, sfDir))
    // lazy: only the entity-gated stages need the universe, and custom
    // chains (e.g. landing-derived stages) may run against a root that
    // has no customer table at all
    lazy val universe = graft.Tables.customer(spark, sfDir)
      .select(org.apache.spark.sql.functions.col("c_custkey"))
    // once the guard trips (attempt superseded) the chain is DEAD: no
    // later stage may compute (the gated stages' coverage counts are
    // real Spark jobs), publish, or keep extending the lease — a zombie
    // that walks its remaining stages delays the rightful owner for the
    // whole chain length
    var fenced = false
    chain.map { case (name, mk) =>
      if (fenced)
        // no afterStage: a fenced chain must stop heartbeating the lease
        StageResult(name, -1, Some("skipped: attempt superseded"))
      else {
        val r = try {
          val df = mk()
          // entity-keyed snapshots must clear the coverage gate first
          if (name == "screen_metrics" || name == "factor_vectors" ||
              name == "per_bands") {
            coverageGate(df, universe, minCoverage = 0.8) match {
              case Left(reason) =>
                throw new IllegalStateException(s"publish blocked: $reason")
              case Right(_) =>
            }
          }
          // the guard runs IMMEDIATELY before the publish (stage
          // DataFrames are lazy — probing any earlier leaves the whole
          // stage compute + write inside the zombie window)
          publishGuard().foreach { reason =>
            fenced = true
            throw new IllegalStateException(reason)
          }
          // capture the about-to-be-superseded version BY NAME before
          // the flip: mtimes can tie at publish rates below the fs
          // timestamp granularity, and graceKeep's recency sort alone
          // could then prune the version a concurrent reader resolved
          // just before the pointer moved (the publishCoverage rule)
          val prevPublished = Upsert.resolvePublished(s"$outRoot/$name")
            .map(p => new java.io.File(p).getName).toSet
          Upsert.publishSnapshot(df, s"$outRoot/$name", version)
          // under daily cadence versioned snapshots accumulate one
          // v=* dir per day per stage forever; callers that don't want
          // the full audit history bound retention. Steady state is
          // retain+2 dirs: current + the name-pinned spared previous +
          // graceKeep=N superseded (the spare is IN ADDITION to
          // graceKeep — r16 ADVICE; readers of the just-flipped pointer
          // keep their grace window)
          retainVersions.foreach(n =>
            Upsert.pruneSnapshots(s"$outRoot/$name", graceKeep = n,
              spare = prevPublished))
          val published = Upsert.resolvePublished(s"$outRoot/$name").get
          StageResult(name, spark.read.parquet(published).count(), None)
        } catch {
          case e: Throwable =>
            StageResult(name, -1,
              Some(Option(e.getMessage).getOrElse(e.toString)))
        }
        if (!fenced) afterStage(r)
        r
      }
    }
  }

  /** The chain under a TTL job lease ([[graft.sources.JobLock]] — the
    * reference's double-start prevention around the whole refresh DAG,
    * `job-lock.ts` + the cron route's 409): acquire before any stage,
    * HEARTBEAT after every stage (a chain longer than the TTL must not
    * lose its lease mid-run — the reference extends inside long jobs),
    * release on every exit path. A held lease rejects the run before
    * any compute starts. */
  def runLocked(spark: SparkSession, lock: graft.sources.JobLock,
                sfDir: String, outRoot: String, version: String,
                jobName: String = "daily_refresh",
                ttlSeconds: Long = 600L,
                stages: Option[Seq[(String, () => DataFrame)]] = None)
      : Either[String, Seq[StageResult]] =
    lock.acquire(jobName, ttlSeconds) match {
      case Left(reason) => Left(reason)
      case Right(token) =>
        try Right(run(spark, sfDir, outRoot, version, stages,
          afterStage = _ => lock.extend(jobName, token, ttlSeconds)))
        finally lock.release(jobName, token)
    }

  /** Derived stages that read the LANDING table [[LandingJob]]
    * publishes — the reference's cron-A post-steps read exactly the
    * tables the fetch loop just wrote (`cron-a-direct.ts:115-147`
    * chains the derived refreshes over the SAME day's landed data).
    * Both stages prune to the one target_date partition (the landing
    * table is date-partitioned), so a daily refresh touches O(day)
    * input regardless of table history. */
  def landingStages(spark: SparkSession, landingRoot: String,
                    targetDate: String,
                    dataset: String = ""): Seq[(String, () => DataFrame)] = {
    import org.apache.spark.sql.functions._
    // named fallback: a generic Dataset sharing the config's dataset
    // name lands under data_<name>; its covered dates must refresh,
    // not error on the legacy bare-`data` path
    def landed = LandingJob.readLandingNamed(spark, landingRoot, dataset)
      .getOrElse(sys.error(s"no landing table under $landingRoot"))
      .filter(col("target_date") === to_date(lit(targetDate)))
    Seq(
      "landing_daily_stats" -> (() =>
        landed.groupBy(col("target_date"))
          .agg(count(lit(1)).as("n_rows"),
            sum(col("value")).as("sum_value"),
            min(col("value")).as("min_value"),
            max(col("value")).as("max_value"))),
      "landing_value_ranks" -> (() => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("target_date"))
          .orderBy(col("value").desc, col("id"))
        landed.withColumn("rank", row_number().over(w))
      }))
  }

  /** Is `targetDate`'s landing marked SUCCESS in the coverage manifest
    * for EVERY dataset in `datasets`? The refresh trusts the MANIFEST,
    * not output presence — a date whose landing failed (or never ran)
    * has a partition that is stale or absent, and deriving analytics
    * from it would publish wrong snapshots silently. One read, one
    * distinct-count — never a per-dataset scan loop. */
  private def landingCovered(spark: SparkSession,
                             cfg: LandingJob.Config,
                             targetDate: String,
                             datasets: Seq[String]): Boolean = {
    import org.apache.spark.sql.functions._
    Upsert.resolvePublished(cfg.coverageRoot).exists { dir =>
      spark.read.parquet(dir)
        .filter(col("dataset").isin(datasets: _*) &&
          col("target_date") === to_date(lit(targetDate)) &&
          col("status") === lit(graft.sources.Coverage.Success))
        // distinct on BOTH sides (r16 ADVICE): a caller passing the same
        // dataset name twice must not block forever on count < size
        .select(col("dataset")).distinct().count() == datasets.distinct.size
    }
  }

  /** LANDING → REFRESH, composed end to end on one storage root (the
    * round-14 "What's missing" #2): run the derived chain for
    * `targetDate` READING THE LANDING TABLE [[LandingJob]] published —
    * gated on that date's coverage manifest row. A date whose landing
    * is FAILED or absent blocks the refresh VIA THE CLAIM: the blocked
    * attempt is recorded as a failed run in the shared ledger (visible
    * to monitoring, reclaimable once the landing heals via
    * [[LandingJob.catchUpDates]] → re-land → re-refresh), and no stage
    * runs or publishes. Both jobs write their run rows to the SAME
    * [[graft.sources.RunLedger]], so the ledger shows the full
    * land(D) → refresh(D) lifecycle per date. */
  def runRefreshForLandedDate(spark: SparkSession,
                              lock: graft.sources.JobLock,
                              runs: graft.sources.RunLedger,
                              landingCfg: LandingJob.Config,
                              targetDate: String, outRoot: String,
                              version: String,
                              jobName: String = "daily_refresh",
                              ttlSeconds: Long = 600L,
                              runningStaleAfterSec: Option[Long] =
                                Some(3600L),
                              retainVersions: Option[Int] = None)
      : Either[String, Seq[StageResult]] =
    runRefreshIfCovered(spark, lock, runs, landingCfg, targetDate,
      Seq(landingCfg.dataset), outRoot, version, jobName, ttlSeconds,
      runningStaleAfterSec,
      landingStages(spark, landingCfg.landingRoot, targetDate,
        landingCfg.dataset),
      retainVersions)

  /** The PRODUCTION refresh DAG over LANDED tables: the real derived
    * stages (the flagship stock-metrics program + the technical-kernel
    * snapshot — the reference cron-A post-step chain,
    * `cron-a-direct.ts:115-147`) computed FROM THE TABLES THE LANDING
    * JOB WROTE, plus the O(day) per-date landing stats. Gated on the
    * coverage manifest of EVERY input dataset for `targetDate`: one
    * unlanded input blocks the whole chain via a recorded failed claim
    * (reclaimable once the landing catch-up heals). `orders`,
    * `lineitem`, `customer`, `events` are the landed [[LandingJob.Dataset]]
    * specs whose tables carry the testdata column names.
    *
    * Scale shape: the derived programs read the landed tables' FULL
    * history (stock metrics ranks the latest-10 orders per entity;
    * technicals fold a 400-bar lookback) — the reference's refresh
    * cost, O(lookback·entities), not O(day); the landing-stat stages
    * prune to the one target_date partition. */
  def runProductionRefresh(spark: SparkSession,
                           lock: graft.sources.JobLock,
                           runs: graft.sources.RunLedger,
                           landingCfg: LandingJob.Config,
                           orders: LandingJob.Dataset,
                           lineitem: LandingJob.Dataset,
                           customer: LandingJob.Dataset,
                           events: LandingJob.Dataset,
                           targetDate: String, outRoot: String,
                           version: String,
                           jobName: String = "daily_refresh",
                           ttlSeconds: Long = 600L,
                           runningStaleAfterSec: Option[Long] =
                             Some(3600L))
      : Either[String, Seq[StageResult]] = {
    def landed(ds: LandingJob.Dataset) =
      LandingJob.readLanding(spark, landingCfg.landingRoot, ds)
        .getOrElse(sys.error(s"no landed ${ds.name} table under " +
          landingCfg.landingRoot))
    val stages: Seq[(String, () => DataFrame)] = Seq(
      "stock_metrics" -> (() => graft.analytics.ScreenMetrics.fromTables(
        landed(orders), landed(lineitem), landed(customer))),
      "technical_snapshot" -> (() =>
        graft.analytics.TechnicalJob.fromEventsDf(landed(events))))
    runRefreshIfCovered(spark, lock, runs, landingCfg, targetDate,
      Seq(orders, lineitem, customer, events).map(_.name), outRoot,
      version, jobName, ttlSeconds, runningStaleAfterSec, stages)
  }

  private def runRefreshIfCovered(spark: SparkSession,
                                  lock: graft.sources.JobLock,
                                  runs: graft.sources.RunLedger,
                                  landingCfg: LandingJob.Config,
                                  targetDate: String,
                                  datasets: Seq[String],
                                  outRoot: String, version: String,
                                  jobName: String, ttlSeconds: Long,
                                  runningStaleAfterSec: Option[Long],
                                  stages: Seq[(String, () => DataFrame)],
                                  retainVersions: Option[Int] = None)
      : Either[String, Seq[StageResult]] =
    if (landingCovered(spark, landingCfg, targetDate, datasets))
      runClaimed(spark, lock, runs, targetDate, landingCfg.landingRoot,
        outRoot, version, jobName, ttlSeconds, runningStaleAfterSec,
        stages = Some(stages), retainVersions = retainVersions)
    else {
      val why = s"landing not covered for $targetDate " +
        s"(need ${datasets.mkString(",")})"
      // record the blocked attempt: a failed run row the next scheduled
      // invocation reclaims after the landing catch-up heals the date
      val claim = runs.claim(jobName, targetDate,
        runningStaleAfterSec = runningStaleAfterSec)
      claim.attemptId.foreach(a =>
        runs.complete(claim.runId, a, "failed", Some(why)))
      Left(why)
    }

  /** The FULLY composed production entry: lease + per-(job, target_date)
    * run claim + the DAG + terminal run state — the reference cron
    * route's whole discipline in one call (`claim_job_run` before any
    * work, 409 on a held lease, `already_executed` on a date already
    * refreshed, `complete_job_run_attempt` with success iff every stage
    * published; a failed chain leaves a FAILED run that the next
    * scheduled invocation reclaims and retries). The lease guards
    * CONCURRENT starts; the claim guards REPEATED ones — they are
    * different protections and the reference runs both. */
  def runClaimed(spark: SparkSession, lock: graft.sources.JobLock,
                 runs: graft.sources.RunLedger, targetDate: String,
                 sfDir: String, outRoot: String, version: String,
                 jobName: String = "daily_refresh",
                 ttlSeconds: Long = 600L,
                 runningStaleAfterSec: Option[Long] = Some(3600L),
                 stages: Option[Seq[(String, () => DataFrame)]] = None,
                 retainVersions: Option[Int] = None)
      : Either[String, Seq[StageResult]] =
    lock.acquire(jobName, ttlSeconds) match {
      case Left(reason) => Left(reason)
      case Right(token) =>
        try {
          val claim = runs.claim(jobName, targetDate,
            runningStaleAfterSec = runningStaleAfterSec)
          if (!claim.claimed) Left(claim.reason)
          else {
            // PRE-publish fence on every stage (the LandingJob.runOneDate
            // discipline): a stale-reclaimed zombie (paused past
            // runningStaleAfterSec) must stop BEFORE publishing a stage
            // snapshot over the new owner's output, not merely report
            // Left after republishing the whole chain. The probe runs
            // via run()'s publishGuard IMMEDIATELY before each publish
            // (stage DataFrames are lazy, so a probe at stage start
            // would leave the whole compute inside the zombie window);
            // what remains — a hijack during the write itself — is the
            // same optimistic race JobLock's takeover accepts.
            val attempt = claim.attemptId.get
            val out = run(spark, sfDir, outRoot, version, stages,
              afterStage = _ => lock.extend(jobName, token, ttlSeconds),
              publishGuard = () =>
                if (runs.isCurrentAttempt(claim.runId, attempt)) None
                else Some("attempt superseded"),
              retainVersions = retainVersions)
            val failed = out.filter(_.error.isDefined)
            val owned = runs.complete(claim.runId, attempt,
              if (failed.isEmpty) "success" else "failed",
              if (failed.isEmpty) None
              else Some(failed.map(s => s"${s.name}: ${s.error.get}")
                .mkString("; ")))
            // a reclaimed-from attempt must not report its chain as the
            // run of record (the fencing contract)
            if (owned) Right(out) else Left("attempt superseded")
          }
        } finally lock.release(jobName, token)
    }
}
