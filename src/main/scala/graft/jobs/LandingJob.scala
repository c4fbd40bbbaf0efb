package graft.jobs

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.operators.Upsert
import graft.sources.{Coverage, Ingest, JobLock, RunLedger}
import graft.sources.Ingest.Retry

/** The end-to-end LANDING job — the reference's direct-cron ingest shape
  * (`scripts/cron/cron-a-direct.ts:115-147`) with every discipline
  * composed: per-date run claim (`jquants_ingest.claim_job_run`) under a
  * TTL job lease (`job-lock.ts`), the rate-limited / retried / paginated
  * fetch loop (`rate-limiter.ts` / `retry.ts` / `client.ts:172-204`),
  * an idempotent keyed landing upsert (`batch.ts:81-141` — re-running
  * the same day is a no-op, `cron-a-direct.ts:9`), and a
  * dataset-coverage manifest row per target date
  * (`00085_create_dataset_coverage.sql`: FAILED placeholder at claim,
  * SUCCESS with the saved row count at commit).
  *
  * SCHEMA-GENERIC: the job is parameterized over a [[Dataset]] spec —
  * schema, within-partition key columns, per-dataset chunk size, and a
  * row transform — the reference's per-endpoint registry shape
  * (`src/lib/utils/batch.ts:12-30` `BATCH_SIZES` + the endpoint mapping
  * modules, e.g. the ~50-column fins cleanse of
  * `src/lib/jquants/endpoints/fins-summary.ts:77-163`). Landing a new
  * business table means writing a Dataset row, not editing the job.
  *
  * CHUNKED: pages are flushed to an attempt-scoped parquet staging dir
  * every `batchSize` rows (the reference upserts per 500–2000-row chunk,
  * `batch.ts:81-141`), so driver residency per date is bounded by one
  * chunk regardless of backfill-day volume; the partition itself is
  * still written ONCE per landed date (chunk-wise partition rewrites
  * would be O(chunks²) on an object store — staging-then-one-merge keeps
  * the day write O(day)). A date small enough to fit one chunk never
  * touches staging at all — the common daily case stays at the r15
  * action count.
  *
  * Spark-first split: the network discipline (bucket/retry/pagination)
  * and control state (lock, run ledger) are DRIVER-side — a fetch loop
  * is inherently sequential per endpoint and its state is a handful of
  * rows. The DATA path is relational: page rows become one DataFrame
  * per date and land PARTITION-SCOPED — the landing table is
  * partitioned by `target_date` and each date lands via dynamic
  * partition overwrite (`partitionOverwriteMode=dynamic`) with
  * [[Upsert.keyed]] semantics INSIDE the partition, so a landed date
  * touches exactly its own partition: O(day) I/O per ingested date, the
  * reference's per-day `ON CONFLICT` cost (`batch.ts:81-141`, PK
  * (code, date) — here (target_date, keyCols)), never O(|table|).
  * Untouched partitions' files are not read, rewritten, or even listed
  * by the write; a 30-day backfill writes 30 day-sized partitions. The
  * atomicity unit is the partition (Spark's commit protocol stages then
  * swaps the one overwritten partition); a reader racing a re-land of
  * the SAME date can see that partition mid-commit — the window the
  * claim-time FAILED manifest marks, and the same one the reference's
  * non-transactional object-store writers accept. The manifest stays
  * one row per (dataset, day) regardless.
  *
  * Failure semantics follow the reference's continue-on-error chain:
  * a date whose fetch ultimately fails records a FAILED manifest row
  * and a failed run, and the job moves to the next date — the
  * coverage-driven catch-up ([[Coverage.catchUpTargets]]) retries it
  * on the next scheduled run. A crash mid-date (even mid-chunk) leaves
  * the manifest FAILED and at worst an attempt-scoped staging dir; the
  * healing re-land re-fetches and re-merges the whole date, converging
  * on the same partition content. A date already successfully run is
  * skipped by the claim (`already_executed`). The job heartbeats the
  * lease after every date so a long backfill never loses its lock
  * mid-run; a second concurrent start is rejected by the lock before
  * any work happens (the reference's 409). */
object LandingJob {

  /** One page-fetch response: HTTP-ish status, rows, next cursor. */
  type Fetch = (String, Option[String]) => (Int, Seq[ApiRow], Option[String])

  /** Schema-generic page fetch: rows are [[Row]]s matching the
    * dataset's [[Dataset.schema]]. */
  type RowFetch =
    (String, Option[String]) => (Int, Seq[Row], Option[String])

  /** The landing row shape for the gate: (id, target_date, value) —
    * id is the upsert key, target_date ties the row to its manifest. */
  final case class ApiRow(id: Long, target_date: String, value: Double)

  /** Per-dataset landing spec — the reference's endpoint registry row:
    * fetch-row schema (must contain a `target_date` column; string is
    * cast to date at landing), the within-partition upsert key (the
    * endpoint PK minus the date — `batch.ts` PKs like (code, date)),
    * the per-dataset chunk size (`BATCH_SIZES`, batch.ts:12-30), and
    * the row transform applied to every fetched chunk BEFORE staging
    * (the endpoint mapping — e.g. fins-summary's ""→null cleanse). */
  final case class Dataset(name: String,
                           schema: StructType,
                           keyCols: Seq[String],
                           batchSize: Int = 1000,
                           transform: DataFrame => DataFrame = identity,
                           legacyLayout: Boolean = false) {
    require(schema.fieldNames.contains("target_date"),
      s"dataset $name schema must carry target_date")
    require(keyCols.nonEmpty && keyCols.forall(schema.fieldNames.contains),
      s"dataset $name keyCols must be schema columns")
    require(batchSize > 0, s"dataset $name batchSize must be positive")
  }

  final case class Config(jobName: String, dataset: String,
                          landingRoot: String, coverageRoot: String,
                          ttlSeconds: Long = 600L,
                          maxRetries: Int = 5,
                          runningStaleAfterSec: Option[Long] = Some(3600L),
                          successStaleAfterSec: Option[Long] = None)

  final case class DateResult(date: String, status: String, rows: Long,
                              pages: Int, error: Option[String])

  private val apiRowSchema: StructType = {
    import org.apache.spark.sql.types._
    StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("target_date", StringType, nullable = false),
      StructField("value", DoubleType, nullable = false)))
  }

  private def readLedger(s: SparkSession, root: String): DataFrame =
    Upsert.resolvePublished(root)
      .map(s.read.parquet(_))
      .getOrElse(Coverage.emptyLedger(s))

  /** Write-through coverage-ledger buffer for ONE leased landing run
    * (round-17, guide §1.2/"do fewer passes"): the published snapshot is
    * loaded ONCE per run, upserts apply driver-side, and every publish
    * writes the complete merged ledger as a single-partition snapshot.
    * This removes, per publish (2 per landed date), the parquet re-read
    * of the snapshot this same process just wrote plus the left-anti
    * merge shuffle. Durability and readers are untouched: every publish
    * is still a complete snapshot plus the atomic `_PUBLISHED` pointer
    * flip, and cross-process planners ([[catchUpDatesFor]], q218-style)
    * keep reading storage.
    *
    * Round-18 hardening of the two r17 caveats:
    *
    *  - BOUNDED DRIVER RESIDENCY (VERDICT #4/"what's wrong"): only the
    *    rows this run can touch — the (run datasets) × (run dates)
    *    window — are collected to the driver; every other row stays
    *    cluster-side in an eagerly-checkpointed single-partition
    *    `remainder` relation that each publish unions back in. A ledger
    *    grown over years × many datasets no longer scales the driver
    *    heap with history — driver residency is O(|schedule|), fixed by
    *    the run's own plan.
    *  - FOREIGN-WRITER RE-MERGE (ADVICE: the lease is keyed on jobName
    *    while the shared resource is coverageRoot — two configs with
    *    different jobName sharing one coverageRoot could permanently
    *    drop each other's rows for the whole run). Before every publish
    *    the buffer re-resolves the `_PUBLISHED` pointer (one tiny
    *    metadata read, no Spark job); if some other process published
    *    since this buffer last synced, the buffer RELOADS that snapshot
    *    and re-merges — foreign rows win everywhere except the keys
    *    this run itself wrote (`dirty`), restoring the old
    *    read-merge-publish semantics where a race costs at most the
    *    single racing row, never the whole run. */
  private[jobs] final class LedgerBuf(s: SparkSession, cfg: Config,
                                datasets: Set[String], days0: Set[String]) {
    // normalized ISO form — callers may pass unpadded dates that
    // java.sql.Date accepts but whose canonical toString differs
    private val days: Set[String] =
      days0.map(d => java.sql.Date.valueOf(d).toString)
    private val schema = Coverage.emptyLedger(s).schema
    private val rows =
      scala.collection.mutable.LinkedHashMap.empty[(String, String), Row]
    private val dirty =
      scala.collection.mutable.HashSet.empty[(String, String)]
    // rows outside the run's window: never touched by this run's
    // publishes, kept as a checkpointed one-partition relation (lineage
    // cut — survives pruning of the snapshot it was read from)
    private var remainder: DataFrame = _
    // the published version this buffer last loaded or wrote — the
    // foreign-writer detector
    private var syncedVer: Option[String] = None

    private def windowPred: org.apache.spark.sql.Column =
      if (datasets.isEmpty || days.isEmpty) lit(false)
      else col("dataset").isin(datasets.toSeq: _*) &&
        col("target_date").cast("string").isin(days.toSeq: _*)

    private def sync(): Unit = {
      syncedVer = Upsert.resolvePublished(cfg.coverageRoot)
        .map(p => new java.io.File(p).getName)
      val led = readLedger(s, cfg.coverageRoot)
      led.filter(windowPred).collect().foreach { r =>
        val key = (r.getString(0), String.valueOf(r.getDate(1)))
        if (!dirty.contains(key)) rows(key) = r
      }
      remainder = led.filter(!windowPred).coalesce(1).localCheckpoint()
    }
    sync()

    /** Rows currently buffered on the driver — the bounded-residency
      * observable the spec pins (must be O(run window), not
      * O(ledger history)). */
    private[jobs] def bufferedRows: Int = synchronized { rows.size }

    // synchronized: one leased run is normally one thread, but nothing
    // in the protocol forbids a caller overlapping datasets — the
    // buffer, dirty set, and publish/prune sequence must not interleave
    def publish(dataset: String, day: java.sql.Date, status: String,
                rowCount: Long, errorCount: Int, obsMs: Option[Long],
                runId: Option[String]): Unit = synchronized {
      Coverage.validate(status, rowCount, errorCount, obsMs)
      require(datasets.contains(dataset) && days.contains(day.toString),
        s"publish outside the run window: ($dataset, $day)")
      val key = (dataset, day.toString)
      rows(key) = Row(dataset, day, status, rowCount,
        errorCount, obsMs.map(Long.box).orNull, runId.orNull)
      dirty += key
      val prevVer = Upsert.resolvePublished(cfg.coverageRoot)
        .map(p => new java.io.File(p).getName)
      // another process published since we last synced (shared
      // coverageRoot under a different jobName lease): adopt its rows
      // for every key this run hasn't written itself
      if (prevVer != syncedVer) sync()
      import scala.jdk.CollectionConverters._
      // one partition: the ledger is metadata-sized — a single file per
      // version keeps listing/footer costs flat for every reader (§6)
      val df = remainder.unionByName(
        s.createDataFrame(rows.values.toSeq.asJava, schema)).coalesce(1)
      Upsert.publishSnapshot(df, cfg.coverageRoot,
        java.util.UUID.randomUUID().toString)
      syncedVer = Upsert.resolvePublished(cfg.coverageRoot)
        .map(p => new java.io.File(p).getName)
      // two publishes per date would otherwise grow version dirs forever;
      // sparing the JUST-superseded version BY NAME (mtimes can tie at
      // publish rates below the fs timestamp granularity) leaves it for
      // readers that resolved the old pointer right before this flip
      // (q218-style catch-up planners in other processes)
      Upsert.pruneSnapshots(cfg.coverageRoot, spare = prevVer.toSet)
    }
  }

  /** Run the landing job over `targetDates` (oldest first — the
    * forward-fill order). Returns Left(reason) when the lease is held
    * (double start) — nothing is claimed, fetched, or written.
    * Legacy single-shape entry: the gate/probe row [[ApiRow]] via the
    * generic path (key = id, one chunk — the pre-chunking behavior). */
  def run(s: SparkSession, lock: JobLock, runs: RunLedger, cfg: Config,
          targetDates: Seq[String], fetch: Fetch,
          bucket: Ingest.TokenBucket,
          retrySleepMs: Long => Unit = Thread.sleep(_),
          uniform: () => Double = () => 0.0,
          nowMs: () => Long = () => System.currentTimeMillis())
      : Either[String, Seq[DateResult]] = {
    val ds = Dataset(cfg.dataset, apiRowSchema, Seq("id"),
      batchSize = Int.MaxValue, legacyLayout = true)
    val rowFetch: RowFetch = (date, cursor) => {
      val (status, rows, next) = fetch(date, cursor)
      (status, rows.map(r => Row(r.id, r.target_date, r.value)), next)
    }
    runDataset(s, lock, runs, cfg, ds, targetDates, rowFetch, bucket,
      retrySleepMs, uniform, nowMs)
  }

  /** The schema-generic landing run: one [[Dataset]] over
    * `targetDates` under the lease, one claim + manifest row per date. */
  def runDataset(s: SparkSession, lock: JobLock, runs: RunLedger,
                 cfg: Config, ds: Dataset, targetDates: Seq[String],
                 fetch: RowFetch, bucket: Ingest.TokenBucket,
                 retrySleepMs: Long => Unit = Thread.sleep(_),
                 uniform: () => Double = () => 0.0,
                 nowMs: () => Long = () => System.currentTimeMillis())
      : Either[String, Seq[DateResult]] = {
    lock.acquire(cfg.jobName, cfg.ttlSeconds) match {
      case Left(reason) => Left(reason)
      case Right(token) =>
        try {
          val ledger = new LedgerBuf(s, cfg, Set(ds.name),
            targetDates.toSet)
          Right(targetDates.map { date =>
            val r = runOneDate(s, runs, cfg, ds, date, fetch, bucket,
              retrySleepMs, uniform, nowMs, ledger)
            // heartbeat: a long backfill must outlive the initial TTL
            lock.extend(cfg.jobName, token, cfg.ttlSeconds)
            r
          })
        }
        finally lock.release(cfg.jobName, token)
    }
  }

  private def runOneDate(s: SparkSession, runs: RunLedger, cfg: Config,
                         ds: Dataset, date: String, fetch: RowFetch,
                         bucket: Ingest.TokenBucket,
                         retrySleepMs: Long => Unit,
                         uniform: () => Double,
                         nowMs: () => Long,
                         ledger: LedgerBuf): DateResult = {
    // ledger key: the bare job name when the job IS the dataset (the
    // single-dataset legacy contract the specs and q219 pin); a
    // multi-dataset job claims per (job, dataset) so one dataset's
    // failed date never blocks another's claim
    val claimJob = if (ds.name == cfg.dataset) cfg.jobName
                   else s"${cfg.jobName}:${ds.name}"
    val claim = runs.claim(claimJob, date,
      cfg.runningStaleAfterSec, cfg.successStaleAfterSec)
    if (!claim.claimed)
      return DateResult(date, "skipped", 0L, 0, Some(claim.reason))
    val attempt = claim.attemptId.get
    val day = java.sql.Date.valueOf(date)
    // claim-time manifest: FAILED until this attempt proves otherwise —
    // a crash from here on leaves the date visibly uncovered
    // (the 00085 claim placeholder: FAILED, one error, no observation)
    ledger.publish(ds.name, day, Coverage.Failed, 0L, 1, None,
      Some(claim.runId))
    var pages = 0
    // attempt-scoped staging dir: chunk flushes land here, never in the
    // partition — a zombie attempt can only dirty its own scratch
    val stageDir = s"${cfg.landingRoot}/stage/${ds.name}/${date}_$attempt"
    try {
      val spool = new ChunkSpool(s, ds, stageDir)
      // ONE pagination discipline (cursor-to-exhaustion + loud page
      // cap) lives in Ingest.Paginate; this job only supplies the
      // rate-limited/retried fetch and the chunk-spooling page sink
      Ingest.Paginate.foreachPage[Row]({ cursor =>
        Retry.withRetry({ () =>
          bucket.acquire() // every ATTEMPT is rate-limited, retries included
          val (status, pageRows, next) = fetch(date, cursor)
          Retry.classify(status, s"$date cursor=$cursor")
            .foreach(e => throw e)
          pages += 1
          (pageRows, next)
        }, maxRetries = cfg.maxRetries, uniform = uniform,
          sleepMs = retrySleepMs)
      })(spool.add)
      // pre-publish fence: a worker whose long fetch outlived a
      // stale-running reclaim must stop BEFORE overwriting the new
      // owner's landing table (parquet cannot roll back a publish the
      // way the reference's transactional commit RPC can — the probe +
      // the complete() check below bound the zombie window instead)
      if (!runs.isCurrentAttempt(claim.runId, attempt))
        return DateResult(date, "fenced", 0L, pages,
          Some("attempt superseded before publish"))
      val landed = land(s, cfg, ds, spool)
      ledger.publish(ds.name, day, Coverage.Success, landed, 0,
        Some(nowMs()), Some(claim.runId))
      if (runs.complete(claim.runId, attempt, "success"))
        DateResult(date, "success", landed, pages, None)
      else // fenced between probe and completion: report it, never "success"
        DateResult(date, "fenced", landed, pages,
          Some("attempt superseded at completion"))
    } catch {
      case e: Exception =>
        val msg = Option(e.getMessage).getOrElse(e.toString)
        // only the still-current attempt may rewrite the manifest
        if (runs.complete(claim.runId, attempt, "failed", Some(msg)))
          ledger.publish(ds.name, day, Coverage.Failed, 0L, 1, None,
            Some(claim.runId))
        DateResult(date, "failed", 0L, pages, Some(msg))
    } finally Upsert.rmTree(new java.io.File(stageDir))
  }

  /** Bounded-residency page accumulator: buffers at most one chunk of
    * rows on the driver; every `batchSize` rows it stamps `__seq`
    * (arrival order — the last-writer-wins tiebreak for duplicate keys
    * WITHIN a fetch, e.g. an offset cursor racing upstream inserts),
    * applies the dataset transform, and APPENDS the chunk to the
    * attempt's staging dir (O(chunk) each — parquet append never
    * rewrites earlier chunks). [[dedupedIncoming]] then serves the
    * date's full incoming relation from staging, or straight from the
    * buffer when everything fit one chunk (zero staging actions — the
    * common daily case). Peak driver residency: one chunk. */
  private[graft] final class ChunkSpool(s: SparkSession, ds: Dataset,
                                 stageDir: String) {
    private val buf = scala.collection.mutable.ArrayBuffer.empty[Row]
    private var seq = 0L
    private var staged = false
    private[graft] var peakBuffered = 0
    private val dateIdx = ds.schema.fieldIndex("target_date")
    private val keyIdx = ("target_date" +: ds.keyCols).map(ds.schema.fieldIndex)
    // the distinct target dates seen, tracked driver-side as rows arrive
    // (free — the fetch already materializes every row here), so land()
    // never runs a collect job just to learn the day set
    private val datesSeen =
      scala.collection.mutable.LinkedHashSet.empty[String]

    def dates: Seq[String] = datesSeen.toSeq

    def add(rows: Seq[Row]): Unit = {
      buf ++= rows
      rows.foreach(r => datesSeen += String.valueOf(r.get(dateIdx)))
      peakBuffered = math.max(peakBuffered, buf.size)
      if (buf.size >= ds.batchSize) flush()
    }

    private def toDf(rows: Seq[Row]): DataFrame = {
      import scala.jdk.CollectionConverters._
      val withSeq = rows.map { r =>
        val v = Row.fromSeq(r.toSeq :+ seq); seq += 1; v }
      val schema = ds.schema.add("__seq", "long", nullable = false)
      // RAW rows only: the dataset transform runs once, in land(), on
      // the deduped incoming relation — never per chunk. Applying it
      // here made the two write paths disagree (staged: transform →
      // dedup on possibly-rewritten keys; one-chunk: dedup raw →
      // transform) and let a row-count-changing transform skew the
      // staged manifest figure.
      s.createDataFrame(withSeq.asJava, schema)
    }

    private def flush(): Unit = {
      if (buf.nonEmpty) {
        toDf(buf.toSeq).coalesce(1)
          .write.mode(org.apache.spark.sql.SaveMode.Append)
          .parquet(stageDir)
        staged = true
        buf.clear()
      }
    }

    /** The date's incoming rows, deduped LAST-WINS on the dataset key —
      * the reference's `ON CONFLICT DO UPDATE` applied within one fetch
      * (ADVICE r15: Upsert.keyed alone lands within-fetch duplicates
      * twice and over-counts them). None when the fetch produced zero
      * rows (a checked-empty day: no partition to touch). The second
      * element is the deduped count when it is already known
      * driver-side (the one-chunk path — no count job needed). */
    def dedupedIncoming(): Option[(DataFrame, Option[Long])] = {
      if (staged) { flush(); Some((dedupDf(s.read.parquet(stageDir)), None)) }
      else if (buf.isEmpty) None
      else {
        // one-chunk path: last-wins dedup ON THE DRIVER (the rows are
        // already here) — no Spark window, no shuffle, no extra job.
        // Both paths dedup the RAW endpoint rows on the endpoint key;
        // the transform runs downstream in land().
        val seen =
          scala.collection.mutable.LinkedHashMap.empty[Seq[Any], Row]
        buf.foreach(r => seen(keyIdx.map(r.get(_))) = r)
        val rows = seen.values.toSeq
        Some((toDf(rows).drop("__seq"), Some(rows.size.toLong)))
      }
    }

    private def dedupDf(withSeq: DataFrame): DataFrame = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(("target_date" +: ds.keyCols).map(col): _*)
        .orderBy(col("__seq").desc)
      withSeq.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1).drop("__rn", "__seq")
    }
  }

  /** The landing table's data root for `ds` — a parquet layout
    * partitioned by `target_date`, one root per dataset. ONLY the legacy
    * single-dataset `run()` wrapper keeps the bare `data` dir, via the
    * explicit [[Dataset.legacyLayout]] marker (r16 ADVICE: dispatching on
    * structural schema equality routed any generic dataset that happened
    * to use the 3-column ApiRow shape to the SHARED bare dir — two such
    * datasets would silently mix tables while coverage stayed per-name). */
  private[graft] def landingDataPath(root: String): String = s"$root/data"
  private[graft] def landingDataPath(root: String, ds: Dataset): String =
    if (ds.legacyLayout) landingDataPath(root)
    else s"$root/data_${ds.name}"

  /** The published landing table (None until the first date lands).
    * Emptiness ignores Spark metadata entries (`_temporary`,
    * `_SUCCESS`, dotfiles): a writer that crashed mid-first-write
    * leaves only `_temporary` behind, and treating that as a published
    * table would wedge every subsequent land() on a schema-inference
    * error — the partition dirs (`target_date=...`) are the signal. */
  def readLanding(s: SparkSession, root: String): Option[DataFrame] =
    readLandingPath(s, landingDataPath(root))

  /** The published landing table for one [[Dataset]]. */
  def readLanding(s: SparkSession, root: String,
                  ds: Dataset): Option[DataFrame] =
    readLandingPath(s, landingDataPath(root, ds))

  /** The published landing table for a dataset known only BY NAME
    * (the refresh side holds a [[Config]], not the [[Dataset]]): the
    * generic `data_<name>` root when present, else the legacy bare
    * `data` layout (r16 ADVICE: preferring the legacy dir meant a
    * dataset migrated from the ApiRow shape to a generic schema under
    * the same name would silently refresh from the STALE legacy table;
    * generic-first means a migrated dataset always reads its new
    * layout, and pure-legacy jobs — which never create `data_<name>` —
    * still resolve the bare dir). */
  def readLandingNamed(s: SparkSession, root: String,
                       name: String): Option[DataFrame] = {
    val generic = readLandingPath(s, s"$root/data_$name")
    val legacy = readLandingPath(s, landingDataPath(root))
    // migration tripwire (ADVICE r17): a dataset that landed under the
    // ApiRow shape has history in the shared bare dir; once it migrates
    // to the generic layout the new dir SHADOWS those rows for every
    // reader — surface that instead of silently serving a partial table
    if (generic.isDefined && legacy.isDefined)
      System.err.println(s"LandingJob: dataset '$name' has both the " +
        s"generic layout ($root/data_$name) and rows in the legacy bare " +
        s"dir ($root/data); reading the generic layout — if those legacy " +
        s"rows belong to '$name', migrate its target_date=* partitions " +
        s"into $root/data_$name or they stay shadowed")
    generic.orElse(legacy)
  }

  private def readLandingPath(s: SparkSession,
                              path: String): Option[DataFrame] = {
    val p = new java.io.File(path)
    val real = Option(p.listFiles()).getOrElse(Array())
      .filterNot(f => f.getName.startsWith("_") || f.getName.startsWith("."))
    if (real.nonEmpty) Some(s.read.parquet(p.toString)) else None
  }

  /** PARTITION-SCOPED idempotent landing write: upsert the date's rows
    * into that date's partition on the dataset key (the
    * within-partition key — the reference's (code, date) PK) and
    * overwrite ONLY the partitions the incoming rows touch (dynamic
    * partition overwrite). Re-landing identical rows yields an
    * identical partition; every other partition's files are untouched
    * byte for byte. Returns the DEDUPED fetched row count (the manifest
    * figure — within-fetch duplicates land, and count, once; computed
    * pre-transform so both chunk regimes report the same number). */
  private def land(s: SparkSession, cfg: Config, ds: Dataset,
                   spool: ChunkSpool): Long = {
    val (raw, knownCount) = spool.dedupedIncoming() match {
      case None => return 0L // checked-empty day: no partition to touch
      case Some(t) => t
    }
    // one-chunk incoming is a LocalRelation (free to re-evaluate);
    // staged incoming gets pinned so the count below and the merge
    // don't each re-run the dedup window over the staging files
    val rawPinned =
      if (knownCount.isDefined) raw else raw.localCheckpoint()
    // the manifest figure in BOTH write paths: deduped FETCHED rows
    // (the endpoint's upsert count, the reference's batch figure) —
    // computed before the transform so a row-count-changing cleanse
    // cannot skew it differently across chunk regimes
    val landedCount = knownCount.getOrElse(rawPinned.count())
    // the dataset transform (cleanse) runs ONCE, on the deduped
    // incoming relation — identically in both write paths
    val incoming = ds.transform(rawPinned)
      .withColumn("target_date", to_date(col("target_date")))
    // partition-scoped read: only the incoming dates' partitions are
    // merged against (partition pruning — the rest of the table is
    // never read); the day set was tracked driver-side by the spool
    val dates = spool.dates.map(java.sql.Date.valueOf)
    // FIRST-LAND fast path (r17, guide §1.2 "don't compute things you
    // throw away"): when none of the incoming dates' partition dirs
    // exist yet — every forward-fill day, every heal of a never-landed
    // date — the merge would union against a provably empty relation
    // and the pre-write checkpoint would only be protecting a read of
    // partitions that don't exist. Skip both (one FS listing decides;
    // the re-land/idempotence path below is untouched).
    //
    // The probe goes through the Hadoop FileSystem API resolved from the
    // path itself (r17 VERDICT #1 / ADVICE: a `java.io.File` probe
    // returns false on ANY non-local filesystem — HDFS/S3, the 100 TB
    // deployment — and a false negative here silently OVERWRITES an
    // existing partition with only the incoming rows under dynamic
    // partition overwrite, instead of merging). java.io.File remains
    // fine for scratch dirs; it must never gate merge-vs-overwrite.
    val dataPath = landingDataPath(cfg.landingRoot, ds)
    val anyExistingPartition = readLanding(s, cfg.landingRoot, ds)
      .isDefined && dates.exists(d => partitionExists(s, dataPath, d))
    val merged =
      if (!anyExistingPartition) incoming
      else {
        val existing = readLanding(s, cfg.landingRoot, ds)
          .map(_.filter(col("target_date").isin(dates: _*))
            .select(incoming.columns.map(col): _*))
          .getOrElse(incoming.limit(0))
        Upsert.keyed(existing, incoming, "target_date" +: ds.keyCols)
          .localCheckpoint() // the write replaces the partition it read
      }
    // PER-WRITE option, not a session-conf flip (r18): the save/restore
    // pattern races any concurrent writer in the same session — a
    // restore landing inside another write's window would flip it to
    // STATIC overwrite, which truncates the whole table. The write
    // option scopes the mode to exactly this write.
    merged.write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("target_date")
      .parquet(landingDataPath(cfg.landingRoot, ds))
    landedCount
  }

  /** The merge-vs-fast-path partition probe, through the Hadoop
    * FileSystem resolved FROM THE PATH — never `java.io.File`, which
    * answers false for any non-local filesystem (HDFS/S3) AND for any
    * URI-style path string, and a false negative here lets dynamic
    * partition overwrite REPLACE an existing partition with only the
    * incoming rows instead of merging. Exposed for the spec that pins
    * exactly that failure mode (a `file:`-scheme root). */
  private[jobs] def partitionExists(s: SparkSession, dataPath: String,
                                    d: java.sql.Date): Boolean = {
    val p = new org.apache.hadoop.fs.Path(s"$dataPath/target_date=$d")
    p.getFileSystem(s.sparkContext.hadoopConfiguration).exists(p)
  }

  /** Plan the next run's dates from the published coverage ledger —
    * the composition the round-13 verdict asked for: catch-up reads
    * COVERAGE, not output presence. */
  def catchUpDates(s: SparkSession, cfg: Config, calendar: DataFrame,
                   calDateCol: String, today: java.sql.Date,
                   lookbackDays: Int, maxDays: Int): Seq[String] =
    catchUpDatesFor(s, cfg, cfg.dataset, calendar, calDateCol, today,
      lookbackDays, maxDays)

  /** One multi-dataset schedule entry: a dataset, its endpoint, and
    * the dates to land — listed in PRIORITY order (the reference's
    * cron-A dataset loop runs endpoints in a fixed priority order with
    * continue-on-error, `cron-a-direct.ts:115-147`). */
  final case class Scheduled(ds: Dataset, fetch: RowFetch,
                             dates: Seq[String])

  /** The MULTI-DATASET scheduler pass: land every entry's dates, in
    * entry (priority) order, under ONE lease and ONE shared run
    * ledger/coverage root. Failure isolation is two-level, matching
    * the reference's continue-on-error chain: a failed DATE moves to
    * the dataset's next date (runOneDate already records the failed
    * claim + FAILED manifest), and a fully-failing DATASET moves to
    * the next dataset — one broken endpoint never blocks the others.
    * The lease heartbeats after every date, so an N-dataset backfill
    * never loses its lock mid-pass. Returns (dataset, result) per
    * attempted date, in execution order. */
  def runSchedule(s: SparkSession, lock: JobLock, runs: RunLedger,
                  cfg: Config, entries: Seq[Scheduled],
                  bucket: Ingest.TokenBucket,
                  retrySleepMs: Long => Unit = Thread.sleep(_),
                  uniform: () => Double = () => 0.0,
                  nowMs: () => Long = () => System.currentTimeMillis())
      : Either[String, Seq[(String, DateResult)]] =
    lock.acquire(cfg.jobName, cfg.ttlSeconds) match {
      case Left(reason) => Left(reason)
      case Right(token) =>
        try {
          val ledger = new LedgerBuf(s, cfg,
            entries.map(_.ds.name).toSet,
            entries.flatMap(_.dates).toSet)
          Right(entries.flatMap { e =>
            e.dates.map { date =>
              val r = runOneDate(s, runs, cfg, e.ds, date, e.fetch,
                bucket, retrySleepMs, uniform, nowMs, ledger)
              lock.extend(cfg.jobName, token, cfg.ttlSeconds)
              e.ds.name -> r
            }
          })
        }
        finally lock.release(cfg.jobName, token)
    }

  /** Plan catch-up ACROSS datasets from the shared coverage root:
    * per-dataset missing/failed business days ([[Coverage.catchUpTargets]]),
    * ordered by the given dataset priority, oldest dates first within a
    * dataset — the order [[runSchedule]] executes. Datasets with
    * nothing to heal are omitted. */
  def scheduleCatchUp(s: SparkSession, cfg: Config,
                      datasets: Seq[String], calendar: DataFrame,
                      calDateCol: String, today: java.sql.Date,
                      lookbackDays: Int, maxDays: Int)
      : Seq[(String, Seq[String])] =
    datasets.map(d => d -> catchUpDatesFor(s, cfg, d, calendar,
        calDateCol, today, lookbackDays, maxDays))
      .filter(_._2.nonEmpty)

  /** Per-dataset catch-up planning over the shared coverage root. */
  def catchUpDatesFor(s: SparkSession, cfg: Config, dataset: String,
                      calendar: DataFrame, calDateCol: String,
                      today: java.sql.Date, lookbackDays: Int,
                      maxDays: Int): Seq[String] = {
    import s.implicits._
    Coverage.catchUpTargets(readLedger(s, cfg.coverageRoot), dataset,
      calendar, calDateCol, today, lookbackDays, maxDays)
      .select(col("target_day")).as[java.sql.Date]
      .collect().toSeq.map(_.toString)
  }
}
