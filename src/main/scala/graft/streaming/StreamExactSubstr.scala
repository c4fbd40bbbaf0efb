package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.queries.ExactSubstr

/** STREAMING corpus dedup maintenance — the thirteenth streaming shape:
  * the q213 incremental-ExactSubstr absorb run as a `foreachBatch` loop.
  * A standing state table holds one row per distinct gram ever seen
  * (gram → globally first struct(doc_id, pos) key); each arriving
  * micro-batch of documents dedups against the state-as-of-its-arrival
  * (one keyed join + one window over its OWN grams —
  * [[ExactSubstr.absorbDups]]), emits its per-doc reassembly rows, and
  * extends the state with its own gram minima. Because micro-batches
  * arrive in doc_id order, keep-first ≡ arrival order, so the
  * accumulated emissions equal the batch q211 rebuild on the same rows
  * NO MATTER how the stream is micro-batched — the q214 gate streams the
  * WHOLE corpus and so reuses q211's oracle verbatim, and the spec
  * sweeps batch splits.
  *
  * At 100 TB the state is gram-cardinality-sized (16-byte keys, one row
  * per distinct gram — the dedupable mass, not the corpus), lives in a
  * bucketed keyed table (`operators.Upsert.keyed` on `gram`), and each
  * micro-batch's cost is delta-sized: the stream never re-reads or
  * re-indexes absorbed text. In-process the state is an eagerly
  * checkpointed bounded DataFrame so the gate runs without a storage
  * dependency (same contract as [[StreamMaintain]]). */
object StreamExactSubstr {

  case class SDoc(doc_id: Long, text: String)

  /** Zero-row standing state: gram → first struct(doc_id, pos) key. */
  private[graft] def emptyState(s: SparkSession): DataFrame = {
    import org.apache.spark.sql.types._
    val kT = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("pos", LongType, nullable = false)))
    s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("gram", StringType, nullable = false),
        StructField("base_kmin", kT, nullable = true))))
  }

  /** Env-gated per-stage wall marks for the absorb loops (the r17
    * job-count-floor probe — SPARK_GRAFT_Q216_DEBUG=1). */
  private def marker(tag: String): String => Unit =
    if (!sys.env.contains("SPARK_GRAFT_Q216_DEBUG")) _ => ()
    else {
      var t = System.nanoTime()
      m => {
        System.err.println(
          f"$tag $m ${(System.nanoTime() - t) / 1e9}%.2f s")
        t = System.nanoTime()
      }
    }

  /** Mutable standing state + accumulated emissions for an in-process
    * run. Each state and emission is eagerly checkpointed so lineage
    * never chains across batches. */
  final class Absorber {
    @volatile private var state: Option[DataFrame] = None
    @volatile private var emitted: List[DataFrame] = Nil

    def absorb(batch: Dataset[SDoc]): Unit = synchronized {
      val mark = marker("Q214-PROBE")
      val docs = batch.toDF().localCheckpoint()
      mark("docs-ckpt")
      val grams = ExactSubstr.gramPositions(docs).localCheckpoint()
      mark("grams-ckpt")
      val st = state.getOrElse(emptyState(docs.sparkSession))
      // the batch's emission and its state extension both derive from the
      // SAME checkpointed (grams, st) inputs and write to independent
      // in-memory results — overlap the two action chains (guide §2.6).
      // No durability protocol here (contrast PersistedAbsorber, where
      // emission-before-state-append is the torn-batch replay contract
      // and MUST stay sequential).
      val mins = grams.groupBy(col("gram")).agg(min(col("__k")).as("__m"))
      val both = graft.operators.Materialize.concurrently(Seq(
        () => ExactSubstr.applySpans(docs,
          ExactSubstr.absorbDups(grams, st), ordered = false)
          .localCheckpoint(),
        () => st
          .join(mins, Seq("gram"), "full_outer")
          .select(col("gram"),
            least(coalesce(col("base_kmin"), col("__m")),
              coalesce(col("__m"), col("base_kmin"))).as("base_kmin"))
          .localCheckpoint()))
      emitted = both(0) :: emitted
      state = Some(both(1))
      mark("emit+state-ckpt")
    }

    def results: DataFrame = emitted match {
      case Nil => throw new IllegalStateException("no batches absorbed")
      case hd :: tl => tl.foldLeft(hd)(_ unionByName _)
    }
  }

  /** Wire an absorber onto a document stream; caller starts/stops. */
  def applied(docs: Dataset[SDoc], a: Absorber) =
    docs.writeStream.foreachBatch {
      (batch: Dataset[SDoc], _: Long) => a.absorb(batch)
    }

  /** PERSISTED absorber — the restartable production shape of
    * [[Absorber]]: the standing gram-keeper state lives in a BUCKETED
    * external table keyed on `gram` ([[graft.sources.Bucketed]], the
    * q53 zero-Exchange discipline — the state side of every absorb join
    * arrives pre-clustered), and emissions go to a parquet sink. The
    * instance holds NO DataFrame state: kill it after any batch,
    * construct a fresh one on the same (table, path), and the absorb
    * loop continues exactly where it stopped — the q216 gate proves a
    * stop-after-2/rebuild/continue run hash-matches the batch q211
    * oracle, with a compaction landing mid-stream.
    *
    * GENERATIONAL (LSM-style) state maintenance — each micro-batch's
    * WRITE volume is delta-sized, never O(|state|):
    *
    *  - each batch APPENDS its own gram minima as one new generation
    *    (`gen` column, [[graft.sources.Bucketed.appendBucketed]] — one
    *    more file group per bucket; rows appended = the batch's
    *    distinct gram count);
    *  - the absorb join resolves `min(base_kmin)` per gram across
    *    generations ON THE READ SIDE — a groupBy on the bucketed key,
    *    so resolution adds no Exchange (least-of-struct is associative:
    *    the min over generation minima IS the global first occurrence)
    *    — and once the standing state outgrows `pruneStateOverBytes`
    *    that read is DELTA-PRUNED ([[resolvedFor]]): a pushed
    *    gram-range filter plus a broadcast semi-join on the batch's
    *    distinct grams keep the per-batch resolution work proportional
    *    to the delta, never to the standing state;
    *  - every [[compactEvery]] generations one COMPACTION folds the
    *    table back to a single generation — the only state-sized write,
    *    amortized over the deltas between compactions. At 100 TB this
    *    is the difference between a nightly absorb loop that rewrites
    *    billions of gram-keeper rows per micro-batch and one that
    *    writes each delta once plus a periodic merge.
    *
    * Restart/replay contract: the generation number is derived from the
    * COMMITTED state (max gen + 1), and emissions for generation g
    * overwrite `emitted/gen=g`. A batch torn between its emission write
    * and its state append therefore replays idempotently — the rerun
    * derives the same g, overwrites the same emission partition, and
    * appends the state generation that was missing. A batch whose state
    * generation DID commit is complete; re-delivering it is the
    * streaming checkpoint's job to prevent (in-process gates replay
    * only uncommitted batches). Compaction's overwrite is the one
    * non-idempotent window; production schedules it as its own job
    * between batches (the merged relation is eagerly checkpointed
    * before the overwrite — the round-4 DROP-TABLE lesson). */
  /** @param pruneStateOverBytes delta-prune the state read
    *   ([[resolvedFor]]) only once the standing state's on-disk size
    *   exceeds this. The pruning costs one bounded driver round-trip
    *   per batch (the delta's gram min/max) plus the delta's distinct
    *   and one delta-sized exchange in the absorb plan —
    *   pure overhead while the state is small enough to scan outright
    *   (measured: the q216 sf0.1 gate, whose state is ~10 MB, ran
    *   25.5 s always-pruned vs 17.3 s with the crossover), and pure
    *   win once the state dwarfs any batch (the 100 TB regime the
    *   pruning exists for — `tools/Probe216` measures rows-into-merge
    *   scaling with the delta, not the state). The default crossover
    *   is deliberately conservative: at 64 MB a full scan-and-merge
    *   still costs less than a second. */
  final class PersistedAbsorber(table: String, path: String,
                                compactEvery: Int = 4,
                                pruneStateOverBytes: Long = 64L << 20) {

    /** Background lane for COMPACTION only (round-18, guide §2.6):
      * folding the generations is NOT part of the replay contract — a
      * crash that loses a queued compaction loses nothing (every
      * generation is still in the table), and production schedules the
      * fold between batches — so it runs on this thread while the NEXT
      * batch's docs/grams checkpoints proceed. The one non-idempotent
      * window (the table overwrite) is fenced by [[awaitCompact]]: no
      * table read is planned while the fold is in flight. The state
      * APPEND stays synchronous inside [[absorb]] — the epoch commit
      * (foreachBatch returning) must not outrun the generation it
      * claims, or a crash would strand a batch the streaming checkpoint
      * will never re-deliver (see the r18 rejection note on the
      * cross-epoch overlap in OPTIMIZATION_r18.md). */
    private val tailExec = java.util.concurrent.Executors
      .newSingleThreadExecutor(r => {
        val t = new Thread(r, "q216-compact"); t.setDaemon(true); t
      })
    private var compactF: Option[java.util.concurrent.Future[_]] = None
    private def awaitCompact(): Unit = compactF.foreach { f =>
      try f.get()
      catch {
        case e: java.util.concurrent.ExecutionException => throw e.getCause
      }
      compactF = None
    }
    /** Settle every queued background write. MUST be called before the
      * absorber instance is abandoned in favor of a fresh incarnation on
      * the same storage (the gates' graceful-handoff protocol); a
      * process crash instead leaves at most a torn batch, which the
      * replay contract covers. */
    def flush(): Unit = synchronized { awaitCompact() }

    /** On-disk size of the standing state — FS metadata only, no job. */
    private def stateBytes: Long = {
      def sz(f: java.io.File): Long =
        if (f.isFile) f.length()
        else Option(f.listFiles()).getOrElse(Array()).map(sz).sum
      sz(new java.io.File(s"$path/state"))
    }

    private def resolved(st: DataFrame): DataFrame =
      st.groupBy(col("gram")).agg(min(col("base_kmin")).as("base_kmin"))

    /** The state relation the absorb join actually needs, pruned to the
      * DELTA — the round-14 scale flag ("the absorb join still READS
      * the full resolved state every micro-batch") closed: only state
      * rows whose gram occurs in THIS batch can affect [[ExactSubstr
      * .absorbDups]] (it joins state on gram equality from the
      * incoming side), so below the generational min-merge sit
      *
      *  - a pushed `gram BETWEEN min(delta) AND max(delta)` range
      *    filter — the bucketed files are SORTED on gram, so parquet
      *    row-group min/max stats skip whole row groups outside the
      *    delta's range (real I/O pruning when the delta is localized);
      *  - a shuffled-hash LEFT SEMI join on the delta's distinct grams
      *    — rows fed to the min-merge are delta-matched only, so the
      *    resolution aggregation is delta-proportional, not
      *    O(|standing state|), per micro-batch.
      *
      * The state side keeps its bucketed clustering through both (a
      * filter preserves partitioning, and the semi-join's state side
      * is already hash-clustered on the key, so only the DELTA
      * exchanges — one delta-sized shuffle, never the state, and never
      * a driver-memory-bounded broadcast: a broadcast hint here would
      * cap the batch size at what the driver can hold, exactly the
      * wrong failure mode in the pruned (big-state) regime). The
      * min-merge on top still plans with ZERO state-side shuffle
      * Exchange — plan-spec pinned. */
    private def resolvedFor(s: SparkSession, grams: DataFrame): DataFrame = {
      val mm = grams.agg(min(col("gram")), max(col("gram"))).collect()(0)
      if (mm.isNullAt(0)) emptyState(s)
      else resolved(s.table(table)
        .filter(col("gram") >= lit(mm.getString(0)) &&
          col("gram") <= lit(mm.getString(1)))
        .join(grams.select(col("gram")).distinct().hint("shuffle_hash"),
          Seq("gram"), "left_semi"))
    }

    /** Probe hook: standing state rows a full resolve would scan vs the
      * rows the pruned delta read feeds to the min-merge ([[tools
      * .Probe216]]'s read-volume row). */
    private[graft] def stateReadRows(s: SparkSession,
                                     grams: DataFrame): (Long, Long) = synchronized {
      awaitCompact()
      if (!s.catalog.tableExists(table)) (0L, 0L)
      else {
        val mm = grams.agg(min(col("gram")), max(col("gram"))).collect()(0)
        val pruned = if (mm.isNullAt(0)) 0L
          else s.table(table)
            .filter(col("gram") >= lit(mm.getString(0)) &&
              col("gram") <= lit(mm.getString(1)))
            .join(grams.select(col("gram")).distinct()
              .hint("shuffle_hash"), Seq("gram"), "left_semi").count()
        (s.table(table).count(), pruned)
      }
    }

    /** Highest committed state generation (0 = no state yet). Bounded
      * metadata: one max/countDistinct over the slim gen column. */
    def currentGen(s: SparkSession): Long = synchronized {
      awaitCompact()
      if (!s.catalog.tableExists(table)) 0L
      else {
        val r = s.table(table).agg(max(col("gen"))).collect()(0)
        if (r.isNullAt(0)) 0L else r.getLong(0)
      }
    }

    /** (max gen, generation count) of the COMMITTED state — read from
      * storage once per absorber incarnation (the restart path), then
      * maintained locally: this instance is the only writer while its
      * job holds the lease (the [[graft.sources.JobLock]] discipline),
      * so re-scanning the table's gen column every batch would buy
      * nothing but a full listing + agg job per micro-batch. */
    private var genMeta: Option[(Long, Long)] = None

    def absorb(batch: Dataset[SDoc]): Unit = synchronized {
      val mark = marker("Q216-PROBE")
      val s = batch.sparkSession
      val docs = batch.toDF().localCheckpoint()
      mark("docs-ckpt")
      val grams = ExactSubstr.gramPositions(docs).localCheckpoint()
      mark("grams-ckpt")
      // the input materialization above overlapped any queued fold;
      // from here on the batch plans table reads, so the overwrite
      // window must be closed
      awaitCompact()
      mark("compact-sync")
      val exists = s.catalog.tableExists(table)
      val (maxGen, nGens) = genMeta.getOrElse {
        if (!exists) (0L, 0L)
        else {
          val r = s.table(table)
            .agg(max(col("gen")), countDistinct(col("gen"))).collect()(0)
          (if (r.isNullAt(0)) 0L else r.getLong(0), r.getLong(1))
        }
      }
      val gen = maxGen + 1L
      val st =
        if (!exists) emptyState(s)
        else if (stateBytes > pruneStateOverBytes) resolvedFor(s, grams)
        else resolved(s.table(table))
      mark("state-resolve")
      val out = ExactSubstr.applySpans(docs,
        ExactSubstr.absorbDups(grams, st), ordered = false)
      // overlap (guide §2.6): the generation's minima AGGREGATION is
      // in-memory work over the already-checkpointed grams, independent
      // of the emission chain and not a state-table write — running it
      // beside the emission write leaves the durability order intact:
      // the append below still starts only after the emission COMMITTED.
      // The emission itself stays idempotent: replaying a torn batch
      // re-derives the same gen and overwrites the same partition
      // instead of double-appending.
      var mins: DataFrame = null
      graft.operators.Materialize.concurrently(Seq[() => Unit](
        () => out.write.mode(org.apache.spark.sql.SaveMode.Overwrite)
          .parquet(s"$path/emitted/gen=$gen"),
        () => mins = grams.groupBy(col("gram"))
          .agg(min(col("__k")).as("base_kmin"))
          .withColumn("gen", lit(gen))
          .localCheckpoint()))
      mark("emit-write+mins")
      if (exists)
        graft.sources.Bucketed.appendBucketed(mins, table, "gram", 16)
      else
        graft.sources.Bucketed.writeBucketed(mins, table,
          s"$path/state", "gram", 16)
      mark("state-append")
      genMeta = Some((gen, nGens + 1L))
      if (nGens + 1L >= compactEvery.toLong) {
        // queued, not run: the fold overlaps the NEXT batch's input
        // materialization; its overwrite window is fenced by
        // awaitCompact() before any later table read (and by flush()
        // at incarnation handoff)
        compactF = Some(tailExec.submit(new Runnable {
          def run(): Unit = { compact(s, gen); mark("compact") }
        }))
        genMeta = Some((gen, 1L))
      }
    }

    /** Fold all generations back to one: the state-sized job, amortized
      * over the [[compactEvery]] delta appends since the last fold. */
    private def compact(s: SparkSession, gen: Long): Unit = {
      val merged = resolved(s.table(table))
        .withColumn("gen", lit(gen))
        .localCheckpoint() // lineage reads the table being replaced
      graft.sources.Bucketed.writeBucketed(merged, table,
        s"$path/state", "gram", 16)
    }

    /** Accumulated emissions across every absorber incarnation that
      * shared this path — read back from storage, not from memory. */
    def results(s: SparkSession): DataFrame =
      s.read.parquet(s"$path/emitted").drop("gen")
  }

  /** Wire a persisted absorber onto a document stream. */
  def appliedPersisted(docs: Dataset[SDoc], a: PersistedAbsorber) =
    docs.writeStream.foreachBatch {
      (batch: Dataset[SDoc], _: Long) => a.absorb(batch)
    }
}
