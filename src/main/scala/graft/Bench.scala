package graft
import org.apache.spark.sql.SparkSession
import scala.jdk.CollectionConverters._

/** Benchmark harness. Coordinator mode (default) forks ONE CHILD JVM PER
  * QUERY and aggregates the children's medians into the driver's one-line
  * JSON. Child mode (`--one <query>`) opens a fresh session, warms the JVM
  * the same way `tools.Time1` does, and times `reps` back-to-back runs.
  *
  * Why fork: rounds 5 and 6 proved a single 90-query session accumulates
  * state no amount of per-rep cache/RDD cleanup fully releases (Janino
  * codegen cache + metaspace growth, shuffle-file buildup, GC pressure):
  * r06 still over-reported heavy queries 2-3x vs fresh-JVM Time1 medians
  * and contained a containment inversion (q61 reported faster than its
  * strict subset q15). A child JVM per query makes every median a
  * fresh-JVM measurement, directly comparable to Time1, by construction.
  * The coordinator also asserts the containment invariants (q61/q69/q79
  * must not run faster than the q15 pipeline they contain) and reports
  * the check in the JSON (`"inv"`).
  */
object Bench {
  private def session(): SparkSession = {
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
    spark
  }

  def main(args: Array[String]): Unit =
    if (args.length >= 2 && args(0) == "--one") child(args(1).split(",").toSeq)
    else coordinate()

  /** Child mode: same warmup + rep discipline as tools.Time1 (range-sum
    * warmup only; no table pre-touch — rep 1 pays the parquet footer reads
    * exactly as Time1's rep 1 does, and the median discards it). Accepts a
    * comma-separated GROUP of queries: heavy queries ride alone (their
    * medians are fresh-JVM by construction); cheap ones share a child 8 at
    * a time — their residual cross-query tax is bounded by the group size
    * and was small even in the r06 single-session harness. */
  private def child(names: Seq[String]): Unit = {
    val t00 = System.nanoTime()
    def mark(s: String): Unit =
      System.err.println(f"BENCHMARK-$s ${(System.nanoTime() - t00) / 1e9}%.2f")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt
    val spark = session()
    mark("session")
    spark.range(1000000).selectExpr("sum(id)").collect()
    mark("warmup")
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        val ok = try { fn(spark, sfDir).count(); true } catch { case _: Throwable => false }
        val dt = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
        if (ok) dt else -1.0
      }.sorted
      println(f"BENCHQ $name ${times(times.length / 2)}%.3f ${times.head}%.3f")
    }
    mark("reps")
    spark.stop()
    mark("stop")
  }

  /** Child-JVM tiering, recalibrated each round from the committed
    * bench_results.json (this edition: round 8, 182 queries, total 262s).
    * Wall-time accounting: 182 queries × 3 fresh reps ≈ 790s of measured
    * work is the honest floor; everything else is per-child overhead
    * (~5-8s: JVM+CDS load, session, warmup), so wall time is governed by
    * CHILD COUNT. r7 isolated everything ≥1.5s (78 children, ~23 min);
    * the r8 medians show queries under ~2.5s carry negligible shared-
    * child tax, so only the genuinely heavy tier keeps a private JVM.
    *
    * - [[isolated]]: measured median ≥ 2.5s at sf0.1, plus EVERY
    *   streaming gate (state-store timing is sensitive to neighbors)
    *   — these medians must stay strictly fresh-JVM.
    * - [[midTier]]: 1.2s ≤ median < 2.5s, non-streaming — grouped
    *   [[MidGroup]] per child; residual tax at this weight measured
    *   within rep noise (r6 data, re-confirmed by the r8 medians of the
    *   queries r7 moved INTO isolation: shared vs isolated shifted them
    *   < 10%).
    * - everything else (sub-1.2s): groups of [[GroupSize]].
    * The containment invariants below police this choice every run: if
    * shared-child tax ever inflates a subset above its superset, the
    * JSON says so. */
  private val isolated: Set[String] = Set(
    // streaming gates — always isolated regardless of weight
    "q92_stream_screen", "q93_stream_windowed_agg", "q94_stream_dedup",
    "q95_stream_cardinality", "q96_stream_breadth", "q105_stream_stream_join",
    "q116_stream_maintain", "q143_stream_cms", "q157_stream_sessions",
    "q187_stream_outer_join",
    // measured >= 2.5s fresh at sf0.1 (bench_results.json, round 8)
    "q15_neardup_pairs", "q55_basket_valuation", "q56_factor_vector_search",
    "q61_neardup_clusters", "q69_dedup_corpus", "q76_training_manifest",
    "q77_incremental_dedup", "q79_neardup_clusters_stars",
    "q81_dsir_importance", "q86_semdedup", "q89_knn_graph",
    "q99_pq_adc_recall", "q112_lev_pairs", "q113_pagerank",
    "q123_allpairs_join", "q135_dataset_card", "q136_quality_keeper",
    "q146_triangles", "q150_dbscan", "q151_cluster_labels",
    "q152_lsh_calibration", "q153_kcore", "q164_kmeans_elbow",
    "q168_personalized_pr")

  /** 1.2-2.5s tier: grouped [[MidGroup]] to a child. */
  private val midTier: Set[String] = Set(
    "q14_minhash_candidates", "q25_factor_vectors", "q36_product_agg",
    "q43_per_bands", "q45_screen_published", "q53_bucketed_join",
    "q62_containment_pairs", "q66_simhash_pairs", "q67_repetition_stats",
    "q68_decontamination", "q70_corpus_clean", "q71_bm25",
    "q74_ivf_kmeans", "q84_source_drift", "q88_dup_spans",
    "q98_sq8_recall", "q115_source_overlap", "q117_linear_interp",
    "q124_span_dedup", "q125_bpe_merges", "q126_cms_estimate",
    "q127_bpe_encode", "q139_pmi_pairs", "q141_skip_grams",
    "q145_novelty_curve", "q161_kmv_sketch", "q162_kmv_overlap",
    "q171_good_turing", "q173_heaps_fit", "q175_ks_test",
    // round-8 additions (measured sf0.1 fresh: q183 2.1s, q191 1.9s;
    // q184 0.5s stays here for the non-equi join's plan variance)
    "q183_pca_power", "q184_record_linkage", "q191_textrank")

  private val MidGroup = 6
  private val GroupSize = 16

  /** Containment pairs: the first query's pipeline is a strict subset of
    * the second's, so a clean harness can never time the second faster
    * (beyond noise). This exact inversion is what convicted the r5/r6
    * single-session harnesses. */
  private val containment = Seq(
    ("q15_neardup_pairs", "q61_neardup_clusters"),
    ("q15_neardup_pairs", "q69_dedup_corpus"),
    ("q15_neardup_pairs", "q79_neardup_clusters_stars"),
    // q112 = q14's candidate pipeline + prefix joins + banded DP verify
    ("q14_minhash_candidates", "q112_lev_pairs"),
    // q150 = q15's pairs + core/border/noise classification
    ("q15_neardup_pairs", "q150_dbscan"),
    // q151 = q15's pairs + CC + c-TF-IDF labeling
    ("q15_neardup_pairs", "q151_cluster_labels"),
    // q152 = q14's candidate pipeline + match-count and exact-verify joins
    ("q14_minhash_candidates", "q152_lsh_calibration"),
  )

  private def coordinate(): Unit = {
    // SPARK_GRAFT_BENCH_ONLY=q15_neardup_pairs,q61_neardup_clusters — local
    // iteration aid; the driver never sets it
    val names = sys.env.get("SPARK_GRAFT_BENCH_ONLY") match {
      case Some(list) => list.split(",").map(_.trim).filter(SparkEntry.queries.contains).toSeq
      case None => SparkEntry.queries.keys.toSeq
    }
    var isoMode = "jvm"
    val tmp = java.nio.file.Files.createTempDirectory("graft-bench")
    // CDS (class-data-sharing) archive cuts per-child overhead ~13s -> ~4.5s
    // (session create 7->2.3s, codegen warmup 5.8->1.9s, measured on this
    // host) WITHOUT touching measured reps — sharing only accelerates
    // classloading, which completes before rep 1. CDS requires a jar-only
    // classpath, so directory entries (sbt's target/classes) are jarred up
    // first; the first child dumps the archive at exit, the rest map it.
    val childCp = try jarredClasspath(tmp)
                  catch { case _: Throwable => System.getProperty("java.class.path") }
    val jsa = tmp.resolve("cds.jsa")
    // heavy queries ride alone; the sub-second tail shares children in
    // groups of GroupSize — full isolation for all 93 cost ~9s/child in
    // pure session+warmup overhead (~15 min wall), which risks any
    // driver-side bench budget for no measurement benefit on 0.2s queries
    val groups: Seq[Seq[String]] =
      names.filter(isolated).map(Seq(_)) ++
        names.filter(midTier).grouped(MidGroup).toSeq ++
        names.filterNot(n => isolated(n) || midTier(n)).grouped(GroupSize).toSeq
    val results: Seq[(String, (Double, Double))] =
      if (sys.env.contains("SPARK_GRAFT_BENCH_INPROC")) {
        isoMode = "session"; runInProcess(names)
      } else runForked(groups.head, childCp, Seq(s"-XX:ArchiveClassesAtExit=$jsa")) match {
        case None =>
          // fork failed outright (classpath/launcher mismatch in this
          // environment) — fall back to the r06 single-session harness so
          // the driver still gets numbers; mark the JSON accordingly
          System.err.println("BENCH: fork failed, falling back to in-process")
          isoMode = "session"; runInProcess(names)
        case Some(first) =>
          val cds = if (java.nio.file.Files.exists(jsa))
            Seq(s"-XX:SharedArchiveFile=$jsa") else Seq.empty
          first ++ groups.tail.flatMap { g =>
            runForked(g, childCp, cds)
              .getOrElse(g.map(_ -> ((-1.0, -1.0))))
          }
      }
    try {
      import java.nio.file._
      Files.walk(tmp).sorted(java.util.Comparator.reverseOrder())
        .forEach(p => Files.deleteIfExists(p))
    } catch { case _: Throwable => }
    emit(results.toMap, results, isoMode)
  }

  /** The parent's classpath with every directory entry replaced by a jar of
    * its contents (CDS archives refuse non-empty directory entries). */
  private def jarredClasspath(tmp: java.nio.file.Path): String = {
    import java.io.File
    import java.nio.file._
    import java.util.jar.{JarEntry, JarOutputStream}
    System.getProperty("java.class.path").split(File.pathSeparator).zipWithIndex
      .map { case (entry, i) =>
        val dir = new File(entry)
        if (!dir.isDirectory) entry
        else {
          val jarPath = tmp.resolve(s"cp$i.jar")
          val jos = new JarOutputStream(Files.newOutputStream(jarPath))
          try {
            val base = dir.toPath
            Files.walk(base).filter(Files.isRegularFile(_)).forEach { f =>
              jos.putNextEntry(new JarEntry(base.relativize(f).toString.replace('\\', '/')))
              Files.copy(f, jos)
              jos.closeEntry()
            }
          } finally jos.close()
          jarPath.toString
        }
      }.mkString(File.pathSeparator)
  }

  /** Launch `graft.Bench --one <n1,n2,...>` in a fresh JVM with this JVM's
    * own flags (add-opens, -Xmx, -D props) and classpath; parse its BENCHQ
    * lines. Child stdout/stderr noise is forwarded to OUR stderr so the
    * driver's stdout keeps exactly one JSON line. Returns None only if the
    * fork itself failed (no BENCHQ lines at all). */
  private def runForked(group: Seq[String], cp: String,
                        extraFlags: Seq[String]): Option[Seq[(String, (Double, Double))]] = {
    val javaBin = s"${System.getProperty("java.home")}/bin/java"
    val jvmArgs = java.lang.management.ManagementFactory.getRuntimeMXBean
      .getInputArguments.asScala.toSeq
    val cmd = Seq(javaBin) ++ jvmArgs ++ extraFlags ++
      Seq("-cp", cp, "graft.Bench", "--one", group.mkString(","))
    try {
      val pb = new ProcessBuilder(cmd.asJava)
      pb.redirectErrorStream(true)
      val p = pb.start()
      val out = new java.io.BufferedReader(
        new java.io.InputStreamReader(p.getInputStream))
      var line: String = null
      val hits = scala.collection.mutable.Map.empty[String, (Double, Double)]
      while ({ line = out.readLine(); line != null })
        if (line.startsWith("BENCHQ ")) {
          val parts = line.split(" ")
          hits(parts(1)) = (parts(2).toDouble, parts(3).toDouble)
        } else System.err.println(line)
      p.waitFor()
      if (hits.isEmpty) None
      else Some(group.map(n => n -> hits.getOrElse(n, (-1.0, -1.0))))
    } catch {
      case e: Throwable =>
        System.err.println(s"BENCH fork ${group.mkString(",")}: $e"); None
    }
  }

  /** r06-style single-session path, kept as a fallback only (medians from
    * this path carry the documented 2-3x late-session tax). */
  private def runInProcess(names: Seq[String]): Seq[(String, (Double, Double))] = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt
    val spark = session()
    spark.range(1000000).selectExpr("sum(id)").collect()
    try SparkEntry.entry(spark).count() catch { case _: Throwable => }
    val res = names.map { name =>
      val fn = SparkEntry.queries(name)
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch { case _: Throwable => }
        val dt = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
        dt
      }.sorted
      name -> (times(times.length / 2), times.head)
    }
    spark.stop()
    res
  }

  private def emit(byName: Map[String, (Double, Double)],
                   ordered: Seq[(String, (Double, Double))],
                   isoMode: String): Unit = {
    def f3(d: Double): String = "%.3f".formatLocal(java.util.Locale.ROOT, d)
    def short(k: String): String = k.takeWhile(_ != '_')
    val total = ordered.map(_._2._1).filter(_ >= 0).sum
    // containment invariants: subset must not exceed superset by >10%
    // (10% = rep noise allowance); any hit names the violated pair
    val bad = containment.flatMap { case (sub, sup) =>
      (byName.get(sub), byName.get(sup)) match {
        case (Some((s, _)), Some((g, _))) if s >= 0 && g >= 0 && g < s / 1.10 =>
          Some(s"${short(sup)}<${short(sub)}")
        case _ => None
      }
    }
    val inv = if (bad.isEmpty) "ok" else bad.mkString("+")
    if (sys.env.contains("SPARK_GRAFT_BENCH_MIN")) {
      val qsMin = ordered.map { case (k, (_, min)) =>
        "\"" + short(k) + "\":" + f3(min) }.mkString("{", ",", "}")
      System.err.println(s"""{"queries_min":$qsMin}""")
    }
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def line(qs: String, extra: String): String =
      s"""{"metric":"total","value":${f3(total)},"unit":"sec","queries":$qs,$extra"reps":$reps,"iso":"$isoMode","inv":"$inv","sf":"$sfDir"}"""
    // FULL artifact — every median + total + inv — goes to a FILE the
    // tail can never truncate: round 7's 181-entry stdout line overflowed
    // the driver's 2000-char tail buffer, losing 32 medians and leaving
    // parsed:null. The file is the complete record; stdout is best-effort.
    val fullQs = ordered.map { case (k, (med, _)) =>
      "\"" + short(k) + "\":" + f3(med) }.mkString("{", ",", "}")
    val full = line(fullQs, "")
    val outPath = java.nio.file.Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_results.json"))
    try java.nio.file.Files.write(outPath,
      (full + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    catch { case e: Throwable => System.err.println(s"BENCH write $outPath: $e") }
    // stdout line: if the full map fits the driver's tail buffer, print
    // it; otherwise print the HEAVIEST medians that fit (the informative
    // tail of the distribution — sub-100ms entries are the fungible ones)
    // plus qn (true count) and a pointer to the complete file
    if (full.length <= 1900) println(full)
    else {
      val overhead = line("{}", s""""qn":${ordered.size},"queries_file":"$outPath",""").length
      var budget = 1900 - overhead
      val kept = scala.collection.mutable.ListBuffer.empty[(String, Double)]
      ordered.sortBy(-_._2._1).foreach { case (k, (med, _)) =>
        val cost = short(k).length + f3(med).length + 4
        if (budget - cost >= 0) { budget -= cost; kept += (short(k) -> med) }
      }
      val qs = kept.map { case (k, m) => "\"" + k + "\":" + f3(m) }
        .mkString("{", ",", "}")
      println(line(qs, s""""qn":${ordered.size},"queries_file":"$outPath","""))
    }
  }
}
