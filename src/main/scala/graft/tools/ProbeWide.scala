package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measure the corpus-SA pair-carrier paths head to head: the packed
  * single-long fast path vs the two-long WIDE path large corpora
  * (≥ 2^31 suffixes) take automatically. Same corpus, same rounds, same
  * range-sort structure — the delta is one extra long per row through
  * the per-round checkpoints and the sort key width.
  * `runMain graft.tools.ProbeWide [sfDir] [reps]`. */
object ProbeWide {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/tmp/graft_sf1"
    val reps = if (args.length > 1) args(1).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()
    def run(wide: Boolean): Unit = (1 to reps).foreach { i =>
      val t0 = System.nanoTime()
      val n = graft.queries.SuffixArray
        .corpusRanks(spark, graft.Tables.documents(spark, sfDir),
          graft.queries.SuffixArray.SaRounds, total = true, forceWide = wide)
        .count()
      println(f"PROBE-WIDE wide=$wide rep$i " +
        f"${(System.nanoTime() - t0) / 1e9}%.2f s rows=$n")
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
    }
    run(wide = false)
    run(wide = true)
    spark.stop()
  }
}
