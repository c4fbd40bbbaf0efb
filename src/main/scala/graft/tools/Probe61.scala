package graft.tools

import org.apache.spark.sql.SparkSession

/** Temporary probe: q61 end-to-end timing at a given SF. */
object Probe61 {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()
    (1 to 3).foreach { i =>
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries("q61_neardup_clusters")(spark, sfDir).count()
      println(f"PROBE q61 rep$i ${(System.nanoTime() - t0) / 1e9}%.2f s rows=$n")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
