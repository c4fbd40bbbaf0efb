package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev scratchpad. */
object Probe {
  def main(args: Array[String]): Unit = {
    for (p <- Seq("32", "8")) {
      val spark = SparkSession.builder().master("local[32]")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", p)
        .appName(s"probe$p")
        .getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      spark.range(100).count()
      val t0 = System.nanoTime()
      graft.queries.TextQueries.q15NearDupPairs(spark, "/root/testdata/sf0.1").count()
      println(f"partitions=$p q15 ${(System.nanoTime()-t0)/1e9}%6.2f s")
      val t1 = System.nanoTime()
      graft.queries.TextQueries.q14MinhashCandidates(spark, "/root/testdata/sf0.1").count()
      println(f"partitions=$p q14 ${(System.nanoTime()-t1)/1e9}%6.2f s")
      spark.stop()
    }
  }
}
