package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev scratchpad: schema/plan probes against the driver testdata. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.shuffle.partitions", "8")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.analytics.ScreenMetrics.run(spark, "/root/testdata/sf0.1")
    df.explain("formatted")
    spark.stop()
  }
}
