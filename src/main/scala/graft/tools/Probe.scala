package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev scratchpad: schema/plan probes against the driver testdata. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.shuffle.partitions", "4")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val df = Seq(2.675).toDF("x")
    df.select(
      (col("x") * 100.0).as("a"),
      (col("x") * 100.0 + 0.5).as("b"),
      floor(col("x") * 100.0 + 0.5).as("c"),
      (floor(col("x") * 100.0 + 0.5) / 100.0).as("d")
    ).show(false)
    df.select(floor(col("x") * 100.0 + 0.5)).explain(true)
    spark.stop()
  }
}
