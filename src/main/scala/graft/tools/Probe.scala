package graft.tools

import org.apache.spark.sql.SparkSession

/** Regenerates the raw physical-plan dumps PLANS.md reviews
  * (writes /tmp/plans_body.md). */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.shuffle.partitions", "8")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    val targets = Seq(
      "q10_screen_metrics" -> graft.analytics.ScreenMetrics.run(spark, dir),
      "q06_asof_join" -> graft.queries.Core.q06AsofJoin(spark, dir),
      "q01_pricing_agg" -> graft.queries.Core.q01PricingAgg(spark, dir),
      "q15_neardup_pairs" -> graft.queries.TextQueries.q15NearDupPairs(spark, dir),
      "q42_market_breadth" -> graft.queries.Breadth.q42MarketBreadth(spark, dir),
      "q43_per_bands" -> graft.queries.PerBands.q43PerBands(spark, dir),
      "q47_ann_multiprobe" -> graft.queries.TextQueries.q47AnnMultiprobe(spark, dir),
      "q55_basket_valuation" -> graft.queries.BasketProgram.q55BasketValuation(spark, dir),
      "q56_factor_vector_search" -> graft.queries.FactorVectorProgram.q56FactorVectorSearch(spark, dir),
    )
    val sb = new StringBuilder
    targets.foreach { case (name, df) =>
      sb.append(s"\n## $name\n\n```\n")
      sb.append(df.queryExecution.executedPlan.treeString.take(9000))
      sb.append("\n```\n")
    }
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("/tmp/plans_body.md"), sb.toString)
    println("WROTE /tmp/plans_body.md")
    spark.stop()
  }
}
