package graft.tools
import org.apache.spark.sql.SparkSession
object PlanPeek {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    for (q <- args) {
      val plan = graft.SparkEntry.queries(q)(spark, dir).queryExecution.executedPlan.toString
      val ex = plan.linesIterator.filter(l => l.contains("Exchange") || l.contains("Broadcast")).take(20)
      println(s"== $q ==")
      println(s"  exchanges: ${plan.linesIterator.count(_.trim.startsWith("+- Exchange") )}")
      ex.foreach(l => println("  " + l.trim.take(110)))
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
