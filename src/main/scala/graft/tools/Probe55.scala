package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import scala.collection.mutable.ArrayBuffer

/** Temporary probe: q55 stage inventory at sf0.1. */
object Probe55 {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()

    val stages = ArrayBuffer.empty[(Int, String, Long, Int)]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val ms = for {
          s <- si.submissionTime; c <- si.completionTime
        } yield c - s
        stages += ((si.stageId, si.name.take(60), ms.getOrElse(-1L),
          si.numTasks))
      }
    })
    // warm run first, then measured run
    graft.queries.BasketProgram.q55BasketValuation(spark, dir).count()
    spark.catalog.clearCache()
    stages.clear()
    val t0 = System.nanoTime()
    graft.queries.BasketProgram.q55BasketValuation(spark, dir).count()
    println(f"PROBE55 total ${(System.nanoTime() - t0) / 1e9}%.2f s, " +
      s"${stages.size} stages")
    stages.sortBy(-_._3).take(25).foreach { case (id, n, ms, nt) =>
      println(f"PROBE55 stage=$id%4d ${ms}%6d ms tasks=$nt%3d  $n")
    }
    spark.stop()
  }
}
