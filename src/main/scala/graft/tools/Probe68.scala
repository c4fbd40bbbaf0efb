package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Temporary probe: q68 stage-by-stage timing at a given SF. */
object Probe68 {
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
    import graft.queries.Curation._
    import graft.operators.Dedup
    val docs = graft.Tables.documents(spark, sfDir)
    docs.count()
    def t(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"PROBE68 $label ${(System.nanoTime() - t0) / 1e9}%.2f s rows=$n")
    }
    (1 to 2).foreach { rep =>
      t(s"rep$rep harrs_train") {
        Dedup.shingleHashArrays(docs.filter(col("source") =!= DecontamEvalSource),
          "doc_id", "text", DecontamK).count()
      }
      t(s"rep$rep harrs_train_explode") {
        Dedup.shingleHashArrays(docs.filter(col("source") =!= DecontamEvalSource),
          "doc_id", "text", DecontamK)
          .select(col("doc_id"), explode(col("harr")).as("h")).count()
      }
      t(s"rep$rep eval_distinct") {
        Dedup.shingleHashArrays(docs.filter(col("source") === DecontamEvalSource),
          "doc_id", "text", DecontamK)
          .select(explode(col("harr")).as("h")).distinct().count()
      }
      t(s"rep$rep train_fold_only") {
        Dedup.shingleHashArrays(docs.filter(col("source") =!= DecontamEvalSource),
          "doc_id", "text", DecontamK)
          .select(expr("aggregate(harr, 0L, (a, x) -> a + x)").as("s"))
          .agg(sum(col("s"))).count()
      }
      t(s"rep$rep train_explode_persisted") {
        val h = Dedup.shingleHashArrays(
          docs.filter(col("source") =!= DecontamEvalSource),
          "doc_id", "text", DecontamK).persist()
        h.count()
        val n = h.select(col("doc_id"), explode(col("harr")).as("h")).count()
        h.unpersist()
        n
      }
      t(s"rep$rep full_q68") {
        q68Decontamination(spark, sfDir).count()
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
