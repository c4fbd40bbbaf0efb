package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-level profile of the CURRENT (round-6) q15 composition — times
  * each piece exactly as q15NearDupPairs wires it, to localize
  * regressions the end-to-end Time1 number can't attribute. */
object Probe15b {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PROBE15B $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    import graft.operators.Dedup
    val docs = graft.Tables.documents(spark, dir)
    val harrs = Dedup.shingleHashArrays(docs, "doc_id", "text", 5).persist()
    time("harrs")(println("  n=" + harrs.count()))
    val sig = Dedup.minhashSignaturesFromHashes(harrs, "doc_id", 16)
    val cand = time("cand(minhashCandidates)")(
      Dedup.minhashCandidates(sig, "doc_id", 4))
    println("  cand n=" + cand.count())
    val ver = Dedup.jaccardForCandidatesHashes(cand, harrs, "doc_id")
      .filter(col("jaccard") >= 0.3)
      .select(col("id1"), col("id2"), col("jaccard"))
    time("verify")(println("  n=" + ver.count()))
    val fin = ver.orderBy(col("id1"), col("id2"))
    time("orderBy+localCheckpoint")(fin.localCheckpoint().count())
    time("verify.explain") {
      println(ver.queryExecution.executedPlan.toString.take(4000))
    }
    spark.stop()
  }
}
