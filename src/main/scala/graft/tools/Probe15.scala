package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-level profile of the q15 LSH pipeline. */
object Probe15 {
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
      println(f"PROBE15 $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val docs = graft.Tables.documents(spark, dir)
    val arrs = graft.operators.Dedup.shingleHashArrays(docs, "doc_id", "text", 5).persist()
    time("arrs")(println("  n=" + arrs.count()))
    val sig = graft.operators.Dedup.minhashSignaturesFromHashes(arrs, "doc_id", 16)
    time("sig")(println("  n=" + sig.count()))
    val bandStructs = (0 until 4).map { b =>
      struct(lit(b).as("band"),
        concat_ws(":", (0 until 4).map(p => col(s"mh${b * 4 + p}")): _*).as("bkey"))
    }
    val banded = sig.select(col("doc_id"), explode(array(bandStructs: _*)).as("bb"))
      .select(col("doc_id"), col("bb.band"), col("bb.bkey")).persist()
    time("banded")(println("  n=" + banded.count()))
    println("  buckets: " + banded.groupBy("band", "bkey").count()
      .agg(max("count"), avg("count"), count(lit(1))).collect().mkString)
    val cand = banded.select(col("band"), col("bkey"), col("doc_id").as("id1"))
      .join(banded.select(col("band"), col("bkey"), col("doc_id").as("id2")),
        Seq("band", "bkey"))
      .filter(col("id1") < col("id2")).select("id1", "id2").distinct().persist()
    time("cand")(println("  n=" + cand.count()))
    val ver = graft.operators.Dedup.jaccardForCandidatesHashes(cand, arrs, "doc_id")
      .filter(col("jaccard") >= 0.3)
    time("verify")(println("  n=" + ver.count()))
    time("verify2")(println("  n=" + ver.count()))
    spark.stop()
  }
}
