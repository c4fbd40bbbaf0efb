package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** VERDICT r17 #6 stage probes: decompose the untouched 5–10 s tier
  * (q112 lev pairs, q61 neardup clusters, q123 all-pairs join) into
  * their pipeline stages so the "job-count vs compute" question is
  * answered with numbers, not argument.
  * `runMain graft.tools.Probe6 [sfDir] [reps]` (quiet box, CPUS=32). */
object Probe6 {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
        "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()
    (1 to reps).foreach { rep =>
      var t0 = System.nanoTime()
      def lap(tag: String): Unit = {
        System.err.println(
          f"P6 rep$rep $tag ${(System.nanoTime() - t0) / 1e9}%6.2f s")
        t0 = System.nanoTime()
      }
      // ---- q112 substructure (shares q14's candidate pipeline)
      import graft.queries.TextQueries
      import graft.operators.{Dedup, Materialize, PrefixJoin}
      import graft.Tables
      import graft.functions.Text
      val K = TextQueries.ShingleK
      val carrier = Tables.documents(spark, sfDir)
        .select(col("doc_id"), Text.normalize(col("text")).as("__norm"))
        .filter(length(col("__norm")) >= K)
        .select(col("doc_id"),
          Dedup.shingleHashCol("__norm", K).as("harr"),
          substring(col("__norm"), 1, TextQueries.LevPrefix).as("p"))
      Materialize.withMaterialized(carrier) { carr =>
        lap("q112.carrier-materialize")
        val sig = Dedup.minhashSignaturesFromHashes(
          carr.select(col("doc_id"), col("harr")), "doc_id",
          TextQueries.NumHashes)
        sig.write.format("noop").mode("overwrite").save()
        lap("q112.signatures-noop")
        val cand = Dedup.minhashCandidates(sig, "doc_id",
          TextQueries.RowsPerBand)
        cand.write.format("noop").mode("overwrite").save()
        lap("q112.candidates-noop (recomputes signatures)")
        val pfx = carr.select(col("doc_id"), col("p"))
        val lev = cand
          .join(pfx.select(col("doc_id").as("id1"), col("p").as("p1"))
            .hint("shuffle_hash"), Seq("id1"))
          .join(pfx.select(col("doc_id").as("id2"), col("p").as("p2"))
            .hint("shuffle_hash"), Seq("id2"))
          .select(col("id1"), col("id2"),
            levenshtein(col("p1"), col("p2"), TextQueries.LevMaxDist)
              .cast("long").as("lev"))
          .filter(col("lev") >= 0)
        lev.write.format("noop").mode("overwrite").save()
        lap("q112.tail-joins+lev-noop (recomputes cand)")
        lev.orderBy(col("id1"), col("id2")).localCheckpoint()
        lap("q112.tail+sort+ckpt (recomputes tail)")
        lev.localCheckpoint().orderBy(col("id1"), col("id2"))
          .localCheckpoint()
        lap("q112.tail+CKPT-THEN-sort (sampling reads the ckpt)")
      }
      lap("q112.scope-close")
      val full112 = graft.SparkEntry
        .queries("q112_lev_pairs")(spark, sfDir).count()
      lap(s"q112.full ($full112 rows)")
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
      // ---- q61 = q15 pairs + connected components
      val pairs = TextQueries.q15NearDupPairs(spark, sfDir)
      lap("q61.q15-pairs (checkpointed by the gate)")
      val cc = Dedup.connectedComponents(
        pairs.select(col("id1"), col("id2")))
      cc.write.format("noop").mode("overwrite").save()
      lap("q61.connected-components")
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
      // ---- q123 all-pairs jaccard
      val full123 = graft.SparkEntry
        .queries("q123_allpairs_join")(spark, sfDir).count()
      lap(s"q123.full ($full123 rows)")
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
