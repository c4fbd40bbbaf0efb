package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Materialize, Sampling}
import graft.queries.{Curation, TextQueries}
import graft.{Tables, functions => gf}

/** Stage-level profile of the q76 training-manifest capstone: times each
  * component in isolation against the shared carrier, then the composed
  * query, to attribute the composed-vs-stage-sum gap. */
object Probe76 {
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
      println(f"PROBE76 $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    def clear(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
    }
    val docs = Tables.documents(spark, dir)
    time("warm-docs")(docs.count())
    // carrier projection alone
    val carrier = docs.select(col("doc_id"), col("lang"), col("source"),
      graft.functions.Text.normalize(col("text")).as("__norm"),
      graft.functions.Text.langId(col("text")).as("pred_lang"),
      graft.functions.Text.qualityScore(col("text")).as("quality"),
      graft.functions.Text.tokenCount(col("text")).cast("long").as("n_tokens"))
    // which carrier expression dominates?
    time("c-norm")(docs.select(graft.functions.Text.normalize(col("text")).as("x"))
      .agg(sum(length(col("x")))).collect())
    time("c-lang")(docs.select(graft.functions.Text.langId(col("text")).as("x"))
      .agg(count(col("x"))).collect())
    time("c-qual")(docs.select(graft.functions.Text.qualityScore(col("text")).as("x"))
      .agg(sum(col("x"))).collect())
    time("c-tok")(docs.select(graft.functions.Text.tokenCount(col("text")).as("x"))
      .agg(sum(col("x"))).collect())
    val mat = carrier.persist()
    time("carrier-materialize")(mat.count())
    def harr(k: Int) = mat
      .filter(length(col("__norm")) >= k)
      .select(col("doc_id"), Dedup.shingleHashCol("__norm", k).as("harr"))
    // k=5 shingle hash pass alone (no LSH downstream)
    time("harr5-pass")(harr(5).select(sum(size(col("harr")))).collect())
    // k=16 pass alone
    time("harr16-pass")(harr(16).select(sum(size(col("harr")))).collect())
    // LSH pipeline (signatures + banding + candidates + verify), twice to
    // split one-time codegen from steady cost
    def lsh() = Materialize.withMaterialized(harr(TextQueries.ShingleK)) { h =>
      val sig = Dedup.minhashSignaturesFromHashes(h, "doc_id", TextQueries.NumHashes)
      val cand = Dedup.minhashCandidates(sig, "doc_id", TextQueries.RowsPerBand)
      val p = Dedup.jaccardForCandidatesHashes(cand, h, "doc_id")
        .filter(col("jaccard") >= TextQueries.JaccardThreshold)
        .select(col("id1"), col("id2"))
        .localCheckpoint()
      p.count()
      p
    }
    time("lsh-pairs-rep1")(lsh())
    val pairs = time("lsh-pairs-rep2")(lsh())
    // sub-stages of lsh from a pre-materialized harr
    val hmat = harr(TextQueries.ShingleK).persist()
    time("harr5-materialize")(hmat.count())
    val sigd = Dedup.minhashSignaturesFromHashes(hmat, "doc_id", TextQueries.NumHashes)
    time("sig-from-harr")(sigd.count())
    val candd = Dedup.minhashCandidates(sigd, "doc_id", TextQueries.RowsPerBand)
    time("cand-from-harr")(candd.count())
    time("verify-from-harr")(
      Dedup.jaccardForCandidatesHashes(candd, hmat, "doc_id")
        .filter(col("jaccard") >= TextQueries.JaccardThreshold).count())
    hmat.unpersist(true)
    // cleaning gates from the carrier
    time("clean") {
      val withToks = mat.select(col("doc_id"), col("pred_lang"),
        col("quality"), split(col("__norm"), " ").as("t"))
      Curation.cleanGated(Curation.cleanFeatures(withToks),
        Curation.repetitionSignalsFromTokens(withToks.select(col("doc_id"), col("t"))))
        .filter(col("keep")).count()
    }
    time("cc")(Dedup.connectedComponents(pairs).count())
    time("contam") {
      Dedup.ngramContaminationFromHashes(
        harr(Curation.DecontamK).join(
          mat.filter(col("source") =!= Curation.DecontamEvalSource)
            .select("doc_id"), Seq("doc_id")),
        harr(Curation.DecontamK).join(
          mat.filter(col("source") === Curation.DecontamEvalSource)
            .select("doc_id"), Seq("doc_id")),
        "doc_id").count()
    }
    clear()
    // composed query, twice (rep1 cold / rep2 steady)
    time("q76-composed-rep1")(Curation.q76TrainingManifest(spark, dir).count())
    clear()
    time("q76-composed-rep2")(Curation.q76TrainingManifest(spark, dir).count())
    spark.stop()
  }
}
