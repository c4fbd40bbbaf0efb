package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Build an SF1-EQUIVALENT test directory from sf0.1 so the scale-ratio
  * probe can MEASURE a 100× point (vs sf0.01) instead of extrapolating
  * from the 10× two-point fit:
  *
  *   runMain graft.tools.Probe100 [srcDir] [outDir]    # build (once)
  *   SPARK_GRAFT_SF_DIR=<outDir> SPARK_GRAFT_BENCH_ONLY=q15...,q76... \
  *     runMain graft.Bench                              # measure
  *
  * Synthesis contract — the blow-up must be ORGANIC, not degenerate:
  *  - `documents`: 10 copies, doc_id shifted by 10M per copy, text
  *    passed through a PER-COPY Caesar cipher (letters AND digits
  *    rotated by k; whitespace/punctuation fixed). The cipher rewrites
  *    essentially every CHARACTER k-gram — the dedup pipeline shingles
  *    characters (Dedup.shingleHashCol), so this is the transform that
  *    actually makes cross-copy texts non-similar — while preserving
  *    document lengths, word boundaries and the within-copy duplicate
  *    structure exactly. Result: 10 disjoint sf0.1-shaped corpora —
  *    dup rate, cluster structure and per-doc cost match sf0.1, pair
  *    volume scales ~10×. (First attempt suffixed each TOKEN with a
  *    copy tag; char k-grams interior to words survived, leaving
  *    cross-copy jaccard high enough to flood the LSH candidate stage
  *    with pairs no organic crawl would have — measured q15 34× over
  *    sf0.1 on that corpus. A lesson the probe exists to teach.)
  *  - `lineitem`: 10 copies with l_orderkey shifted by 100M (orders are
  *    the fact grain); supplier/part keys unchanged — dims stay
  *    dim-sized, per-key fan-in grows 10×, which is the conservative
  *    (skew-stressing) direction for the basket program.
  *  - every other table: byte-for-byte copy of the sf0.1 file.
  */
object Probe100 {
  def main(args: Array[String]): Unit = {
    val src = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val out = if (args.length > 1) args(1) else "/tmp/graft_sf1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val lower = "abcdefghijklmnopqrstuvwxyz"
    val digits = "0123456789"
    def rot(s: String, k: Int): String = s.drop(k % s.length) + s.take(k % s.length)
    val docs = spark.read.parquet(s"$src/documents.parquet")
    (0 until 10).map { k =>
      val from = lower + lower.toUpperCase + digits
      val to = rot(lower, k) + rot(lower, k).toUpperCase + rot(digits, k)
      docs.select(
        (col("doc_id") + lit(k * 10000000L)).as("doc_id"),
        translate(col("text"), from, to).as("text"),
        col("lang"), col("source"))
    }.reduce(_ unionAll _)
      .withColumn("n_chars", length(col("text")).cast("long"))
      .select("doc_id", "text", "lang", "source", "n_chars")
      .repartition(16)
      .write.mode("overwrite").parquet(s"$out/documents.parquet")

    val li = spark.read.parquet(s"$src/lineitem.parquet")
    (0 until 10).map { k =>
      li.withColumn("l_orderkey", col("l_orderkey") + lit(k * 100000000L))
    }.reduce(_ unionAll _)
      .repartition(16)
      .write.mode("overwrite").parquet(s"$out/lineitem.parquet")

    import java.nio.file.{Files, Paths, StandardCopyOption}
    for (t <- graft.Tables.names if t != "documents" && t != "lineitem")
      Files.copy(Paths.get(s"$src/$t.parquet"), Paths.get(s"$out/$t.parquet"),
        StandardCopyOption.REPLACE_EXISTING)

    println(s"PROBE100 built $out: documents x10 (token-suffixed), " +
      s"lineitem x10 (order-shifted), rest copied from $src")
    spark.stop()
  }
}
