package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.queries.ExactSubstr
import graft.streaming.StreamExactSubstr

/** Pins for the PERSISTED gram-keeper state (q216 —
  * [[StreamExactSubstr.PersistedAbsorber]]):
  *
  *  1. RESTARTABILITY — for every stop point k ∈ {1, 2, 3}: absorb k
  *     doc_id-ordered batches, DISCARD the absorber, build a fresh one
  *     on the same storage, absorb the rest. Accumulated emissions must
  *     equal the batch q211 rebuild row for row — nothing may live only
  *     in memory.
  *  2. LAYOUT — the standing state is a bucketed table on `gram` (16
  *     buckets), so every absorb join reads it pre-clustered (the q53
  *     zero-Exchange discipline).
  */
class RestartExactSubstrSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private def normDocsDf = {
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        graft.functions.Text.normalize(col("text")).as("text"))
  }

  private lazy val batchRows =
    ExactSubstr.q211ExactSubstrDedup(spark, dir).collect().toSeq

  private def runWithRestart(stopAfter: Int): Seq[org.apache.spark.sql.Row] = {
    import spark.implicits._
    val docs = normDocsDf.orderBy(col("doc_id"))
      .as[StreamExactSubstr.SDoc].collect()
    val tmp = java.nio.file.Files.createTempDirectory("graft_q216_spec")
    val table = s"graft_q216_spec_state"
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val saved = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try {
      val batches = docs.grouped(math.max(1, docs.length / 4)).toVector
      // phase 1: k batches through absorber A, then A is garbage
      val a = new StreamExactSubstr.PersistedAbsorber(table, tmp.toString)
      batches.take(stopAfter).foreach(b => a.absorb(b.toSeq.toDS()))
      // phase 2: a FRESH absorber against the same storage
      val b = new StreamExactSubstr.PersistedAbsorber(table, tmp.toString)
      batches.drop(stopAfter).foreach(bb => b.absorb(bb.toSeq.toDS()))
      // layout pin: the standing state is bucketed on gram
      val desc = spark.sql(s"DESCRIBE FORMATTED $table").collect()
        .map(r => s"${r.getString(0)}|${r.getString(1)}").mkString("\n")
      assert(desc.contains("Num Buckets") && desc.contains("16"),
        "state table is not bucketed")
      assert(desc.contains("Bucket Columns") && desc.contains("gram"),
        "state table is not bucketed on gram")
      val out = b.results(spark).orderBy(col("doc_id"))
        .localCheckpoint().collect().toSeq
      spark.sql(s"DROP TABLE IF EXISTS $table")
      out
    } finally {
      spark.conf.set("spark.sql.shuffle.partitions", saved)
      def rm(f: java.io.File): Unit = {
        val ch = f.listFiles(); if (ch != null) ch.foreach(rm); f.delete()
      }
      rm(tmp.toFile)
    }
  }

  test("stop/rebuild/continue equals the batch rebuild at every stop point") {
    (1 to 3).foreach { k =>
      assert(runWithRestart(k) == batchRows,
        s"restart after batch $k diverged from the batch q211 rebuild")
    }
  }
}
