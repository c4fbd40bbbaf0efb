package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite

import graft.jobs.DailyRefreshJob

class JobsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("daily refresh DAG publishes every stage atomically and is idempotent") {
    val root = Files.createTempDirectory("refresh").toFile.getAbsolutePath
    val r1 = DailyRefreshJob.run(spark, "/root/testdata/sf0.001", root, "v1")
    assert(r1.forall(_.error.isEmpty), r1.filter(_.error.isDefined).toString)
    assert(r1.forall(_.rows > 0))
    // pointer resolves to v1 for every stage
    r1.foreach { s =>
      assert(graft.operators.Upsert.resolvePublished(s"$root/${s.name}")
        .exists(_.endsWith("v=v1")))
    }
    // re-run as v2: same row counts (idempotent over the same inputs),
    // pointer flips, v1 snapshot still intact on disk
    val r2 = DailyRefreshJob.run(spark, "/root/testdata/sf0.001", root, "v2")
    assert(r2.map(s => s.name -> s.rows) == r1.map(s => s.name -> s.rows))
    r2.foreach { s =>
      assert(graft.operators.Upsert.resolvePublished(s"$root/${s.name}")
        .exists(_.endsWith("v=v2")))
      assert(new java.io.File(s"$root/${s.name}/v=v1").exists())
    }
  }

  test("freshness-guarded resolve refuses stale published snapshots") {
    import spark.implicits._
    val root = Files.createTempDirectory("fresh").toFile.getAbsolutePath
    graft.operators.Upsert.publishSnapshot(
      Seq(1, 2, 3).toDF("x"), root, "v1")
    val now = System.currentTimeMillis()
    // within the bound → resolves to the published dir
    assert(graft.operators.Upsert
      .resolvePublishedFresh(root, maxAgeMillis = 60000, nowMillis = now)
      .exists(_.endsWith("v=v1")))
    // beyond the bound → an explicit stale error, never a silent stale read
    val stale = graft.operators.Upsert
      .resolvePublishedFresh(root, maxAgeMillis = 0,
        nowMillis = now + 10000)
    assert(stale.isLeft && stale.swap.exists(_.contains("stale")))
    // missing marker → error
    assert(graft.operators.Upsert
      .resolvePublishedFresh(root + "_nope", 60000, now).isLeft)
  }

  test("coverage gate blocks under-covered snapshots") {
    import spark.implicits._
    val universe = (1 to 100).toDF("c_custkey")
    val thin = (1 to 50).toDF("c_custkey")
    val full = (1 to 90).toDF("c_custkey")
    assert(DailyRefreshJob.coverageGate(thin, universe, 0.8).isLeft)
    assert(DailyRefreshJob.coverageGate(full, universe, 0.8) == Right(90L))
    assert(DailyRefreshJob.coverageGate(full, full.limit(0), 0.8).isLeft)
  }
}
