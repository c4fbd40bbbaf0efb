package graft.jobs

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.analytics.ScreenMetrics
import graft.operators.Upsert
import graft.queries.{AnalyticsQueries, TextQueries}

/** The cron-A daily pipeline re-expressed as one DataFrame DAG
  * (SURVEY §3.1: target resolution → fetch → transform → sink →
  * derived-refresh chain, `scripts/cron/cron-a-direct.ts:115-147`).
  *
  * Each derived stage reads only tables written by earlier stages; every
  * write is an atomic snapshot publication ([[Upsert.publishSnapshot]]) so
  * a crash mid-chain never exposes a partial snapshot — the reference's
  * `_PUBLISHED`-marker discipline (refresh-technical.ts:181-196).
  * Re-running a stage with the same inputs overwrites the same version
  * directory: the job is idempotent end-to-end.
  *
  * The continue-on-error chain semantics of cron-a.yml are preserved:
  * each stage is attempted independently and failures are reported, not
  * cascaded.
  */
object DailyRefreshJob {

  final case class StageResult(name: String, rows: Long,
                               error: Option[String])

  /** Run the derived-analytics chain over a testdata snapshot dir,
    * publishing each stage under `outRoot/<stage>/v=<version>`. */
  def run(spark: SparkSession, sfDir: String, outRoot: String,
          version: String): Seq[StageResult] = {
    val stages: Seq[(String, () => DataFrame)] = Seq(
      "screen_metrics" -> (() => ScreenMetrics.run(spark, sfDir)),
      "technical_snapshot" -> (() =>
        graft.analytics.TechnicalJob.fromEvents(spark, sfDir)),
      "market_breadth" -> (() => AnalyticsQueries.q19Breadth(spark, sfDir)),
      "market_indicators" -> (() =>
        AnalyticsQueries.q38ColumnGroupMerge(spark, sfDir)),
      "factor_vectors" -> (() =>
        AnalyticsQueries.q25FactorVectors(spark, sfDir)),
      "neardup_pairs" -> (() => TextQueries.q15NearDupPairs(spark, sfDir)),
    )
    stages.map { case (name, mk) =>
      try {
        val df = mk()
        Upsert.publishSnapshot(df, s"$outRoot/$name", version)
        val published = Upsert.resolvePublished(s"$outRoot/$name").get
        StageResult(name, spark.read.parquet(published).count(), None)
      } catch {
        case e: Throwable => StageResult(name, -1, Some(e.getMessage))
      }
    }
  }
}
