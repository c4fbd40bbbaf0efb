package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Idempotent keyed upsert + atomic publication — the reference's two core
  * sink disciplines.
  *
  * - `batchUpsert` with `ON CONFLICT` (`src/lib/utils/batch.ts:81-141`):
  *   re-running the same day's ingest must be a no-op
  *   (`scripts/cron/cron-a-direct.ts:9`).
  * - Atomic snapshot publication via marker flip
  *   (`scripts/cron/refresh-technical.ts:181-196`,
  *   `00050_create_technical_metrics.sql:23,46`).
  *
  * Spark-first: upsert = anti-join keep + union (one shuffle on the key;
  * with date-partitioned tables prefer dynamic partition overwrite instead —
  * zero read of untouched partitions at 100 TB). Publication = write a
  * versioned directory then flip a tiny `_PUBLISHED` pointer file.
  */
object Upsert {

  /** New rows win on key collision; old non-colliding rows are kept.
    * Exactly `ON CONFLICT (keys) DO UPDATE`. */
  def keyed(existing: DataFrame, incoming: DataFrame,
            keys: Seq[String]): DataFrame = {
    val kept = existing.join(incoming.select(keys.map(col): _*).distinct(),
      keys, "left_anti")
    incoming.unionByName(kept.select(incoming.columns.map(col): _*))
  }

  /** Dedup incoming on the key first (last writer wins by `orderCol` desc),
    * then upsert — mirrors the reference's per-chunk upsert where later
    * corrections supersede (`cron-c.ts:29-60`). */
  def keyedLatest(existing: DataFrame, incoming: DataFrame,
                  keys: Seq[String], orderCol: String): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(orderCol).desc)
    val dedup = incoming.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
    keyed(existing, dedup, keys)
  }

  /** Staged write + pointer swap: write `<root>/v=<version>/`, then atomically
    * replace `<root>/_PUBLISHED` with the version string. Readers resolve the
    * pointer first; a crashed writer never exposes a partial snapshot. */
  def publishSnapshot(df: DataFrame, root: String, version: String): String = {
    val dir = s"$root/v=$version"
    df.write.mode(SaveMode.Overwrite).parquet(dir)
    val marker = new java.io.File(s"$root/_PUBLISHED")
    val tmp = new java.io.File(s"$root/_PUBLISHED.tmp")
    java.nio.file.Files.writeString(tmp.toPath, version)
    java.nio.file.Files.move(tmp.toPath, marker.toPath,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    dir
  }

  /** Delete superseded `v=*` snapshot directories under `root`, keeping
    * the one `_PUBLISHED` points at plus the `graceKeep` most recent
    * others (by directory mtime). Callers that publish on every
    * batch/date (the landing job's coverage manifest) invoke this after
    * the pointer flip, or version directories accumulate without bound
    * across scheduled runs; callers that WANT version history (the
    * refresh DAG's auditable snapshots) simply don't. `graceKeep > 0`
    * is the concurrent-reader grace window: a reader in another process
    * that resolved the PREVIOUS pointer just before the flip can finish
    * its scan of that version before a later prune reclaims it —
    * deleting the old version at the instant of the flip would fail
    * such a reader mid-read. mtime recency can TIE within the
    * filesystem's timestamp granularity when versions publish in quick
    * succession, so callers that know exactly which version was just
    * superseded pass its directory name via `spare` — name-pinned
    * survival beats recency heuristics. Returns the number of
    * directories removed. */
  def pruneSnapshots(root: String, graceKeep: Int = 0,
                     spare: Set[String] = Set.empty): Int =
    resolvePublished(root) match {
      case None => 0
      case Some(current) =>
        val keep = new java.io.File(current).getName
        val dirs = Option(new java.io.File(root).listFiles()).getOrElse(Array())
          .filter(f => f.isDirectory && f.getName.startsWith("v=") &&
            f.getName != keep && !spare.contains(f.getName))
          .sortBy(-_.lastModified())
          .drop(graceKeep)
        dirs.foreach(rmTree)
        dirs.length
    }

  /** Recursively delete a file tree — the one shared implementation
    * (scratch-dir and superseded-snapshot cleanup sites all route
    * here rather than growing drifting private copies). */
  private[graft] def rmTree(f: java.io.File): Unit = {
    Option(f.listFiles()).getOrElse(Array()).foreach(rmTree)
    f.delete()
  }

  /** Resolve the currently published snapshot directory, if any. */
  def resolvePublished(root: String): Option[String] = {
    val marker = new java.io.File(s"$root/_PUBLISHED")
    if (marker.exists())
      Some(s"$root/v=${java.nio.file.Files.readString(marker.toPath).trim}")
    else None
  }

  /** Freshness-guarded resolve (00117_precompute_bottomup_per_bands.sql:
    * the reader RPC errors when the precomputed table is older than the
    * staleness bound instead of silently serving stale data, so the caller
    * can fall back to the live computation). Age is the marker flip time —
    * the atomic publication instant. */
  def resolvePublishedFresh(root: String, maxAgeMillis: Long,
                            nowMillis: Long = System.currentTimeMillis())
      : Either[String, String] = {
    val marker = new java.io.File(s"$root/_PUBLISHED")
    if (!marker.exists()) Left(s"no _PUBLISHED marker under $root")
    else {
      val age = nowMillis - marker.lastModified()
      if (age > maxAgeMillis)
        Left(s"published snapshot is stale: age ${age}ms > ${maxAgeMillis}ms")
      else
        Right(s"$root/v=${java.nio.file.Files.readString(marker.toPath).trim}")
    }
  }
}
