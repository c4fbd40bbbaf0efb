package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.EraDate

/** File-format sources mirroring the reference's scan surface (SURVEY
  * §2.1): Shift-JIS CSV with era dates (MOF JGB, `mof/client.ts:45-95`),
  * quoted CSV (`yutai/kabu-csv-client.ts:22-147`), and JSON payload
  * parsing for landed scrape responses (`market/yahoo-chart-client.ts:93`).
  */
object Sources {

  /** Shift-JIS-encoded CSV with a Japanese-era date column → typed frame
    * with an ISO `DateType` column. Charset decode happens in the reader
    * (distributed); era parsing is the [[EraDate]] expression. */
  def readEraCsv(s: SparkSession, path: String, dateCol: String,
                 schema: StructType, encoding: String = "shift_jis"): DataFrame = {
    // Spark 4 whitelists only unicode/latin charsets unless the legacy
    // java-charset support is enabled
    s.conf.set("spark.sql.legacy.javaCharsets", "true")
    s.read
      .option("header", "true")
      .option("encoding", encoding)
      .schema(schema)
      .csv(path)
      .withColumn(dateCol, EraDate.parseEraDate(col(dateCol)))
  }

  /** Quoted CSV (embedded commas/quotes) with explicit schema. */
  def readQuotedCsv(s: SparkSession, path: String,
                    schema: StructType): DataFrame =
    s.read
      .option("header", "true")
      .option("quote", "\"")
      .option("escape", "\"")
      .schema(schema)
      .csv(path)

  /** Parse a JSON-string payload column against an explicit schema —
    * the landed-scrape pattern: payloads are landed as text and parsed
    * set-oriented with `from_json`, never row-by-row on the driver. */
  def parseJsonPayload(df: DataFrame, jsonCol: String,
                       schema: StructType): DataFrame =
    df.withColumn("__payload", from_json(col(jsonCol), schema))

  /** HTML/JS-scrape payload parse (parseYahooChart
    * `yahoo-chart-client.ts:93`, parseNikkei225jpDaily
    * `nikkei225jp-client.ts:144-272`): landed HTML pages carry the data as
    * an embedded JS object — extract it with one regexp group and parse
    * with `from_json`, all set-oriented expressions (no driver-side HTML
    * walking). A page without the marker parses to null. */
  def parseEmbeddedJson(df: DataFrame, htmlCol: String, pattern: String,
                        schema: StructType): DataFrame =
    df.withColumn("__payload",
      from_json(regexp_extract(col(htmlCol), pattern, 1), schema))
}

/** Date-partitioned table sinks for the daily-refresh write path. */
object Sinks {

  /** Idempotent daily re-run sink: write `df` parquet-partitioned by
    * `dateCol` with DYNAMIC partition overwrite — only the date partitions
    * present in `df` are replaced; every other partition is untouched.
    * This is the 100 TB shape of the reference's late/corrected-data
    * re-pull (`catch-up.ts`, forward-fill re-runs): a re-run for 3
    * corrected days rewrites 3 partitions, not the table, and a crashed
    * run can simply be repeated. Partition pruning on `dateCol` comes for
    * free on every downstream read. */
  def overwriteDatePartitions(df: DataFrame, path: String,
                              dateCol: String): Unit =
    df.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(dateCol)
      .parquet(path)
}

/** Partition-retention archival sink (`archive-equity-bars.ts:22-39`):
  * when the hot table exceeds its budget, the oldest date partitions are
  * exported to a compressed archive path and dropped from the hot table,
  * keeping at least `keepDays` days hot.
  */
object Retention {

  /** Split a date-keyed frame into (kept, archived) by retention policy:
    * archive the oldest `archiveDays` distinct dates but always keep at
    * least `keepDays` of the newest. Returns (hot, archive). */
  def split(df: DataFrame, dateCol: String, archiveDays: Int,
            keepDays: Int): (DataFrame, DataFrame) = {
    // driver-side collect is deliberate and bounded: distinct DATES, i.e.
    // the trading calendar (thousands of rows at any fact-table scale) —
    // metadata, not data (PLANS.md rule 6)
    val dates = df.select(col(dateCol)).distinct()
      .orderBy(col(dateCol)).collect().map(_.get(0))
    val nArchivable = math.max(0, math.min(archiveDays, dates.length - keepDays))
    if (nArchivable == 0) (df, df.limit(0))
    else {
      val cutoff = dates(nArchivable - 1)
      (df.filter(col(dateCol) > lit(cutoff)),
        df.filter(col(dateCol) <= lit(cutoff)))
    }
  }

  /** Write the archive slice as gzip CSV partitioned by date and return
    * the hot remainder (caller persists it back). */
  def archive(df: DataFrame, dateCol: String, archivePath: String,
              archiveDays: Int, keepDays: Int): DataFrame = {
    val (hot, old) = split(df, dateCol, archiveDays, keepDays)
    old.write.mode("append")
      .option("compression", "gzip")
      .partitionBy(dateCol)
      .csv(archivePath)
    hot
  }
}
