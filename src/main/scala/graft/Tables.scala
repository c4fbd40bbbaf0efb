package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver testdata tables (TESTDATA.md).
  *
  * Mirrors the reference's fixed-schema discipline
  * (`src/lib/jquants/endpoints/equity-bars-daily.ts:48-117`: explicit
  * field-by-field mapping, no inference) — here the parquet footer already
  * carries the authoritative schema, so loaders are thin; every query casts
  * explicitly at the use site for oracle (DuckDB) parity.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def path(dir: String, name: String): String = s"$dir/$name.parquet"

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(path(dir, name))

  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  /** `events.ts` has shipped in two parquet layouts across driver testdata
    * generations: TIMESTAMP(NANOS) (which Spark 4 refuses to read natively —
    * read as a nanosecond long via `spark.sql.legacy.parquet.nanosAsLong`
    * and truncate to microseconds, matching DuckDB's ns→µs truncation) and
    * plain TIMESTAMP(MICROS) without UTC adjustment (which Spark reads as
    * TIMESTAMP_NTZ). Normalize both to session-zone TIMESTAMP so every
    * consumer sees one dtype; sessions run with `session.timeZone=UTC`, so
    * the NTZ→LTZ cast is wall-clock identity and the oracle (DuckDB reads
    * naive µs) sees identical instants either way. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = load(s, d, "events")
    import org.apache.spark.sql.functions.{col, expr}
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", expr("timestamp_micros(ts DIV 1000)"))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast("timestamp"))
      case _ => raw
    }
  }
  /** documents/embeddings arrive as a single parquet file — one input
    * partition — while their consumers (shingling, hashing, vector math)
    * are compute-heavy per row. Spread them across the cluster up front;
    * the shuffle is tiny relative to the per-row work it parallelizes. */
  def documents(s: SparkSession, d: String): DataFrame =
    load(s, d, "documents").repartition(s.sparkContext.defaultParallelism)
  def embeddings(s: SparkSession, d: String): DataFrame =
    load(s, d, "embeddings").repartition(s.sparkContext.defaultParallelism)
}
