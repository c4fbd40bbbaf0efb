package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{Retention, Sinks, Sources}

class SourcesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("shift-jis era-date CSV decodes and parses to ISO dates") {
    val dir = Files.createTempDirectory("erascan").toFile
    val f = new java.io.File(dir, "jgb.csv")
    val content = "基準日,r10y\n令和6.3.15,0.73\n平成31.4.1,-0.05\n"
    Files.write(f.toPath, content.getBytes("Shift_JIS"))
    val schema = StructType(Seq(
      StructField("基準日", StringType), StructField("r10y", DoubleType)))
    val df = Sources.readEraCsv(spark, f.getAbsolutePath, "基準日", schema)
    val got = df.orderBy(desc("基準日")).collect()
      .map(r => (Option(r.getDate(0)).map(_.toString), r.getDouble(1)))
    assert(got.toSet == Set(
      (Some("2024-03-15"), 0.73), (Some("2019-04-01"), -0.05)))
  }

  test("quoted CSV preserves embedded commas and quotes") {
    val dir = Files.createTempDirectory("qcsv").toFile
    val f = new java.io.File(dir, "q.csv")
    Files.write(f.toPath,
      "name,note\n\"a, inc\",\"said \"\"hi\"\"\"\n".getBytes("UTF-8"))
    val schema = StructType(Seq(
      StructField("name", StringType), StructField("note", StringType)))
    val got = Sources.readQuotedCsv(spark, f.getAbsolutePath, schema).collect()
    assert(got(0).getString(0) == "a, inc")
    assert(got(0).getString(1) == "said \"hi\"")
  }

  test("retention split archives oldest days but keeps the floor") {
    import spark.implicits._
    def d(s: String) = java.sql.Date.valueOf(s)
    val df = (1 to 10).map(i => (d(f"2024-01-$i%02d"), i)).toDF("dt", "v")
    val (hot, old) = Retention.split(df, "dt", archiveDays = 3, keepDays = 5)
    assert(old.count() == 3 && hot.count() == 7)
    // keep floor binds: asking for 8 archive days with keep 5 archives 5
    val (hot2, old2) = Retention.split(df, "dt", archiveDays = 8, keepDays = 5)
    assert(old2.count() == 5 && hot2.count() == 5)
    // archive writes gzip csv and returns the hot remainder
    val ap = Files.createTempDirectory("arch").toFile.getAbsolutePath + "/a"
    val hot3 = Retention.archive(df, "dt", ap, 3, 5)
    assert(hot3.count() == 7)
    assert(new java.io.File(ap).exists())
  }

  test("dynamic partition overwrite replaces only the re-run days") {
    import spark.implicits._
    def d(s: String) = java.sql.Date.valueOf(s)
    val path = Files.createTempDirectory("dyn").toFile.getAbsolutePath + "/t"
    Sinks.overwriteDatePartitions(
      Seq((d("2024-01-01"), "a", 1), (d("2024-01-02"), "b", 1))
        .toDF("dt", "k", "run"), path, "dt")
    // re-run: day 2 corrected (two rows now), day 3 new; day 1 untouched
    Sinks.overwriteDatePartitions(
      Seq((d("2024-01-02"), "b", 2), (d("2024-01-02"), "b2", 2),
        (d("2024-01-03"), "c", 2)).toDF("dt", "k", "run"), path, "dt")
    val got = spark.read.parquet(path)
      .select(col("dt").cast("string"), col("k"), col("run"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
    assert(got == Set(
      ("2024-01-01", "a", 1),                               // preserved
      ("2024-01-02", "b", 2), ("2024-01-02", "b2", 2),      // replaced
      ("2024-01-03", "c", 2)))                              // added
  }
}
