package graft.odf

import java.nio.file.{Files, Path}
import java.sql.Timestamp
import java.time.Instant

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Port of the reference's upstream-pinned regression tests
  * (/root/reference/tests/tests/test_regressions.rs) — behaviors our engine
  * must also guard:
  *   - UNION ALL result writes and reads back intact (datafusion#6463);
  *   - TIMESTAMP_MILLIS parquet reads as a UTC instant (arrow#4308);
  *   - schema-file + offset-slice transform over an input whose new-data
  *     slice is empty (datafusion#14281).
  */
class RegressionsSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-odf-regressions")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  lazy val engine = new Engine(spark)

  override def afterAll(): Unit = spark.stop()

  def ts(s: String): Timestamp = Timestamp.from(Instant.parse(s))
  def tempDir(): Path = Files.createTempDirectory("graft-regressions")

  val ledgerSchema: StructType = StructType(Seq(
    StructField("offset", LongType, nullable = false),
    StructField("op", IntegerType, nullable = false),
    StructField("system_time", TimestampType, nullable = false),
    StructField("event_time", TimestampType, nullable = false),
    StructField("city", StringType, nullable = false),
    StructField("population", LongType, nullable = false),
  ))

  def writeLedger(rows: Seq[Row], path: Path): Unit = {
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), ledgerSchema)
    ParquetSink.writeSingleFile(df, path.toString)
    ()
  }

  test("UNION ALL result writes and reads back intact (datafusion#6463 analog)") {
    val dir = tempDir()
    val st = ts("2023-02-01T00:00:00Z")
    val et = ts("2023-01-01T00:00:00Z")
    writeLedger(Seq(Row(0L, 0, st, et, "vancouver", 675000L)), dir.resolve("in.parquet"))
    val res = engine.executeTransform(TransformRequest(
      datasetId = "d", datasetAlias = "d",
      systemTime = Instant.parse("2023-03-01T00:00:00Z"),
      vocab = DatasetVocabulary(),
      queries = Seq(SqlQueryStep.output(
        """SELECT event_time, city, population FROM foo
          |UNION ALL
          |SELECT event_time, city, population + 1 AS population FROM foo""".stripMargin)),
      queryInputs = Seq(TransformRequestInput(
        "d", "foo", "foo", DatasetVocabulary(),
        Some(OffsetInterval(0, 0)), Seq(dir.resolve("in.parquet").toString),
        dir.resolve("in.parquet").toString, Nil)),
      nextOffset = 0,
      newDataPath = dir.resolve("out.parquet").toString))
    assert(res == Right(TransformResponseSuccess(Some(OffsetInterval(0, 1)), None)))
    val back = spark.read.parquet(dir.resolve("out.parquet").toString)
      .orderBy("offset").collect()
    assert(back.map(_.getLong(5)).toSeq == Seq(675000L, 675001L))
  }

  test("TIMESTAMP_MILLIS parquet reads back as the same UTC instant (arrow#4308 analog)") {
    val dir = tempDir()
    val st = ts("2023-02-01T12:34:56.789Z")
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(0L, st)), 1),
      StructType(Seq(
        StructField("offset", LongType, nullable = false),
        StructField("t", TimestampType, nullable = false))))
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MILLIS")
    ParquetSink.writeSingleFile(
      s2.createDataFrame(df.rdd, df.schema), dir.resolve("ms.parquet").toString)
    val back = spark.read.parquet(dir.resolve("ms.parquet").toString).collect()(0)
    assert(back.getTimestamp(1).toInstant == Instant.parse("2023-02-01T12:34:56.789Z"))
  }

  // --- The reference's ACTUAL fixture files (read-only at
  // /root/reference/data, checked in for test_regressions.rs) driven
  // through this engine — stronger than the self-built analogs above,
  // because the bytes are the exact ones that triggered the upstream bugs.

  val refData = "/root/reference/data"

  test("datafusion#6463 reference fixture: alberta ∪ british-columbia round-trips (id types differ)") {
    // The BC file's `id` is INT32 where Alberta's is INT64 — the union
    // must coerce, write as one file, and read back all 20 rows
    // (test_regressions.rs:12-76).
    assume(Files.exists(java.nio.file.Paths.get(s"$refData/datafusion-issue-6463/alberta.parquet")))
    val dir = tempDir()
    spark.read.parquet(s"$refData/datafusion-issue-6463/alberta.parquet")
      .createOrReplaceTempView("ab")
    spark.read.parquet(s"$refData/datafusion-issue-6463/british-columbia.parquet")
      .createOrReplaceTempView("bc")
    val df = spark.sql(
      """SELECT * FROM (
        |  SELECT 'AB' AS province, id, reported_date, gender, location FROM ab
        |  UNION ALL
        |  SELECT 'BC' AS province, id, reported_date, gender, location FROM bc
        |)""".stripMargin)
    ParquetSink.writeSingleFile(df, dir.resolve("out.parquet").toString)
    val back = spark.read.parquet(dir.resolve("out.parquet").toString)
    assert(back.count() == 20)
    assert(back.groupBy("province").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap == Map("AB" -> 10L, "BC" -> 10L))
  }

  test("arrow#4308 reference fixture: system_time reads as a UTC timestamp") {
    // test_regressions.rs:81-105 asserts Timestamp(Millisecond, UTC); in
    // Spark (UTC session) the same file must surface TimestampType and a
    // stable instant.
    assume(Files.exists(java.nio.file.Paths.get(s"$refData/arrow-issue-4308/data.parquet")))
    val df = spark.read.parquet(s"$refData/arrow-issue-4308/data.parquet")
    assert(df.schema("system_time").dataType == TimestampType)
    assert(df.count() == 10)
    assert(df.select("system_time").distinct().count() >= 1) // values materialize
  }

  test("datafusion#14281 reference fixture: full transform over the original data+schema files") {
    // The exact request shape of test_regressions.rs:110-183: 3-row ledger,
    // offset interval 0-2, op pass-through, population×10 cast to INT.
    assume(Files.exists(java.nio.file.Paths.get(s"$refData/datafusion-issue-14281/data.parquet")))
    val dir = tempDir()
    val res = engine.executeTransform(TransformRequest(
      datasetId = "d", datasetAlias = "deriv",
      systemTime = Instant.parse("2050-01-02T12:00:00Z"),
      vocab = DatasetVocabulary(),
      queries = Seq(SqlQueryStep.output(
        """SELECT op, event_time, city, cast(population * 10 as int) as population_x10
          |FROM root""".stripMargin)),
      queryInputs = Seq(TransformRequestInput(
        "f", "root", "root", DatasetVocabulary(),
        Some(OffsetInterval(0, 2)),
        Seq(s"$refData/datafusion-issue-14281/data.parquet"),
        s"$refData/datafusion-issue-14281/schema.parquet",
        Seq(Watermark(
          Instant.parse("2050-01-01T12:00:00Z"), Instant.parse("2050-01-01T12:00:00Z"))))),
      nextOffset = 0,
      newDataPath = dir.resolve("out.parquet").toString))
    assert(res == Right(TransformResponseSuccess(
      Some(OffsetInterval(0, 2)), Some(Instant.parse("2050-01-01T12:00:00Z")))))
    val back = spark.read.parquet(dir.resolve("out.parquet").toString).orderBy("offset").collect()
    assert(back.length == 3)
    assert(back.map(_.getAs[Int]("population_x10")).forall(_ % 10 == 0))
  }

  test("schema-file + empty offset slice transform (datafusion#14281 analog)") {
    val dir = tempDir()
    val st = ts("2023-02-01T00:00:00Z")
    val et = ts("2023-01-01T00:00:00Z")
    // data exists on disk, but the request says "no new data" — the schema
    // file shapes an empty typed table and the transform yields 0 rows
    writeLedger(Seq(Row(0L, 0, st, et, "vancouver", 675000L)), dir.resolve("in.parquet"))
    val res = engine.executeTransform(TransformRequest(
      datasetId = "d", datasetAlias = "d",
      systemTime = Instant.parse("2023-03-01T00:00:00Z"),
      vocab = DatasetVocabulary(),
      queries = Seq(SqlQueryStep.output(
        "SELECT event_time, city, population * 2 AS population FROM foo")),
      queryInputs = Seq(TransformRequestInput(
        "d", "foo", "foo", DatasetVocabulary(),
        offsetInterval = None, dataPaths = Nil,
        schemaFile = dir.resolve("in.parquet").toString, explicitWatermarks = Nil)),
      nextOffset = 42,
      newDataPath = dir.resolve("out.parquet").toString))
    assert(res == Right(TransformResponseSuccess(None, None)))
    val back = spark.read.parquet(dir.resolve("out.parquet").toString)
    assert(back.count() == 0)
    // schema preserved even with zero rows
    assert(back.schema.fieldNames.toSeq ==
      Seq("offset", "op", "system_time", "event_time", "city", "population"))
  }
}
