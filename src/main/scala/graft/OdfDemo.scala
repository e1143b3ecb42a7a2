package graft

import java.nio.file.Files
import java.time.Instant

import org.apache.spark.sql.SparkSession

import graft.odf._

/** Runnable end-to-end demo of the ODF engine public API: wraps the driver
  * testdata `events` table as an ODF input slice, runs a multi-step SQL
  * transform with a JSON extension function, and prints the response and the
  * output ledger. `sbt "runMain graft.OdfDemo [sfDir]"` */
object OdfDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("graft-odf-demo")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val dir = Files.createTempDirectory("odf-demo")
    val engine = new Engine(spark)

    // The raw table lacks ODF system columns — use the raw-query (ingest
    // preprocessing) path to shape it into a ledger slice first.
    val ingested = dir.resolve("events-ledger.parquet").toString
    val tsExpr = graft.sources.Tables.eventTsSql(spark, s"$sfDir/events.parquet")
    val raw = engine.executeRawQuery(RawQueryRequest(
      inputDataPaths = Seq(s"$sfDir/events.parquet"),
      queries = Seq(SqlQueryStep.output(
        s"""SELECT CAST(ROW_NUMBER() OVER (ORDER BY event_id) - 1 AS BIGINT) AS offset,
          |       CAST(0 AS INT) AS op,
          |       CAST('2024-06-01T00:00:00Z' AS TIMESTAMP) AS system_time,
          |       $tsExpr AS event_time,
          |       event_id, user_id, event_type, value, props
          |FROM input""".stripMargin)),
      outputDataPath = ingested,
    ))
    println(s"[demo] raw query response: $raw")

    // Derive: filter + JSON extension + arithmetic over the slice.
    val out = dir.resolve("derived.parquet").toString
    val res = engine.executeTransform(TransformRequest(
      datasetId = "did:odf:demo", datasetAlias = "demo",
      systemTime = Instant.parse("2024-06-02T00:00:00Z"),
      vocab = DatasetVocabulary(),
      queries = Seq(
        SqlQueryStep.named("enriched",
          "SELECT event_time, event_id, event_type, value, json_get_int(props, 'k') AS k FROM events"),
        SqlQueryStep.output(
          "SELECT event_time, event_id, event_type, value * 2 AS value2, k FROM enriched WHERE k > 50"),
      ),
      queryInputs = Seq(TransformRequestInput(
        datasetId = "did:odf:events", datasetAlias = "events", queryAlias = "events",
        vocab = DatasetVocabulary(),
        offsetInterval = Some(OffsetInterval(0, 499)),
        dataPaths = Seq(ingested), schemaFile = ingested,
        explicitWatermarks = Seq(Watermark(Instant.now(), Instant.parse("2024-01-01T06:00:00Z"))),
      )),
      nextOffset = 1000,
      newDataPath = out,
    ))
    println(s"[demo] transform response: $res")
    val df = spark.read.parquet(out)
    df.show(5, truncate = false)
    println(s"[demo] output rows: ${df.count()}, schema: ${df.schema.simpleString}")

    // Invalid query surfaces as a structured error, not a crash:
    val bad = engine.executeTransform(TransformRequest(
      datasetId = "d", datasetAlias = "d", systemTime = Instant.now(),
      vocab = DatasetVocabulary(),
      queries = Seq(SqlQueryStep.output("SELECT nope FROM events")),
      queryInputs = Seq(TransformRequestInput(
        "d", "d", "events", DatasetVocabulary(), Some(OffsetInterval(0, 499)),
        Seq(ingested), ingested, Nil)),
      nextOffset = 0, newDataPath = dir.resolve("bad.parquet").toString))
    println(s"[demo] invalid query response: $bad")
    spark.stop()
  }
}
