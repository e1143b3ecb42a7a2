package graft.odf.server

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.odf._

/** Drives the HTTP transport end-to-end: raw-query ingest then a transform,
  * both over the wire, plus structured error mapping. */
class OdfHttpServerSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-odf-server-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  lazy val server: OdfHttpServer = {
    val s = new OdfHttpServer(new Engine(spark), port = 0)
    s.start()
    s
  }
  lazy val client: HttpClient = HttpClient.newHttpClient()

  override def afterAll(): Unit = { server.stop(); spark.stop() }

  def post(path: String, body: String): HttpResponse[String] = {
    val req = HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:${server.boundPort}$path"))
      .header("Content-Type", "application/json")
      .POST(HttpRequest.BodyPublishers.ofString(body)).build()
    client.send(req, HttpResponse.BodyHandlers.ofString())
  }

  test("raw query + transform round-trip over HTTP") {
    val dir = Files.createTempDirectory("odf-http")
    // seed input via the engine's own sink
    val seed = spark.sql(
      """SELECT CAST(id AS BIGINT) AS offset, CAST(0 AS INT) AS op,
        |       CAST('2024-01-01T00:00:00Z' AS TIMESTAMP) AS system_time,
        |       CAST('2024-01-01T00:00:00Z' AS TIMESTAMP) AS event_time,
        |       CAST(id * 10 AS BIGINT) AS v
        |FROM range(3)""".stripMargin)
    ParquetSink.writeSingleFile(seed, dir.resolve("in.parquet").toString)

    val raw = post("/execute-raw-query",
      s"""{"inputDataPaths": ["${dir.resolve("in.parquet")}"],
         |"queries": [{"alias": null, "query": "SELECT v * 2 AS v2 FROM input"}],
         |"outputDataPath": "${dir.resolve("raw-out.parquet")}"}""".stripMargin)
    assert(raw.statusCode == 200, raw.body)
    assert(raw.body.contains("\"numRecords\":3"), raw.body)

    val transform = post("/execute-transform",
      s"""{"datasetId": "did:odf:t", "datasetAlias": "t",
         |"systemTime": "2024-06-01T00:00:00Z",
         |"vocab": {"offsetColumn": "offset", "operationTypeColumn": "op",
         |          "systemTimeColumn": "system_time", "eventTimeColumn": "event_time"},
         |"queries": [{"alias": null, "query": "SELECT event_time, v + 1 AS v FROM src"}],
         |"queryInputs": [{"datasetId": "did:odf:src", "datasetAlias": "src",
         |  "queryAlias": "src",
         |  "vocab": {"offsetColumn": "offset", "operationTypeColumn": "op",
         |            "systemTimeColumn": "system_time", "eventTimeColumn": "event_time"},
         |  "offsetInterval": {"start": 0, "end": 2},
         |  "dataPaths": ["${dir.resolve("in.parquet")}"],
         |  "schemaFile": "${dir.resolve("in.parquet")}",
         |  "explicitWatermarks": []}],
         |"nextOffset": 0,
         |"newDataPath": "${dir.resolve("out.parquet")}"}""".stripMargin)
    assert(transform.statusCode == 200, transform.body)
    assert(transform.body.contains("\"newOffsetInterval\":{\"start\":0,\"end\":2}"), transform.body)
    val out = spark.read.parquet(dir.resolve("out.parquet").toString).orderBy("offset").collect()
    assert(out.map(_.getLong(4)).toSeq == Seq(1L, 11L, 21L))
  }

  test("invalid query surfaces as a structured error over the wire") {
    val dir = Files.createTempDirectory("odf-http-err")
    val res = post("/execute-raw-query",
      s"""{"inputDataPaths": [],
         |"queries": [{"alias": null, "query": "SELECT nope FROM nothing"}],
         |"outputDataPath": "${dir.resolve("x.parquet")}"}""".stripMargin)
    assert(res.statusCode == 400, res.body)
    assert(res.body.contains("\"error\""))
  }
}
