package graft.queries

import java.nio.file.Files
import java.time.Instant

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.odf._

/** The ODF engine itself under the driver's oracle gate: a full
  * ingest → transform round-trip over the `events` table, with the ledger
  * semantics (offset assignment, op injection, system-time stamping, column
  * order) reproduced independently in DuckDB SQL.
  *
  * Ledger row order is the ingest order (ROW_NUMBER over event_id), so the
  * oracle can reconstruct offsets deterministically.
  */
object OdfQueries {

  private val SystemTimeIngest = "2024-06-01T00:00:00Z"
  private val SystemTimeDerive = "2024-06-02T00:00:00Z"

  private def runPipeline(s: SparkSession, dir: String): DataFrame = {
    val tmp = Files.createTempDirectory("odf-query")
    val engine = new Engine(s)

    val ledger = tmp.resolve("events-ledger.parquet").toString
    val tsExpr = graft.sources.Tables.eventTsSql(s, s"$dir/events.parquet")
    val raw = engine.executeRawQuery(RawQueryRequest(
      inputDataPaths = Seq(s"$dir/events.parquet"),
      queries = Seq(SqlQueryStep.output(
        s"""SELECT CAST(ROW_NUMBER() OVER (ORDER BY event_id) - 1 AS BIGINT) AS offset,
           |       CAST(0 AS INT) AS op,
           |       CAST('$SystemTimeIngest' AS TIMESTAMP) AS system_time,
           |       $tsExpr AS event_time,
           |       event_id, user_id, event_type, value, props
           |FROM input""".stripMargin)),
      outputDataPath = ledger,
    ))
    require(raw.isRight, s"ingest failed: $raw")

    val derived = tmp.resolve("derived.parquet").toString
    val nRows = raw.toOption.get.numRecords
    val res = engine.executeTransform(TransformRequest(
      datasetId = "did:odf:events-derived", datasetAlias = "derived",
      systemTime = Instant.parse(SystemTimeDerive),
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
        offsetInterval = Some(OffsetInterval(0, nRows - 1)),
        dataPaths = Seq(ledger), schemaFile = ledger,
        explicitWatermarks = Nil)),
      nextOffset = 0,
      newDataPath = derived,
    ))
    require(res.isRight, s"transform failed: $res")
    s.read.parquet(derived)
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "q_odf_transform",
      (s, dir) => {
        import org.apache.spark.sql.functions.{col, unix_millis}
        // timestamps surfaced as epoch millis: the instants are identical in
        // both engines but pandas timestamp units (ns vs µs) are not
        runPipeline(s, dir)
          .withColumn("system_time", unix_millis(col("system_time")))
          .withColumn("event_time", unix_millis(col("event_time")))
          .orderBy(col("offset"))
      },
      // event_time is ms-truncated: the ODF sink writes TIMESTAMP_MILLIS
      // (engine.rs:329-373 parity), so the µs-precision source is floored.
      Some(s"""WITH ledger AS (
              |  SELECT CAST(ROW_NUMBER() OVER (ORDER BY event_id) - 1 AS BIGINT) AS "offset",
              |         epoch_ms(date_trunc('millisecond', CAST(ts AS TIMESTAMP))) AS event_time,
              |         event_id, event_type, "value",
              |         CAST(json_extract_string(props, '$$.k') AS BIGINT) AS k
              |  FROM events),
              |filtered AS (
              |  SELECT * FROM ledger WHERE k > 50)
              |SELECT CAST(ROW_NUMBER() OVER (ORDER BY "offset") - 1 AS BIGINT) AS "offset",
              |       CAST(0 AS INT) AS op,
              |       epoch_ms(TIMESTAMP '2024-06-02 00:00:00') AS system_time,
              |       event_time, event_id, event_type,
              |       "value" * 2 AS value2, k
              |FROM filtered ORDER BY "offset"""".stripMargin),
    ),
  )
}
