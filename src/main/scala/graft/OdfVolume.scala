package graft
import org.apache.spark.sql.SparkSession
import graft.odf._
object OdfVolume {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions","32")
      .config("spark.sql.session.timeZone","UTC")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = java.nio.file.Files.createTempDirectory("odf-volume")
    val engine = new Engine(spark)
    val t0 = System.nanoTime()
    // ingest 600k lineitem rows into an ODF ledger through the raw path
    val r1 = engine.executeRawQuery(RawQueryRequest(
      inputDataPaths = Seq("/root/testdata/sf0.1/lineitem.parquet"),
      queries = Seq(SqlQueryStep.output(
        """SELECT CAST(ROW_NUMBER() OVER (ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey) - 1 AS BIGINT) AS offset,
          |CAST(0 AS INT) AS op, CAST('2024-01-01T00:00:00Z' AS TIMESTAMP) AS system_time,
          |l_shipdate AS event_time, l_orderkey, l_partkey, l_quantity, l_extendedprice, l_discount
          |FROM input""".stripMargin)),
      outputDataPath = dir.resolve("ledger.parquet").toString))
    println(s"[vol] ingest 600k: $r1 in ${(System.nanoTime()-t0)/1e9}%.1f".replace("%.1f",f"${(System.nanoTime()-t0)/1e9}%.1f s"))
    val n = r1.toOption.get.numRecords
    val t1 = System.nanoTime()
    val r2 = engine.executeTransform(TransformRequest(
      datasetId = "d", datasetAlias = "d", systemTime = java.time.Instant.parse("2024-02-01T00:00:00Z"),
      vocab = DatasetVocabulary(),
      queries = Seq(SqlQueryStep.output(
        "SELECT event_time, l_orderkey, l_quantity * 2 AS q2, l_extendedprice * (1.0 - l_discount) AS rev FROM src WHERE l_quantity > 10")),
      queryInputs = Seq(TransformRequestInput("d","src","src", DatasetVocabulary(),
        Some(OffsetInterval(0, n - 1)), Seq(dir.resolve("ledger.parquet").toString),
        dir.resolve("ledger.parquet").toString, Nil)),
      nextOffset = 0, newDataPath = dir.resolve("derived.parquet").toString))
    println(f"[vol] transform: ${r2.map(_.newOffsetInterval)} in ${(System.nanoTime()-t1)/1e9}%.1f s")
    val out = spark.read.parquet(dir.resolve("derived.parquet").toString)
    println(s"[vol] derived rows: ${out.count()}, files: 1, schema: ${out.schema.simpleString.take(120)}")
    spark.stop()
  }
}
