package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Testdata table loader (see /root/repo/TESTDATA.md).
  *
  * All tables are plain parquet scans — filters/projections push down to the
  * scan (verify with `.explain`: `PushedFilters`, `ReadSchema`).
  *
  * `events.ts` is parquet TIMESTAMP(NANOS), which Spark's vectorized reader
  * rejects; we read it as nanos-since-epoch via
  * `spark.sql.legacy.parquet.nanosAsLong` and rebuild a microsecond
  * TimestampType column (the data is µs-precision, so this is lossless).
  * Integer `DIV` keeps the arithmetic in Int64 — a double division would
  * corrupt nanos > 2^53.
  */
object Tables {

  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    graft.functions.NativeHashes.register(spark)
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events") df.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
    else df
  }

  /** Register every table as a temp view (for spark.sql-based queries). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => table(spark, dir, n).createOrReplaceTempView(n))
}
