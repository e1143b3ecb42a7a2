package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Testdata table loader (see /root/repo/TESTDATA.md).
  *
  * All tables are plain parquet scans — filters/projections push down to the
  * scan (verify with `.explain`: `PushedFilters`, `ReadSchema`).
  *
  * `events.ts` has drifted across driver testdata generations: parquet
  * TIMESTAMP(NANOS) (read as nanos-since-epoch Int64 via
  * `spark.sql.legacy.parquet.nanosAsLong`, then rebuilt as a microsecond
  * TimestampType — integer `DIV` keeps the arithmetic in Int64; a double
  * division would corrupt nanos > 2^53) vs parquet TIMESTAMP(MICROS,
  * isAdjustedToUTC=false) (read as TimestampNTZType, cast to TimestampType
  * — value-identical under the UTC session timezone every entry point
  * sets). The loader dispatches on the footer schema so either generation
  * works; DuckDB's oracle side uses `CAST(ts AS TIMESTAMP)`, which is
  * equally agnostic.
  */
object Tables {

  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    graft.functions.NativeHashes.register(spark)
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events") df.withColumn("ts", normalizedEventTs(df))
    else df
  }

  private def normalizedEventTs(df: DataFrame): org.apache.spark.sql.Column =
    df.schema("ts").dataType match {
      case LongType         => timestamp_micros(expr("ts DIV 1000"))
      case TimestampNTZType => col("ts").cast(TimestampType)
      case _                => col("ts")
    }

  /** SQL spelling of the same normalization, for entry points that splice
    * the conversion into query text (the ODF ingest steps). Probes the
    * parquet footer of `path` with the caller's session. */
  def eventTsSql(spark: SparkSession, path: String): String = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(path).schema("ts").dataType match {
      case LongType => "timestamp_micros(ts DIV 1000)"
      case _        => "CAST(ts AS TIMESTAMP)"
    }
  }

  /** Register every table as a temp view (for spark.sql-based queries). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => table(spark, dir, n).createOrReplaceTempView(n))
}
