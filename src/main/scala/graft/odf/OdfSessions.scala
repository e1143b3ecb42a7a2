package graft.odf

import org.apache.spark.sql.SparkSession

/** Session factory for the ODF engine.
  *
  * Mirrors the reference's per-request `SessionContext` configuration
  * (/root/reference/src/engine.rs:34-54):
  *   - fresh, isolated temp-view catalog per request (`spark.newSession()`),
  *   - case-sensitive identifier resolution (`enable_ident_normalization =
  *     false` at engine.rs:40-47),
  *   - millisecond-UTC timestamps on output (engine.rs:329-373; golden
  *     physical schema TIMESTAMP(MILLIS,true)),
  *   - JSON extension functions registered by name (engine.rs:51).
  *
  * Deliberately NOT mirrored: `target_partitions = 1` (engine.rs:38). The
  * reference runs single-threaded; we keep scans/joins/aggregations parallel
  * and only serialize the final offset-numbering stage (SystemColumns). At
  * 100 TB the upstream plan must stay distributed.
  */
object OdfSessions {

  /** Configure a base session suitable for hosting ODF requests. Call once.
    * Deliberately does NOT touch parquet writer confs on the base session —
    * every engine write happens through a request session (which sets
    * TIMESTAMP_MILLIS itself), and mutating the host application's writer
    * defaults would be rude. */
  def configureBase(spark: SparkSession): SparkSession = {
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    // ns-unit parquet timestamps (reference regression fixture
    // data/datafusion-issue-6463) are not representable in Spark's reader —
    // surface them as nanos-since-epoch Int64 instead of failing the scan;
    // queries convert via timestamp_micros(ts DIV 1000).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark
  }

  /** Fresh isolated session per request: shares the SparkContext and cached
    * data, but has its own temp-view catalog and SQL conf — the analogue of
    * the reference's per-request `SessionContext` (engine.rs:131). */
  def newRequestSession(base: SparkSession): SparkSession = {
    val s = base.newSession()
    s.conf.set("spark.sql.session.timeZone", "UTC")
    s.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MILLIS")
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // engine.rs:40-47 disables ident normalization → identifiers are
    // case-sensitive; aliases like `City` survive verbatim.
    s.conf.set("spark.sql.caseSensitive", "true")
    graft.functions.JsonFunctions.register(s)
    graft.functions.DataFusionCompat.register(s)
    s
  }
}
