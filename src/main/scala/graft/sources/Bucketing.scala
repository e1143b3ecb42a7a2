package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table helpers: the co-located-join pattern for 100 TB.
  *
  * A fact table that is joined on the same key repeatedly (orders ⋈
  * lineitem on orderkey, documents ⋈ near-dup pairs on doc_id, …) should be
  * written bucketed+sorted on that key ONCE; every subsequent join or
  * aggregation on the key then skips both the shuffle and the sort — the
  * scan itself reports the hash partitioning. At 100 TB the shuffle is the
  * dominant cost of a large join, so pre-bucketing turns the recurring cost
  * into a one-time write cost.
  *
  * Uses the session catalog's bucketing metadata (`bucketBy` + `sortBy` +
  * `saveAsTable`): Spark's scan exposes `HashPartitioning(key, n)` so
  * `EnsureRequirements` inserts no Exchange for same-key joins between
  * tables with matching bucket counts. The scan additionally exposes
  * `SortOrder(key)` — eliding the join-side Sort too — when every bucket is
  * one file (writeBucketed repartitions to guarantee that) AND
  * `spark.sql.legacy.bucketedTableScan.outputOrdering=true` (since
  * SPARK-28595 the planner ignores sortBy metadata by default).
  * BucketingSpec asserts both plan properties. */
object Bucketing {

  /** Write `df` as a bucketed, per-bucket-sorted managed table at `path`.
    *
    * Repartitions by the bucket key first so each bucket lands in exactly
    * one file: Spark only exposes the `sortBy` order to the planner (and so
    * elides the join-side Sort) when a bucket is a single file — otherwise
    * only the Exchange is saved. */
  def writeBucketed(
      df: DataFrame, table: String, path: String,
      key: String, nBuckets: Int): Unit = {
    df.repartition(nBuckets, org.apache.spark.sql.functions.col(key))
      .write
      .mode(SaveMode.Overwrite)
      .bucketBy(nBuckets, key)
      .sortBy(key)
      .option("path", path)
      .format("parquet")
      .saveAsTable(table)
  }

  def read(spark: SparkSession, table: String): DataFrame = spark.table(table)
}
