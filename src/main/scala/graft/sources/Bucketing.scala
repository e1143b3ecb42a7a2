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
  * `saveAsTable`): Spark's scan exposes `HashPartitioning(key, n)` and
  * `SortOrder(key)` so `EnsureRequirements` inserts no Exchange/Sort for
  * same-key joins between tables with matching bucket counts
  * (BucketedJoinsSpec asserts the plan). */
object Bucketing {

  /** Write `df` as a bucketed, per-bucket-sorted managed table at `path`. */
  def writeBucketed(
      df: DataFrame, table: String, path: String,
      key: String, nBuckets: Int): Unit = {
    df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(nBuckets, key)
      .sortBy(key)
      .option("path", path)
      .format("parquet")
      .saveAsTable(table)
  }

  def read(spark: SparkSession, table: String): DataFrame = spark.table(table)
}
