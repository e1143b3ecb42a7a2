package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout operators: multi-dimensional clustering for scan pruning.
  *
  * A table range-partitioned and sorted on ONE column prunes scans filtered
  * on that column only; a filter on any other column reads everything.
  * Z-ordering interleaves the bits of two key columns into a Morton code and
  * lays data out along that space-filling curve, so every file/row-group
  * covers a bounded rectangle in BOTH dimensions — parquet min/max stats
  * then prune scans filtered on either column. This is the layout step a
  * 100 TB corpus wants before heavy multi-key query traffic (the same idea
  * as Delta/Iceberg `ZORDER BY`).
  *
  * The Morton code is pure built-in bitwise arithmetic (the classic
  * magic-number bit spread) — it stays in whole-stage codegen and the
  * identical integer arithmetic runs in any SQL engine, which is how
  * q_zorder is oracle-checked value-for-value against DuckDB.
  */
object Layout {

  /** Spread the low 16 bits of `x` to even bit positions (0,2,4,…,30). */
  private def spread16(x: Column): Column = {
    val m0 = x.bitwiseAND(lit(65535L))
    val m1 = (m0.bitwiseOR(shiftleft(m0, 8))).bitwiseAND(lit(16711935L)) // 0x00FF00FF
    val m2 = (m1.bitwiseOR(shiftleft(m1, 4))).bitwiseAND(lit(252645135L)) // 0x0F0F0F0F
    val m3 = (m2.bitwiseOR(shiftleft(m2, 2))).bitwiseAND(lit(858993459L)) // 0x33333333
    (m3.bitwiseOR(shiftleft(m3, 1))).bitwiseAND(lit(1431655765L)) // 0x55555555
  }

  /** 32-bit Morton (Z-curve) code of two 16-bit dimensions: bits of `a` on
    * even positions, bits of `b` on odd. */
  def zValue16(a: Column, b: Column): Column =
    spread16(a.cast("long")).bitwiseOR(shiftleft(spread16(b.cast("long")), 1))

  /** Re-layout `df` along the Z-curve of two key columns: range-partition on
    * the Morton code (so files hold contiguous curve segments — bounded
    * rectangles in (a, b) space), sort within partitions (so row groups
    * subdivide those rectangles). One shuffle, same cost shape as a plain
    * `orderBy` re-layout, pruning on two columns instead of one. */
  def zorderRepartition(df: DataFrame, a: String, b: String, numPartitions: Int): DataFrame =
    df.withColumn("_zvalue", zValue16(col(a), col(b)))
      .repartitionByRange(numPartitions, col("_zvalue"))
      .sortWithinPartitions("_zvalue")
      .drop("_zvalue")

  /** Small-file compaction: rewrite a parquet directory into files of
    * ~`targetBytes` each. Streaming sinks and incremental ingest leave
    * thousands of KB-sized files per partition; at 100 TB that turns every
    * scan into a metadata storm (one footer read + task per file) and
    * starves row-group-level pruning. The target file count comes from the
    * directory's actual on-disk size (driver-side listing — one NameNode
    * round-trip, no data read), and the rewrite is one narrow
    * `repartition` job: scan → shuffle into `n` balanced partitions →
    * write. Returns the resulting DataFrame's file count. */
  def compact(
      spark: org.apache.spark.sql.SparkSession,
      inDir: String,
      outDir: String,
      targetBytes: Long = 128L * 1024 * 1024): Int = {
    val path = new org.apache.hadoop.fs.Path(inDir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val totalBytes = fs.getContentSummary(path).getLength
    val n = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)
    spark.read.parquet(inDir).repartition(n)
      .write.mode("overwrite").parquet(outDir)
    fs.listStatus(new org.apache.hadoop.fs.Path(outDir))
      .count(s => s.getPath.getName.endsWith(".parquet"))
  }
}
