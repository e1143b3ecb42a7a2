package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing: lay documents end-to-end into fixed-capacity context
  * windows (the concat-and-chunk step before LLM training). Each document
  * gets its token start-offset within its shard's concatenation; its bin is
  * the context window holding its first token.
  *
  * Scale shape: packing is per-shard (`shardCols`) — bins never span shards,
  * so the running sum is a window over the shard key, one shuffle, every
  * shard packed in parallel. A single global concatenation order would
  * serialize the prefix sum through one partition (the trap the ODF offset
  * assignment avoids with its two-pass prefix sum); shard-local packing is
  * what real pipelines do anyway, because bins are independent training
  * examples.
  */
object Packing {

  /** Adds `tok_start` (offset of the doc's first token in its shard's
    * concatenation) and `bin` (its context window: tok_start / capacity).
    * `orderCol` fixes the concatenation order within a shard — results are
    * a pure function of the data, independent of partitioning. */
  def packIntoBins(
      df: DataFrame,
      shardCols: Seq[String],
      orderCol: Column,
      sizeCol: Column,
      capacity: Int): DataFrame = {
    // named validation (r17, the lshBuckets idiom): capacity = 0 otherwise
    // NULLs every bin under non-ANSI division — a silently empty packing
    require(capacity > 0, s"packIntoBins needs capacity > 0, got $capacity")
    val w = Window.partitionBy(shardCols.map(col): _*).orderBy(orderCol)
    df.withColumn("tok_start", coalesce(sum(sizeCol).over(w) - sizeCol, lit(0L)).cast("long"))
      .withColumn("bin", floor(col("tok_start") / capacity).cast("long"))
  }
}
