package graft.operators

import org.apache.spark.sql.DataFrame

/** Scale-adaptive input rebalance for CPU-heavy narrow stages (r19
  * optimization; guide §2 "partitioning that avoids stragglers").
  *
  * The expensive per-row map work in this engine (tokenize → shingle →
  * hash, BM25 token explode + scoring arithmetic) is NARROW: it runs in
  * whatever partitioning the scan produced. Parquet scan parallelism is
  * bounded by row groups, so a small corpus (one file, one row group)
  * funnels the whole tokenize/shingle pass through 1-3 tasks while the
  * rest of the cluster idles — measured on q_bm25_batch: the contrib
  * stage ran 3.6 s on ONE task (StageBreakdownProbe, r19) on a 32-core
  * session.
  *
  * `smallInput` repartitions round-robin to the session's default
  * parallelism ONLY when the optimizer's size estimate says the frame is
  * tiny relative to that parallelism (< 8 MB/slot). The gate makes it
  * scale-safe in both directions:
  *   - at 100 TB the estimate is astronomically above the gate, the
  *     branch never fires, and no extra exchange is paid;
  *   - when it does fire the shuffled bytes are bounded by the gate
  *     (cores × 8 MB), a trivial price for engaging every core on work
  *     that costs orders of magnitude more CPU per byte than the shuffle.
  * The explicit partition count pins the exchange against AQE re-coalescing
  * (coalescing back to 1-2 partitions is exactly the failure being fixed —
  * AQE's 1 MB floor is byte-aware but blind to per-row CPU cost).
  *
  * Results are unaffected: every caller's output is partition-invariant
  * (the fuzz families pin repartition(1/7/13) equality), and round-robin
  * repartition sorts rows within each input partition first
  * (SPARK-23207), so task retries reproduce the same placement.
  */
object Rebalance {
  /** Bytes-per-slot gate: below parallelism × this, the input counts as
    * "small" and is worth redistributing before expensive narrow work. */
  val smallBytesPerSlot: Long = 8L * 1024 * 1024

  def smallInput(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val par = spark.sparkContext.defaultParallelism
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    if (bytes < BigInt(par.toLong * smallBytesPerSlot)) df.repartition(par)
    else df
  }
}
