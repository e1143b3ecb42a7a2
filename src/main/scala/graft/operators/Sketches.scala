package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.CountMinSketch

/** Mergeable-sketch operators: bounded-memory frequency estimation.
  *
  * Exact token counting (q_vocab_topk) is a full hash-aggregate whose state
  * is the whole vocabulary — fine when the vocabulary fits, but a 100 TB
  * web corpus has billions of distinct n-grams. A count-min sketch is a
  * fixed-size (eps × confidence-bound) array of counters that each task
  * fills locally and the driver merges associatively (`treeAggregate`
  * inside `stat.countMinSketch`) — a single pass, no shuffle of the
  * token stream at all, at the price of one-sided overestimation:
  * `exact <= estimate <= exact + eps * N` with probability `confidence`.
  */
object Sketches {

  /** Build a count-min sketch over one (typically exploded) column.
    * Fixed seed → deterministic estimates. */
  def countMin(df: DataFrame, c: String, eps: Double, confidence: Double): CountMinSketch =
    df.stat.countMinSketch(col(c), eps, confidence, seed = 42)

  /** Misra-Gries summary of one partition: at most `m` counters. Any token
    * with partition-local count > N_p/(m+1) is guaranteed to survive —
    * every global heavy hitter is a local one in at least its densest
    * partitions. Amortized O(1) per element: each O(m) decrement sweep is
    * paid for by the m increments before it. */
  private def misraGries(it: Iterator[String], m: Int): Iterator[String] = {
    val counts = scala.collection.mutable.HashMap.empty[String, Long]
    it.foreach { t =>
      if (counts.contains(t)) counts(t) += 1
      else if (counts.size < m) counts(t) = 1L
      else {
        counts.mapValuesInPlace((_, v) => v - 1)
        counts.filterInPlace((_, v) => v > 0)
      }
    }
    counts.keysIterator
  }

  /** Heavy hitters: top-k tokens by estimated frequency.
    *
    * The sketch answers point queries only, so a candidate set is needed.
    * Scale shape: candidates come from a bounded-memory Misra-Gries pass
    * per partition (at most `localCap` counters per task, NEVER the
    * partition's vocabulary); the count-min sketch, built over the FULL
    * stream in one pass, then re-estimates each surviving candidate's true
    * frequency — repairing Misra-Gries' undercounting with CMS'
    * never-undercounting. Candidate volume is ≤ localCap × partitions,
    * independent of corpus size.
    *
    * Returns (token, est_count) for the top-k candidates by estimate. */
  def heavyHitters(
      tokens: DataFrame,
      tokenCol: String,
      k: Int,
      eps: Double = 1e-4,
      confidence: Double = 0.99,
      localCap: Int = 4096): DataFrame = {
    val spark = tokens.sparkSession
    import spark.implicits._
    val sketch = countMin(tokens, tokenCol, eps, confidence)
    val candidates = tokens.select(col(tokenCol)).as[String]
      .mapPartitions(it => misraGries(it, localCap))
      .distinct()
      .collect()
    candidates.toSeq
      .map(t => (t, sketch.estimateCount(t)))
      .sortBy { case (t, n) => (-n, t) }
      .take(k)
      .toDF(tokenCol, "est_count")
  }
}
