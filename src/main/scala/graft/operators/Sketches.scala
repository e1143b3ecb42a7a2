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

  /** Mergeable Misra-Gries summary: bounded map of candidate counters.
    * Merge = counter sum, then the standard decrement-by-(m+1)-th-largest
    * trim (Agarwal et al., "Mergeable Summaries") — preserves the MG
    * guarantee that any token with global count > N/(m+1) survives. */
  private def mgMerge(
      a: scala.collection.mutable.HashMap[String, Long],
      b: scala.collection.mutable.HashMap[String, Long],
      m: Int): scala.collection.mutable.HashMap[String, Long] = {
    b.foreach { case (t, n) => a.updateWith(t) { c => Some(c.getOrElse(0L) + n) } }
    if (a.size > m) {
      val d = a.values.toArray.sorted(Ordering[Long].reverse).apply(m)
      a.mapValuesInPlace((_, v) => v - d)
      a.filterInPlace((_, v) => v > 0)
    }
    a
  }

  /** Heavy hitters: top-k tokens by estimated frequency.
    *
    * The sketch answers point queries only, so a candidate set is needed.
    * Scale shape: ONE pass over the token stream builds, per task, both a
    * Misra-Gries candidate summary (at most `localCap` counters, NEVER the
    * partition's vocabulary) and a count-min sketch; both are mergeable, so
    * `treeAggregate` combines them up a tree without any shuffle of the
    * stream. The merged CMS (exact counter sums — merge-order independent)
    * re-estimates each surviving candidate's frequency, repairing MG's
    * undercounting with CMS' never-undercounting. Driver-side state is one
    * CMS (eps × confidence sized) + ≤ localCap candidates, independent of
    * corpus size.
    *
    * Returns (token, est_count) for the top-k candidates by estimate.
    * NULL tokens are dropped before the pass (r17 review): they are not a
    * countable item — `CountMinSketch.addString(null)` NPEs the executor —
    * and a dirty corpus must degrade to defined results, not a task
    * failure. */
  def heavyHitters(
      tokens: DataFrame,
      tokenCol: String,
      k: Int,
      eps: Double = 1e-4,
      confidence: Double = 0.99,
      localCap: Int = 4096): DataFrame = {
    val spark = tokens.sparkSession
    import spark.implicits._
    type Acc = (CountMinSketch, scala.collection.mutable.HashMap[String, Long])
    def zero: Acc =
      (CountMinSketch.create(eps, confidence, 42),
        scala.collection.mutable.HashMap.empty[String, Long])
    val (sketch, mg) = tokens.select(col(tokenCol)).filter(col(tokenCol).isNotNull)
      .as[String].rdd
      .treeAggregate(zero)(
        seqOp = { case ((cms, counts), t) =>
          cms.addString(t)
          // inlined MG step (same semantics as misraGries): count if
          // present or under cap, else decrement-sweep everyone
          if (counts.contains(t)) counts(t) += 1
          else if (counts.size < localCap) counts(t) = 1L
          else {
            counts.mapValuesInPlace((_, v) => v - 1)
            counts.filterInPlace((_, v) => v > 0)
          }
          (cms, counts)
        },
        combOp = { case ((c1, m1), (c2, m2)) =>
          c1.mergeInPlace(c2)
          (c1, mgMerge(m1, m2, localCap))
        })
    mg.keysIterator.toSeq
      .map(t => (t, sketch.estimateCount(t)))
      .sortBy { case (t, n) => (-n, t) }
      .take(k)
      .toDF(tokenCol, "est_count")
  }
}
