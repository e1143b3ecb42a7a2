package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Inverted-index construction: the retrieval-side artifact of a corpus
  * pipeline (BM25/keyword search over the training corpus, dedup-by-query,
  * contamination checks against eval sets).
  *
  * Scale shape (r9, two-level): postings are capped per (token, INPUT
  * PARTITION) first — the window keys include `spark_partition_id()`, so
  * the shuffle spreads a stopword's postings across every input partition
  * instead of concentrating them on one sorting task (the same
  * hot-key-window failure mode the dedup `capBuckets` fix removed; the
  * sort stays in Spark's spillable window exec, never an in-memory
  * `collect_list` of an unbounded group). Level 2 then merges at most
  * `cap × #partitions` surviving rows per token — bounded by cluster
  * width, not corpus size. Output is identical to the single-window
  * formulation: the global first-`cap` ids ascending are a subset of the
  * per-partition first-`cap`, and document frequency is the sum of the
  * per-partition counts (carried on the rank-1 row — still no second
  * aggregate over the raw postings and no join back).
  */
object SearchIndex {

  /** token → (document frequency, first `cap` doc ids ascending, as a
    * comma-joined string — arrays stay out of the driver-compare path). */
  def invertedIndex(docs: DataFrame, id: Column, text: Column, cap: Int = 20): DataFrame = {
    val postings = docs.select(id.as("doc_id"),
      explode(array_distinct(TextOps.tokens(text))).as("token"))
    // __pid is computed BELOW the window's exchange (the projection sits
    // under it, and spark_partition_id is non-deterministic so Catalyst
    // cannot reorder it above), making the window keys (token, source
    // partition): hot tokens spread over all source partitions.
    val w = Window.partitionBy(col("token"), col("__pid"))
    val localTop = postings
      .withColumn("__pid", spark_partition_id())
      .withColumn("n", count(lit(1)).over(w))
      .withColumn("rn", row_number().over(w.orderBy(col("doc_id"))))
      .filter(col("rn") <= cap)
    localTop
      .groupBy(col("token"))
      .agg(
        sum(when(col("rn") === 1, col("n")).otherwise(lit(0L))).as("df"),
        concat_ws(",", transform(
          slice(sort_array(collect_list(col("doc_id"))), 1, cap),
          _.cast("string"))).as("postings"))
  }
}
