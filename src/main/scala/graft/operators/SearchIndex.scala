package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Inverted-index construction: the retrieval-side artifact of a corpus
  * pipeline (BM25/keyword search over the training corpus, dedup-by-query,
  * contamination checks against eval sets).
  *
  * Scale shape: distinct (doc, token) posting stream → ONE shuffle on the
  * token key. Postings per token are capped with a window row_number
  * BEFORE the list aggregation, so a stopword's posting list costs `cap`
  * entries, not one entry per document containing it — the unbounded
  * `collect_list` is the classic driver/executor OOM at corpus scale.
  * Document frequency is computed over the SAME window partition (no
  * second aggregate, no join back).
  */
object SearchIndex {

  /** token → (document frequency, first `cap` doc ids ascending, as a
    * comma-joined string — arrays stay out of the driver-compare path). */
  def invertedIndex(docs: DataFrame, id: Column, text: Column, cap: Int = 20): DataFrame = {
    val postings = docs.select(id.as("doc_id"),
      explode(array_distinct(TextOps.tokens(text))).as("token"))
    val w = Window.partitionBy(col("token"))
    postings
      .withColumn("df", count(lit(1)).over(w))
      .withColumn("rn", row_number().over(w.orderBy(col("doc_id"))))
      .filter(col("rn") <= cap)
      .groupBy(col("token"), col("df"))
      .agg(concat_ws(",",
        transform(sort_array(collect_list(col("doc_id"))), _.cast("string"))).as("postings"))
  }
}
