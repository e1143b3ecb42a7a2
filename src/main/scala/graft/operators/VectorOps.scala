package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Embedding-vector operators: cosine similarity, brute-force top-k ANN,
  * LSH-bucketed ANN — over plain `array<float>` columns.
  *
  * Scale design:
  *   - similarity math is expression-tree only (zip_with/aggregate — no
  *     UDFs), accumulated in double, sequential fold order so results are
  *     deterministic;
  *   - brute-force top-k broadcasts the (small) query set and streams the
  *     corpus — one pass, no corpus shuffle; per-query top-k via window
  *     over the query partition;
  *   - the LSH path buckets the corpus once (map stage) and probes only
  *     matching buckets — the 100 TB pattern where a full scan per query is
  *     unaffordable.
  */
object VectorOps {

  /** Dot product in double precision, sequential fold. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Brute-force cosine top-k: every query row against every corpus row.
    * `queries` must be small (it is broadcast); corpus streams map-side. */
  def bruteForceTopK(
      corpus: DataFrame, queries: DataFrame, k: Int,
      corpusId: String = "vec_id", corpusVec: String = "embedding",
      queryId: String = "query_id", queryVec: String = "query_vec"): DataFrame = {
    val scored = corpus.crossJoin(broadcast(queries))
      .select(
        col(queryId), col(corpusId),
        round(cosine(col(queryVec), col(corpusVec)), 6).as("cos"))
    val w = Window.partitionBy(col(queryId)).orderBy(col("cos").desc, col(corpusId))
    scored.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= k)
  }

  /** Random-hyperplane signature: `bits` sign bits of dot products with
    * pseudo-random ±1 planes (plane weights from xxhash64(bit, dim) parity —
    * fully deterministic, no stored model). Returns an int bucket id. */
  def hyperplaneBucket(vec: Column, dims: Int, bits: Int): Column =
    aggregate(
      sequence(lit(0), lit(bits - 1)),
      lit(0L),
      (acc, b) => {
        val proj = aggregate(
          zip_with(vec, sequence(lit(0), lit(dims - 1)), (x, d) => {
            val sign = when(
              pmod(xxhash64(concat(lit("hp-"), b.cast("string"), lit("-"), d.cast("string"))), lit(2L)) === 0L,
              lit(1.0)).otherwise(lit(-1.0))
            x.cast("double") * sign
          }),
          lit(0.0), (a2, x) => a2 + x)
        acc + when(proj > 0, call_function("shiftleft", lit(1L), b.cast("int"))).otherwise(lit(0L))
      }).cast("int")

  /** LSH-bucketed ANN: corpus and queries are bucketed by hyperplane
    * signature; each query probes only its bucket (equi-join on bucket id),
    * then ranks candidates by exact cosine. Trades recall for a
    * 2^bits-fold reduction in comparisons. */
  def lshTopK(
      corpus: DataFrame, queries: DataFrame, k: Int, dims: Int, bits: Int = 8,
      corpusId: String = "vec_id", corpusVec: String = "embedding",
      queryId: String = "query_id", queryVec: String = "query_vec"): DataFrame = {
    val bucketedCorpus = corpus.withColumn("bucket", hyperplaneBucket(col(corpusVec), dims, bits))
    val bucketedQueries = queries.withColumn("bucket", hyperplaneBucket(col(queryVec), dims, bits))
    val scored = bucketedCorpus.join(broadcast(bucketedQueries), "bucket")
      .select(
        col(queryId), col(corpusId),
        round(cosine(col(queryVec), col(corpusVec)), 6).as("cos"))
    val w = Window.partitionBy(col(queryId)).orderBy(col("cos").desc, col(corpusId))
    scored.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= k)
  }

  /** Embedding near-duplicate pairs: all pairs above a cosine threshold.
    * Brute-force within-id-range guard for small corpora; at scale, route
    * through `hyperplaneBucket` first (same pattern as lshTopK). */
  def cosineNearDupPairs(corpus: DataFrame, id: String, vec: String, threshold: Double): DataFrame = {
    val l = corpus.select(col(id).as("id1"), col(vec).as("v1"))
    val r = corpus.select(col(id).as("id2"), col(vec).as("v2"))
    l.join(r, col("id1") < col("id2"))
      .withColumn("cos", round(cosine(col("v1"), col("v2")), 6))
      .filter(col("cos") >= threshold)
      .select(col("id1"), col("id2"), col("cos"))
  }
}
